#!/usr/bin/env python
"""Measure the stage-2 distill loop: HOST round-trip (render -> numpy uint8
-> SAM encode; reference nerf/trainer.py:518-520) vs the ON-DEVICE fused
render->encode program (stages.make_render_and_encode) — the SURVEY §7
'hard part' that --on_device_sam (auto-on on TPU) enables.

Reports per-step wall time of gt-feature production for both paths plus the
fused-vs-host feature parity, and the full distill cadence (gt production +
distill_step) per path.  Run on TPU:

    python scripts/bench_on_device_sam.py [--res 512] [--sam vit_b] [--steps 4]

Results are recorded in docs/PERF.md ("On-device SAM distill").
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512,
                    help="online_resolution (reference default 512)")
    ap.add_argument("--sam", default="vit_b",
                    choices=["vit_b", "vit_l", "vit_h"])
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--field", default="mlp")
    args = ap.parse_args()

    from sanerf_hq_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from sanerf_hq_tpu.config import Config
    from sanerf_hq_tpu.data import full_frame_rays, make_synthetic_dataset
    from sanerf_hq_tpu.data.sampler import sam_aug_intrinsics
    from sanerf_hq_tpu.models import make_field
    from sanerf_hq_tpu.sam import SamPredictor, build_sam
    from sanerf_hq_tpu.train.stages import make_render_and_encode
    from sanerf_hq_tpu.train.steps import make_sam_distill_step
    from sanerf_hq_tpu.train.trainer import Trainer

    R = args.res
    print(f"platform={jax.devices()[0].platform} res={R} sam={args.sam}")
    cfg = Config(num_steps=(128, 64, 32), bound=128.0, contract=True,
                 min_near=0.2, with_sam=True, online_resolution=R,
                 iters=100)
    model = make_field(args.field, grid_bound=cfg.grid_bound, with_sam=True,
                       cp_rank=64)
    import tempfile

    ws = tempfile.mkdtemp()
    trainer = Trainer("od", cfg, model, ws, use_checkpoint="scratch")
    sam = build_sam(args.sam, checkpoint=None)  # random weights: throughput
    pred = SamPredictor(sam)

    scene = make_synthetic_dataset(n_views=4, H=R, W=R)
    pose = jnp.asarray(scene["poses"][0])
    intr = np.asarray(sam_aug_intrinsics(jax.random.PRNGKey(0), R))
    ro, rd = full_frame_rays(pose, jnp.asarray(intr), R, R)

    def timeit(fn, n):
        fn()  # warm/compile
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out) if hasattr(out, "block_until_ready") \
            else None
        return (time.perf_counter() - t0) / n

    # --- host path: render -> host uint8 -> set_image -------------------
    def host_gt():
        out = trainer.eval_render(trainer.state.params, ro, rd)
        rgb = (np.clip(np.asarray(out["image"]).reshape(R, R, 3), 0, 1)
               * 255).astype(np.uint8)
        return np.asarray(pred.set_image(rgb)[0])

    t_host = timeit(host_gt, args.steps)
    print(f"host gt-production: {t_host*1e3:.1f} ms/step "
          f"({1/t_host:.2f} steps/s)")

    # --- fused on-device path -------------------------------------------
    rae = make_render_and_encode(trainer, pred.sam, R, pred.img_size)

    def dev_gt():
        gt, _ = rae(trainer.state.params, pred.sam.params, ro, rd)
        return np.asarray(gt)  # pull so timing is honest

    t_dev = timeit(dev_gt, args.steps)
    print(f"on-device gt-production: {t_dev*1e3:.1f} ms/step "
          f"({1/t_dev:.2f} steps/s)  speedup x{t_host/t_dev:.2f}")

    # --- parity -----------------------------------------------------------
    gt_h = host_gt()
    gt_d = dev_gt()
    rel = np.abs(gt_d - gt_h).mean() / (np.abs(gt_h).mean() + 1e-8)
    print(f"parity mean|d-h|/mean|h| = {rel:.4f} "
          f"({'PASS' if rel < 0.2 else 'FAIL'}; cv2-vs-jax bilinear resize "
          "accounts for small diffs)")

    # --- full distill cadence (gt + step) ----------------------------------
    dstep = make_sam_distill_step(trainer.model, cfg, frozen_backbone=False)
    scale = R / 64.0
    ro_lr, rd_lr = full_frame_rays(pose, jnp.asarray(intr) / scale, 64, 64)

    def full(on_device):
        gt = dev_gt() if on_device else host_gt()
        batch = {"rays_o_lr": ro_lr, "rays_d_lr": rd_lr,
                 "gt_samvit": jnp.asarray(gt)}
        st, m = dstep(trainer.state, batch, jax.random.PRNGKey(1))
        return float(m["loss"])

    t_fh = timeit(lambda: full(False), args.steps)
    t_fd = timeit(lambda: full(True), args.steps)
    print(f"distill step incl gt: host {t_fh*1e3:.1f} ms "
          f"({1/t_fh:.2f} steps/s) | on-device {t_fd*1e3:.1f} ms "
          f"({1/t_fd:.2f} steps/s) | speedup x{t_fh/t_fd:.2f}")


if __name__ == "__main__":
    main()
