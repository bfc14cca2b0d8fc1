#!/usr/bin/env python
"""Convert torch VGG16 + lpips lin-head weights to the flax LPIPS .npz.

Run on any machine with torchvision + lpips installed (they are NOT in the
TPU image):

    python scripts/convert_lpips.py --out lpips_vgg16.npz

then point the framework at it:

    export SANERF_LPIPS_WEIGHTS=/path/to/lpips_vgg16.npz

With the file present, LPIPSMeter computes the exact reference metric
(nerf/metrics.py:54-99, lpips.LPIPS(net='vgg')); without it the meter
falls back to the deterministic random-VGG proxy (train/lpips.py).
"""
import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="lpips_vgg16.npz")
    args = ap.parse_args()

    import lpips  # noqa: requires the torch lpips package
    import numpy as np
    import torchvision

    from sanerf_hq_tpu.train.lpips import convert_torch_lpips, save_lpips_npz

    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1")
    vgg_sd = {k: v.detach().numpy() for k, v in
              vgg.features.state_dict().items()}
    lp = lpips.LPIPS(net="vgg")
    lin_sd = {k: v.detach().numpy() for k, v in lp.state_dict().items()
              if "lin" in k}
    params = convert_torch_lpips(vgg_sd, lin_sd)
    save_lpips_npz(args.out, params)
    n = sum(np.asarray(x).size for x in
            [w for w in params["lins"]])
    print(f"wrote {args.out} (5 lin heads, {n} head weights, full VGG16 trunk)")


if __name__ == "__main__":
    main()
