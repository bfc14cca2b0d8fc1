"""SAM flax model tests: tiny-config pipeline shape/flow + torch->flax
primitive conversion rules (the weight-converter contract)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sanerf_hq_tpu.sam.build import build_sam
from sanerf_hq_tpu.sam.image_encoder import (
    ImageEncoderViT, window_partition, window_unpartition,
)
from sanerf_hq_tpu.sam.predictor import SamPredictor


def tiny_sam(hq=False):
    """64x64 input, 2-block tiny ViT for fast CPU tests."""
    import sanerf_hq_tpu.sam.build as B

    cfg = dict(embed_dim=32, depth=2, num_heads=2, global_attn_indexes=(1,))
    B_orig = B._CONFIGS["vit_h"]
    B._CONFIGS["vit_tiny"] = lambda: cfg
    try:
        return B.build_sam("vit_tiny", hq=hq, img_size=64, seed=0)
    finally:
        del B._CONFIGS["vit_tiny"]


def test_window_partition_roundtrip():
    x = jnp.arange(2 * 10 * 12 * 3, dtype=jnp.float32).reshape(2, 10, 12, 3)
    w, pad_hw = window_partition(x, 4)
    y = window_unpartition(w, 4, pad_hw, (10, 12))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


@pytest.mark.parametrize("hq", [False, True])
def test_tiny_sam_end_to_end(hq):
    sam = tiny_sam(hq=hq)
    pred = SamPredictor(sam, img_size=64)
    img = (np.random.default_rng(0).uniform(0, 255, (48, 60, 3))).astype(np.uint8)
    feats = pred.set_image(img)
    assert feats.shape == (1, 4, 4, 256)
    masks, iou, low_res = pred.predict(
        point_coords=np.array([[20, 20]]), point_labels=np.array([1]),
        multimask_output=True,
    )
    n_masks = 4 if hq else 3
    assert masks.shape == (n_masks, 48, 60)
    # HQ: iou head covers only the base tokens (3), matching sam-hq — the
    # reference zips (mask, score) and effectively truncates
    assert iou.shape == (3,)
    assert np.all(np.isfinite(iou))


def test_feature_injection_seam():
    """The SANeRF-HQ seam: inject a rendered feature map instead of running
    the encoder (nerf/trainer.py:1008-1020)."""
    sam = tiny_sam()
    pred = SamPredictor(sam, img_size=64)
    f = np.random.default_rng(1).normal(size=(4, 3, 256)).astype(np.float32)
    pred.set_features(f, original_size=(48, 36))
    assert pred.features.shape == (1, 4, 4, 256)
    # long side mapped to img_size -> (64, 48) input size
    assert pred.input_size == (64, 48)
    masks, iou, low = pred.predict(
        point_coords=np.array([[10, 10]]), point_labels=np.array([1]),
    )
    assert masks.shape == (3, 48, 36)


def test_torch_conversion_rules():
    torch = pytest.importorskip("torch")
    import flax.linen as nn

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    # Conv2d rule
    tc = torch.nn.Conv2d(3, 5, 3, padding=1)
    fc = nn.Conv(5, (3, 3), padding="SAME")
    p = {"params": {"kernel": jnp.asarray(
        tc.weight.detach().numpy().transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(tc.bias.detach().numpy())}}
    np.testing.assert_allclose(
        np.asarray(fc.apply(p, jnp.asarray(x))),
        tc(xt).detach().numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5,
    )

    # ConvTranspose2d rule (flipped spatial)
    tt = torch.nn.ConvTranspose2d(3, 5, 2, stride=2)
    ft = nn.ConvTranspose(5, (2, 2), strides=(2, 2))
    k = tt.weight.detach().numpy().transpose(2, 3, 0, 1)[::-1, ::-1].copy()
    p = {"params": {"kernel": jnp.asarray(k),
                    "bias": jnp.asarray(tt.bias.detach().numpy())}}
    np.testing.assert_allclose(
        np.asarray(ft.apply(p, jnp.asarray(x))),
        tt(xt).detach().numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5,
    )

    # Linear rule
    tl = torch.nn.Linear(4, 3)
    fl = nn.Dense(3)
    p = {"params": {"kernel": jnp.asarray(tl.weight.detach().numpy().T),
                    "bias": jnp.asarray(tl.bias.detach().numpy())}}
    xv = rng.normal(size=(2, 4)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(fl.apply(p, jnp.asarray(xv))),
        tl(torch.from_numpy(xv)).detach().numpy(), rtol=1e-4, atol=1e-5,
    )
