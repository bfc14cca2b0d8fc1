"""Pure-JAX/flax VGG16-LPIPS so the RGB metric triple (PSNR/SSIM/LPIPS,
reference nerf/metrics.py:10-144) is available unconditionally on a TPU
image with no torch-lpips install.

Architecture parity with the `lpips` package (net='vgg', the reference's
LPIPSMeter default, nerf/metrics.py:55-62):
  input in [-1, 1] -> ScalingLayer (fixed shift/scale) -> VGG16 conv
  features tapped at relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3 ->
  per-tap channel-unit-normalize -> squared diff -> learned 1x1
  non-negative linear head -> spatial mean -> sum over the 5 taps.

Weight sources, in priority order (resolved by `load_lpips_params`):
  1. an .npz produced by scripts/convert_lpips.py from the torch
     packages (torchvision vgg16 + lpips lin heads) — exact parity with
     the reference metric;
  2. a deterministic randomly-initialized VGG (PRNGKey(0)) with uniform
     lin heads — a *perceptual proxy*: randomly-initialized VGG features
     are a known usable perceptual metric (the LPIPS paper's own
     baseline), self-consistent across runs/machines (zero for identical
     images, symmetric, monotone in distortion) but NOT numerically
     comparable to published LPIPS values.  `LPIPSMeter.mode` says which
     source is active.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# fixed input normalization (lpips.ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# VGG16 feature config: (block channels, convs per block); LPIPS taps the
# activation after the last relu of each block (before the next pool)
_VGG_CFG = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
_TAP_CHANNELS = (64, 128, 256, 512, 512)

# torchvision vgg16 `features.{idx}` indices of the 13 conv layers, in order
_TORCH_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


class VGG16Taps(nn.Module):
    """VGG16 conv trunk returning the 5 LPIPS tap activations (NHWC)."""

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        taps = []
        for b, (ch, n_conv) in enumerate(_VGG_CFG):
            for i in range(n_conv):
                x = nn.Conv(ch, (3, 3), padding=1,
                            name=f"conv{b + 1}_{i + 1}")(x)
                x = nn.relu(x)
            taps.append(x)
            if b < len(_VGG_CFG) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


def _normalize(feat, eps: float = 1e-10):
    """Channel-unit normalization (lpips.normalize_tensor)."""
    norm = jnp.sqrt(jnp.sum(feat ** 2, axis=-1, keepdims=True))
    return feat / (norm + eps)


def make_lpips_fn(params: Dict):
    """Returns a jitted fn(pred, gt) -> scalar LPIPS distance.

    pred/gt: [H, W, 3] (or [N, H, W, 3]) float in [0, 1]."""
    model = VGG16Taps()
    vgg_params = params["vgg"]
    lin_ws = [jnp.asarray(w) for w in params["lins"]]  # each [C]
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)

    @jax.jit
    def lpips_fn(pred, gt):
        x = jnp.asarray(pred, jnp.float32)
        y = jnp.asarray(gt, jnp.float32)
        if x.ndim == 3:
            x, y = x[None], y[None]
        # [0,1] -> [-1,1] -> ScalingLayer
        x = ((x * 2.0 - 1.0) - shift) / scale
        y = ((y * 2.0 - 1.0) - shift) / scale
        fx = model.apply({"params": vgg_params}, x)
        fy = model.apply({"params": vgg_params}, y)
        total = 0.0
        for a, b, w in zip(fx, fy, lin_ws):
            d = (_normalize(a) - _normalize(b)) ** 2  # [N,H,W,C]
            val = jnp.einsum("nhwc,c->nhw", d, w)     # 1x1 conv head
            total = total + jnp.mean(val, axis=(1, 2))
        return jnp.mean(total)

    return lpips_fn


# ---------------------------------------------------------------------------
# weights
# ---------------------------------------------------------------------------

def convert_torch_lpips(vgg_sd: Dict[str, np.ndarray],
                        lin_sd: Dict[str, np.ndarray]) -> Dict:
    """Convert torch state dicts (as numpy arrays) to this module's params.

    vgg_sd: torchvision `vgg16().features.state_dict()` layout —
      `{idx}.weight` [out, in, 3, 3] / `{idx}.bias` (a `features.` prefix
      is tolerated).
    lin_sd: lpips LPIPS(net='vgg') lin heads — `lin{k}.model.1.weight`
      [1, C, 1, 1] (full-model state dicts with a `lins.{k}` layout are
      tolerated too).
    """
    def get(sd, *names):
        for n in names:
            if n in sd:
                return np.asarray(sd[n])
        raise KeyError(f"none of {names} in state dict "
                       f"(keys: {sorted(sd)[:8]}...)")

    vgg = {}
    k = 0
    for b, (ch, n_conv) in enumerate(_VGG_CFG):
        for i in range(n_conv):
            idx = _TORCH_CONV_IDX[k]
            w = get(vgg_sd, f"{idx}.weight", f"features.{idx}.weight")
            bias = get(vgg_sd, f"{idx}.bias", f"features.{idx}.bias")
            # torch conv [out, in, kh, kw] -> flax [kh, kw, in, out]
            vgg[f"conv{b + 1}_{i + 1}"] = {
                "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(bias),
            }
            k += 1
    lins = []
    for tap, c in enumerate(_TAP_CHANNELS):
        w = get(lin_sd, f"lin{tap}.model.1.weight",
                f"lins.{tap}.model.1.weight")
        w = np.asarray(w).reshape(-1)
        assert w.shape == (c,), (tap, w.shape)
        # lpips clamps heads non-negative at eval
        lins.append(jnp.asarray(np.maximum(w, 0.0)))
    return {"vgg": vgg, "lins": lins}


def random_lpips_params(seed: int = 0) -> Dict:
    """Deterministic random-VGG proxy params (see module docstring)."""
    model = VGG16Taps()
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, 32, 32, 3), jnp.float32))
    lins = [jnp.full((c,), 1.0 / c, jnp.float32) for c in _TAP_CHANNELS]
    return {"vgg": variables["params"], "lins": lins}


def save_lpips_npz(path: str, params: Dict):
    flat = {}
    for name, leaf in jax.tree_util.tree_leaves_with_path(params["vgg"]):
        key = "vgg/" + "/".join(
            p.key for p in name if hasattr(p, "key"))
        flat[key] = np.asarray(leaf)
    for i, w in enumerate(params["lins"]):
        flat[f"lin{i}"] = np.asarray(w)
    np.savez(path, **flat)


def load_lpips_npz(path: str) -> Dict:
    data = np.load(path)
    vgg: Dict = {}
    lins = [None] * len(_TAP_CHANNELS)
    for key in data.files:
        if key.startswith("vgg/"):
            parts = key.split("/")[1:]
            d = vgg
            for p in parts[:-1]:
                d = d.setdefault(p, {})
            d[parts[-1]] = jnp.asarray(data[key])
        elif key.startswith("lin"):
            lins[int(key[3:])] = jnp.asarray(data[key])
    assert all(w is not None for w in lins), "missing lin heads in npz"
    return {"vgg": vgg, "lins": lins}


def load_lpips_params(weights_path: Optional[str] = None):
    """Resolve LPIPS params: explicit path > $SANERF_LPIPS_WEIGHTS >
    deterministic random proxy.  Returns (params, mode)."""
    path = weights_path or os.environ.get("SANERF_LPIPS_WEIGHTS", "")
    if path and os.path.exists(path):
        return load_lpips_npz(path), "flax-vgg16-ckpt"
    return random_lpips_params(), "flax-random-proxy"
