"""Metric meters with the reference's clear/update/measure/report protocol.

Reference: nerf/metrics.py:10-237 (PSNRMeter, SSIMMeter, LPIPSMeter,
MeanIoUMeter, MSEMeter).  SSIM is a pure-JAX gaussian-window implementation
(equivalent to torchmetrics' default: 11x11 window, sigma 1.5, k1=0.01,
k2=0.03, data_range 1).  LPIPS uses torch-cpu lpips when available and
otherwise the pure-flax VGG16-LPIPS (train/lpips.py) — always available.

Fixes vs reference: SSIMMeter there accumulates a tensor instead of a float
(nerf/metrics.py:128-131, SURVEY §2.5) — not replicated.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def psnr(pred, gt, data_range: float = 1.0):
    mse = jnp.mean((pred - gt) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse / data_range ** 2, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(pred, gt, data_range: float = 1.0, k1: float = 0.01, k2: float = 0.03):
    """pred, gt: [H, W, C] in [0, data_range]."""
    kern = _gaussian_kernel()[:, :, None, None]  # [11,11,1,1]
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    def filt(img):
        # [H, W, C] -> depthwise conv.  precision=HIGHEST: on TPU the
        # default bf16 conv loses the E[x^2]-E[x]^2 cancellation (variances
        # go negative ~1e-3, inflating SSIM past 1)
        x = jnp.transpose(img, (2, 0, 1))[:, None]  # [C,1,H,W]
        out = jax.lax.conv_general_dilated(
            x, jnp.transpose(kern, (3, 2, 0, 1)), (1, 1), "VALID",
            precision=jax.lax.Precision.HIGHEST,
        )
        return out[:, 0]  # [C, H', W']

    mu_p = filt(pred)
    mu_g = filt(gt)
    mu_pp = filt(pred * pred)
    mu_gg = filt(gt * gt)
    mu_pg = filt(pred * gt)
    var_p = mu_pp - mu_p ** 2
    var_g = mu_gg - mu_g ** 2
    cov = mu_pg - mu_p * mu_g
    s = ((2 * mu_p * mu_g + c1) * (2 * cov + c2)) / (
        (mu_p ** 2 + mu_g ** 2 + c1) * (var_p + var_g + c2)
    )
    return jnp.mean(s)


class Meter:
    name = "meter"
    higher_better = True

    def __init__(self):
        self.clear()

    def clear(self):
        self.V = 0.0
        self.N = 0

    def update(self, preds, truths):
        raise NotImplementedError

    def measure(self):
        return self.V / max(self.N, 1)

    def report(self):
        return f"{self.name} = {self.measure():.6f}"


class PSNRMeter(Meter):
    name = "PSNR"

    def update(self, preds, truths):
        self.V += float(psnr(jnp.asarray(preds), jnp.asarray(truths)))
        self.N += 1


class SSIMMeter(Meter):
    name = "SSIM"

    def update(self, preds, truths):
        p = jnp.asarray(preds)
        t = jnp.asarray(truths)
        if p.ndim == 3:
            p, t = p[None], t[None]
        for i in range(p.shape[0]):
            self.V += float(ssim(p[i], t[i]))
            self.N += 1


class LPIPSMeter(Meter):
    """VGG-LPIPS (reference nerf/metrics.py:54-99).  Backend priority:
    torch `lpips` package (exact reference parity) > pure-flax VGG16-LPIPS
    with converted weights ($SANERF_LPIPS_WEIGHTS, scripts/convert_lpips.py)
    > deterministic random-VGG perceptual proxy (train/lpips.py docstring).
    Always available; `.mode` names the active backend."""

    name = "LPIPS"
    higher_better = False

    def __init__(self, net: str = "vgg", weights_path=None):
        self.net_name = net
        self._fn = None
        self.mode = "torch-lpips"
        try:
            import torch
            import lpips  # type: ignore

            self._torch = torch
            self._torch_fn = lpips.LPIPS(net=net).eval()
            self._fn = self._torch_update
        except Exception:
            from .lpips import load_lpips_params, make_lpips_fn

            params, self.mode = load_lpips_params(weights_path)
            self._flax_fn = make_lpips_fn(params)
            self._fn = self._flax_update
        super().__init__()

    @property
    def available(self):
        return True

    def report(self):
        return f"{self.name}[{self.mode}] = {self.measure():.6f}"

    def _torch_update(self, preds, truths):
        torch = self._torch
        p = torch.from_numpy(np.asarray(preds, np.float32)).permute(2, 0, 1)[None]
        t = torch.from_numpy(np.asarray(truths, np.float32)).permute(2, 0, 1)[None]
        with torch.no_grad():
            v = self._torch_fn(p * 2 - 1, t * 2 - 1)
        return float(v.item())

    def _flax_update(self, preds, truths):
        return float(self._flax_fn(jnp.asarray(preds, jnp.float32),
                                   jnp.asarray(truths, jnp.float32)))

    def update(self, preds, truths):
        self.V += self._fn(preds, truths)
        self.N += 1


class MSEMeter(Meter):
    name = "MSE"
    higher_better = False

    def update(self, preds, truths):
        self.V += float(jnp.mean((jnp.asarray(preds) - jnp.asarray(truths)) ** 2))
        self.N += 1


class MeanIoUMeter(Meter):
    """Per-class IoU averaged over classes then views
    (nerf/metrics.py:147-194).  preds/truths are integer label maps."""
    name = "MeanIoU"

    def update(self, preds, truths):
        p = np.asarray(preds).reshape(-1)
        t = np.asarray(truths).reshape(-1)
        valid = t != -1
        p, t = p[valid], t[valid]
        ious = []
        for cls in np.unique(t):
            pi = p == cls
            ti = t == cls
            inter = np.logical_and(pi, ti).sum()
            union = np.logical_or(pi, ti).sum()
            if union > 0:
                ious.append(inter / union)
        if ious:
            self.V += float(np.mean(ious))
            self.N += 1


def pixel_accuracy(pred, gt, ignore=-1):
    p = np.asarray(pred).reshape(-1)
    t = np.asarray(gt).reshape(-1)
    valid = t != ignore
    if valid.sum() == 0:
        return 0.0
    return float((p[valid] == t[valid]).mean())
