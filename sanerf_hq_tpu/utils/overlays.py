"""Mask / point visualization overlays (reference: nerf/utils.py:23-98)."""
from __future__ import annotations

import numpy as np


def overlay_mask(image: np.ndarray, mask: np.ndarray,
                 color=(30 / 255, 144 / 255, 1.0), alpha: float = 0.6):
    """image [H, W, 3] float in [0,1]; mask [H, W] bool-like."""
    m = np.asarray(mask).astype(bool)
    out = image.copy()
    out[m] = (1 - alpha) * image[m] + alpha * np.asarray(color)
    return out


def overlay_mask_only(mask: np.ndarray):
    m = np.asarray(mask).astype(np.float32)
    return np.repeat(m[..., None], 3, axis=-1)


def overlay_mask_heatmap(image: np.ndarray, prob: np.ndarray,
                         alpha: float = 0.6):
    """prob [H, W] in [0,1] -> red-blue heatmap blended over image."""
    p = np.clip(np.asarray(prob, np.float32), 0, 1)
    heat = np.stack([p, np.zeros_like(p), 1 - p], axis=-1)
    return (1 - alpha) * image + alpha * heat


def overlay_mask_composition(image: np.ndarray, mask: np.ndarray,
                             bg_color=1.0):
    m = np.asarray(mask).astype(bool)[..., None]
    return np.where(m, image, bg_color)


def overlay_point(image: np.ndarray, coords: np.ndarray, radius: int = 4,
                  inputs_point_labels=None):
    """coords: [N, 2] (x, y). Positive points green, negative red."""
    out = image.copy()
    H, W = image.shape[:2]
    for i, (x, y) in enumerate(np.asarray(coords)):
        pos = inputs_point_labels is None or inputs_point_labels[i] == 1
        color = (0.0, 1.0, 0.0) if pos else (1.0, 0.0, 0.0)
        y0, y1 = max(0, y - radius), min(H, y + radius + 1)
        x0, x1 = max(0, x - radius), min(W, x + radius + 1)
        out[y0:y1, x0:x1] = color
    return out


def get_incoherent_mask(input_masks, sfact: int = 2):
    """Down-up-sample residual mask: marks pixels whose mask value is not
    representable at 1/sfact resolution — i.e. mask boundary/detail regions
    (reference: nerf/utils.py:308-323)."""
    import numpy as np

    m = np.asarray(input_masks, np.float32)
    squeeze = False
    if m.ndim == 2:
        m = m[None]
        squeeze = True
    h, w = m.shape[-2:]
    import cv2

    out = []
    for mm in m:
        small = cv2.resize(mm, (w // sfact, h // sfact),
                           interpolation=cv2.INTER_LINEAR)
        back = cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST)
        out.append((np.abs(back - mm) > 0.01).astype(np.float32))
    res = np.stack(out)
    return res[0] if squeeze else res
