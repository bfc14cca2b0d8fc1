"""SamPredictor equivalent with a first-class feature-injection seam.

Reference usage (nerf/trainer.py:996-1066): SANeRF-HQ renders/loads a
feature map and injects it directly into the predictor instead of running
the image encoder — resize the feature map so its long side is 64, zero-pad
to 64x64, set input_size/original_size, then decode with point prompts.
Here that seam is the explicit `set_features` API.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


class SamPredictor:
    def __init__(self, sam, img_size: int = 1024):
        """sam: a built SamModel bundle (see build.py) with .encoder,
        .prompt_encoder, .decoder modules and .params."""
        self.sam = sam
        self.img_size = img_size
        self.reset_image()
        self._encode = jax.jit(self._encode_impl)
        self._decode = jax.jit(self._decode_impl,
                               static_argnames=("multimask_output", "hq"))

    # -- image path --------------------------------------------------------
    def reset_image(self):
        self.features = None
        self.interm_features = None
        self.original_size = None
        self.input_size = None
        self.is_image_set = False

    def _encode_impl(self, params, x):
        return self.sam.encoder.apply(
            {"params": params["encoder"]}, x, return_interm=True
        )

    def set_image(self, image: np.ndarray):
        """image: [H, W, 3] uint8 RGB."""
        H, W = image.shape[:2]
        ratio = self.img_size / max(H, W)
        newh, neww = int(H * ratio + 0.5), int(W * ratio + 0.5)
        import cv2

        img = cv2.resize(image, (neww, newh), interpolation=cv2.INTER_LINEAR)
        img = (img.astype(np.float32) - PIXEL_MEAN) / PIXEL_STD
        pad = np.zeros((self.img_size, self.img_size, 3), np.float32)
        pad[:newh, :neww] = img
        feats, interm = self._encode(self.sam.params, jnp.asarray(pad)[None])
        self.features = feats  # [1, 64, 64, 256]
        self.interm_features = interm
        self.original_size = (H, W)
        self.input_size = (newh, neww)
        self.is_image_set = True
        return feats

    def set_features(self, features, original_size: Tuple[int, int],
                     interm_features=None):
        """Inject a rendered/cached feature map (the SANeRF-HQ seam).
        features: [h, w, 256] or [1, h, w, 256]; resized so long side = 64
        then zero-padded bottom/right to 64x64 (nerf/trainer.py:1008-1020)."""
        f = jnp.asarray(features)
        if f.ndim == 3:
            f = f[None]
        h, w = f.shape[1:3]
        grid = self.img_size // 16  # 64 for the standard 1024 model
        ratio = grid / max(h, w)
        nh, nw = int(h * ratio), int(w * ratio)
        f = jax.image.resize(f, (1, nh, nw, f.shape[-1]), method="bilinear")
        f = jnp.pad(f, ((0, 0), (0, grid - nh), (0, grid - nw), (0, 0)))
        self.features = f
        self.interm_features = interm_features
        H, W = original_size
        ratio_img = self.img_size / max(H, W)
        self.original_size = (H, W)
        self.input_size = (int(H * ratio_img), int(W * ratio_img))
        self.is_image_set = True

    # -- prompt / decode ----------------------------------------------------
    def transform_coords(self, coords: np.ndarray) -> np.ndarray:
        """original-image pixel coords -> model-input coords."""
        H, W = self.original_size
        ratio = self.img_size / max(H, W)
        return (coords.astype(np.float32) * ratio).astype(np.int32)

    def _decode_impl(self, params, features, coords, labels, mask_input,
                     multimask_output: bool = True, hq: bool = False,
                     interm=None):
        pe = self.sam.prompt_encoder
        dec = self.sam.decoder
        sparse, dense = pe.apply(
            {"params": params["prompt_encoder"]},
            points=coords, labels=labels, masks=mask_input,
        )
        image_pe = pe.apply(
            {"params": params["prompt_encoder"]}, method=pe.get_dense_pe
        )[None]
        if hq:
            masks, iou = dec.apply(
                {"params": params["decoder"]}, features, image_pe, sparse,
                dense, multimask_output, interm,
            )
        else:
            masks, iou = dec.apply(
                {"params": params["decoder"]}, features, image_pe, sparse,
                dense, multimask_output,
            )
        return masks, iou

    def predict(self, point_coords=None, point_labels=None, mask_input=None,
                multimask_output: bool = True, return_logits: bool = False):
        """point_coords: [N, 2] in model-input space (like predict_torch,
        nerf/trainer.py:1060-1065).  Returns (masks [T, H, W] bool/float,
        iou_predictions [T], low_res_masks [T, 256, 256])."""
        assert self.is_image_set
        coords = jnp.asarray(point_coords, jnp.float32)[None]
        labels = jnp.asarray(point_labels, jnp.int32)[None]
        mi = None
        if mask_input is not None:
            mi = jnp.asarray(mask_input, jnp.float32)
            if mi.ndim == 3:
                mi = mi[..., None][None] if mi.shape[0] != 1 else mi[..., None]
        hq = self.sam.is_hq and self.interm_features is not None
        interm = self.interm_features[0] if hq else None
        low_res, iou = self._decode(
            self.sam.params, self.features, coords, labels, mi,
            multimask_output=multimask_output, hq=hq, interm=interm,
        )
        low_res = low_res[0]  # [T, 256, 256]
        iou = iou[0]
        masks = self._upscale(low_res)
        if not return_logits:
            masks = masks > 0.0
        return np.asarray(masks), np.asarray(iou), np.asarray(low_res)

    def _upscale(self, low_res):
        """[T, 256, 256] logits -> original_size via input-size crop
        (standard SAM postprocess)."""
        T = low_res.shape[0]
        x = jax.image.resize(
            low_res, (T, self.img_size, self.img_size), method="bilinear"
        )
        ih, iw = self.input_size
        x = x[:, :ih, :iw]
        H, W = self.original_size
        return jax.image.resize(x, (T, H, W), method="bilinear")
