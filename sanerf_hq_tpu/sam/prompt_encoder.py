"""SAM prompt encoder (flax): points / boxes / masks -> sparse & dense
embeddings.  Used by the decode stage with projected 3-D point prompts
(reference: nerf/trainer.py:996-1066 via SamPredictor.predict_torch)."""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .common import LayerNorm2d, gelu


class PositionEmbeddingRandom(nn.Module):
    """Random-fourier positional encoding (fixed gaussian matrix param)."""
    num_pos_feats: int = 128
    scale: float = 1.0

    @nn.compact
    def __call__(self, coords_norm):
        """coords_norm in [0,1], shape [..., 2] -> [..., 2*num_pos_feats]."""
        mat = self.param(
            "positional_encoding_gaussian_matrix",
            lambda k, s: self.scale * __import__("jax").random.normal(k, s),
            (2, self.num_pos_feats),
        )
        coords = 2.0 * coords_norm - 1.0
        coords = coords @ mat
        coords = 2 * jnp.pi * coords
        return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)

    def grid_pe(self, size: Tuple[int, int]):
        """Dense PE for a [H, W] grid -> [H, W, C]."""
        h, w = size
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # [H,W,2]
        return self(grid)


class PromptEncoder(nn.Module):
    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16

    def setup(self):
        self.pe_layer = PositionEmbeddingRandom(self.embed_dim // 2)
        # 0: negative point, 1: positive point, 2/3: box corners
        self.point_embeddings = [
            nn.Embed(1, self.embed_dim, name=f"point_embeddings_{i}")
            for i in range(4)
        ]
        self.not_a_point_embed = nn.Embed(1, self.embed_dim,
                                          name="not_a_point_embed")
        self.no_mask_embed = nn.Embed(1, self.embed_dim, name="no_mask_embed")
        self.mask_conv1 = nn.Conv(self.mask_in_chans // 4, (2, 2),
                                  strides=(2, 2), name="mask_downscaling_0")
        self.mask_ln1 = LayerNorm2d(name="mask_downscaling_1")
        self.mask_conv2 = nn.Conv(self.mask_in_chans, (2, 2), strides=(2, 2),
                                  name="mask_downscaling_3")
        self.mask_ln2 = LayerNorm2d(name="mask_downscaling_4")
        self.mask_conv3 = nn.Conv(self.embed_dim, (1, 1),
                                  name="mask_downscaling_6")

    def get_dense_pe(self):
        return self.pe_layer.grid_pe(self.image_embedding_size)  # [H, W, C]

    def _embed_points(self, points, labels, pad: bool):
        """points: [B, N, 2] pixel coords in input_image space;
        labels: [B, N] in {-1 (pad), 0 (neg), 1 (pos)}."""
        points = points + 0.5
        if pad:
            pad_point = jnp.zeros((points.shape[0], 1, 2))
            pad_label = -jnp.ones((labels.shape[0], 1))
            points = jnp.concatenate([points, pad_point], axis=1)
            labels = jnp.concatenate([labels, pad_label], axis=1)
        coords = points / jnp.array(
            [self.input_image_size[1], self.input_image_size[0]], jnp.float32
        )
        pe = self.pe_layer(coords)  # [B, N, C]
        lbl = labels[..., None]
        emb_neg = self.point_embeddings[0].embedding[0]
        emb_pos = self.point_embeddings[1].embedding[0]
        emb_pad = self.not_a_point_embed.embedding[0]
        out = jnp.where(lbl == -1, emb_pad, 0.0) + jnp.where(
            lbl == -1, 0.0, pe
        )
        out = out + jnp.where(lbl == 0, emb_neg, 0.0)
        out = out + jnp.where(lbl == 1, emb_pos, 0.0)
        return out

    def _embed_boxes(self, boxes):
        """boxes: [B, 4] -> [B, 2, C]."""
        boxes = boxes + 0.5
        coords = boxes.reshape(-1, 2, 2) / jnp.array(
            [self.input_image_size[1], self.input_image_size[0]], jnp.float32
        )
        pe = self.pe_layer(coords)
        pe = pe.at[:, 0].add(self.point_embeddings[2].embedding[0])
        pe = pe.at[:, 1].add(self.point_embeddings[3].embedding[0])
        return pe

    def _embed_masks(self, masks):
        """masks: [B, 4*H, 4*W, 1] -> [B, H, W, C]."""
        x = self.mask_conv1(masks)
        x = gelu(self.mask_ln1(x))
        x = self.mask_conv2(x)
        x = gelu(self.mask_ln2(x))
        return self.mask_conv3(x)

    def __call__(self, points=None, labels=None, boxes=None, masks=None):
        """Returns (sparse [B, N, C], dense [B, H, W, C])."""
        bs = 1
        sparse_list = []
        if points is not None:
            bs = points.shape[0]
            sparse_list.append(
                self._embed_points(points, labels, pad=(boxes is None))
            )
        if boxes is not None:
            bs = boxes.shape[0]
            sparse_list.append(self._embed_boxes(boxes))
        sparse = (
            jnp.concatenate(sparse_list, axis=1)
            if sparse_list else jnp.zeros((bs, 0, self.embed_dim))
        )
        if masks is not None:
            dense = self._embed_masks(masks)
        else:
            h, w = self.image_embedding_size
            dense = jnp.broadcast_to(
                self.no_mask_embed.embedding[0].reshape(1, 1, 1, -1),
                (bs, h, w, self.embed_dim),
            )
        return sparse, dense
