"""SAM mask decoder (flax), standard + HQ variants.

The standard decoder predicts 4 masks (1 single + 3 multi) with an IoU
head; the HQ variant adds a high-quality token whose hypernetwork runs on a
fused feature map built from early+final ViT features (sam_type='sam_hq',
reference flag main.py:27).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .common import LayerNorm2d, MLPHead, gelu
from .transformer import TwoWayTransformer


class MaskDecoder(nn.Module):
    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256

    @property
    def num_mask_tokens(self):
        return self.num_multimask_outputs + 1

    def setup(self):
        self.transformer = TwoWayTransformer(
            depth=2, embedding_dim=self.transformer_dim, num_heads=8,
            mlp_dim=2048, name="transformer",
        )
        self.iou_token = nn.Embed(1, self.transformer_dim, name="iou_token")
        self.mask_tokens = nn.Embed(self.num_mask_tokens, self.transformer_dim,
                                    name="mask_tokens")
        self.upscale_conv1 = nn.ConvTranspose(
            self.transformer_dim // 4, (2, 2), strides=(2, 2),
            name="output_upscaling_0",
        )
        self.upscale_ln = LayerNorm2d(name="output_upscaling_1")
        self.upscale_conv2 = nn.ConvTranspose(
            self.transformer_dim // 8, (2, 2), strides=(2, 2),
            name="output_upscaling_3",
        )
        self.output_hypernetworks_mlps = [
            MLPHead(self.transformer_dim, self.transformer_dim // 8, 3,
                    name=f"output_hypernetworks_mlps_{i}")
            for i in range(self.num_mask_tokens)
        ]
        self.iou_prediction_head = MLPHead(
            self.iou_head_hidden_dim, self.num_mask_tokens,
            self.iou_head_depth, name="iou_prediction_head",
        )

    def predict_masks(self, image_embeddings, image_pe, sparse_prompt,
                      dense_prompt):
        """image_embeddings: [B, H, W, C]; sparse: [B, N, C]; dense:
        [B, H, W, C].  Returns (masks [B, num_tokens, 4H, 4W],
        iou_pred [B, num_tokens], upscaled [B,4H,4W,C/8], hyper_in, src)."""
        B = sparse_prompt.shape[0]
        output_tokens = jnp.concatenate(
            [self.iou_token.embedding, self.mask_tokens.embedding], axis=0
        )
        output_tokens = jnp.broadcast_to(
            output_tokens[None], (B, *output_tokens.shape)
        )
        tokens = jnp.concatenate([output_tokens, sparse_prompt], axis=1)

        src = image_embeddings + dense_prompt
        hs, src_out = self.transformer(src, image_pe, tokens)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1:1 + self.num_mask_tokens]

        h, w = image_embeddings.shape[1:3]
        src_img = src_out.reshape(B, h, w, -1)
        up = self.upscale_conv1(src_img)
        up = gelu(self.upscale_ln(up))
        up = gelu(self.upscale_conv2(up))  # [B, 4H, 4W, C/8]

        hyper_in = jnp.stack([
            self.output_hypernetworks_mlps[i](mask_tokens_out[:, i])
            for i in range(self.num_mask_tokens)
        ], axis=1)  # [B, T, C/8]
        masks = jnp.einsum("btc,bhwc->bthw", hyper_in, up)
        iou_pred = self.iou_prediction_head(iou_token_out)
        return masks, iou_pred, up, mask_tokens_out, src_img

    def __call__(self, image_embeddings, image_pe, sparse_prompt,
                 dense_prompt, multimask_output: bool = True):
        masks, iou_pred, _, _, _ = self.predict_masks(
            image_embeddings, image_pe, sparse_prompt, dense_prompt
        )
        sl = slice(1, None) if multimask_output else slice(0, 1)
        return masks[:, sl], iou_pred[:, sl]


class MaskDecoderHQ(nn.Module):
    """HQ-SAM decoder: adds hf_token + ViT-feature fusion path."""
    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    vit_dim: int = 1280  # encoder embed dim (vit_h)

    @property
    def num_mask_tokens(self):
        return self.num_multimask_outputs + 2  # + hf token

    def setup(self):
        self.base = MaskDecoder(
            transformer_dim=self.transformer_dim,
            num_multimask_outputs=self.num_multimask_outputs, name="base",
        )
        self.hf_token = nn.Embed(1, self.transformer_dim, name="hf_token")
        self.hf_mlp = MLPHead(self.transformer_dim, self.transformer_dim // 8,
                              3, name="hf_mlp")
        self.compress_vit_conv1 = nn.ConvTranspose(
            self.transformer_dim, (2, 2), strides=(2, 2),
            name="compress_vit_feat_0",
        )
        self.compress_vit_ln = LayerNorm2d(name="compress_vit_feat_1")
        self.compress_vit_conv2 = nn.ConvTranspose(
            self.transformer_dim // 8, (2, 2), strides=(2, 2),
            name="compress_vit_feat_3",
        )
        self.embedding_encoder_conv1 = nn.ConvTranspose(
            self.transformer_dim // 4, (2, 2), strides=(2, 2),
            name="embedding_encoder_0",
        )
        self.embedding_encoder_ln = LayerNorm2d(name="embedding_encoder_1")
        self.embedding_encoder_conv2 = nn.ConvTranspose(
            self.transformer_dim // 8, (2, 2), strides=(2, 2),
            name="embedding_encoder_3",
        )
        self.embedding_maskfeature_conv1 = nn.Conv(
            self.transformer_dim // 4, (3, 3), padding="SAME",
            name="embedding_maskfeature_0",
        )
        self.embedding_maskfeature_ln = LayerNorm2d(name="embedding_maskfeature_1")
        self.embedding_maskfeature_conv2 = nn.Conv(
            self.transformer_dim // 8, (3, 3), padding="SAME",
            name="embedding_maskfeature_3",
        )

    def __call__(self, image_embeddings, image_pe, sparse_prompt, dense_prompt,
                 multimask_output: bool, interm_embeddings,
                 hq_token_only: bool = False):
        """interm_embeddings: early global-block ViT features [B, H, W, vit_dim]."""
        vit_feat = interm_embeddings
        hq_feature = (
            self._embedding_encoder(image_embeddings)
            + self._compress_vit(vit_feat)
        )  # [B, 4H, 4W, C/8]

        B = sparse_prompt.shape[0]
        output_tokens = jnp.concatenate([
            self.base.iou_token.embedding,
            self.base.mask_tokens.embedding,
            self.hf_token.embedding,
        ], axis=0)
        output_tokens = jnp.broadcast_to(output_tokens[None],
                                         (B, *output_tokens.shape))
        tokens = jnp.concatenate([output_tokens, sparse_prompt], axis=1)

        src = image_embeddings + dense_prompt
        hs, src_out = self.base.transformer(src, image_pe, tokens)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1:1 + self.num_mask_tokens]

        h, w = image_embeddings.shape[1:3]
        src_img = src_out.reshape(B, h, w, -1)
        up = self.base.upscale_conv1(src_img)
        up = gelu(self.base.upscale_ln(up))
        up = gelu(self.base.upscale_conv2(up))
        up_hq = self._embedding_maskfeature(up) + hq_feature

        hypers = []
        for i in range(self.num_mask_tokens):
            if i < self.num_mask_tokens - 1:
                hypers.append(
                    self.base.output_hypernetworks_mlps[i](mask_tokens_out[:, i])
                )
            else:
                hypers.append(self.hf_mlp(mask_tokens_out[:, i]))
        hyper_in = jnp.stack(hypers, axis=1)

        masks_sam = jnp.einsum(
            "btc,bhwc->bthw", hyper_in[:, :-1], up
        )
        masks_hq = jnp.einsum(
            "btc,bhwc->bthw", hyper_in[:, -1:], up_hq
        )
        iou_pred = self.base.iou_prediction_head(iou_token_out)

        if multimask_output:
            masks_base = masks_sam[:, 1:]
            iou = iou_pred[:, 1:self.num_mask_tokens - 1]
        else:
            masks_base = masks_sam[:, :1]
            iou = iou_pred[:, :1]
        if hq_token_only:
            return masks_hq, iou
        return jnp.concatenate([masks_base, masks_hq], axis=1), iou

    def _compress_vit(self, x):
        y = self.compress_vit_conv1(x)
        y = gelu(self.compress_vit_ln(y))
        return self.compress_vit_conv2(y)

    def _embedding_encoder(self, x):
        y = self.embedding_encoder_conv1(x)
        y = gelu(self.embedding_encoder_ln(y))
        return self.embedding_encoder_conv2(y)

    def _embedding_maskfeature(self, x):
        y = self.embedding_maskfeature_conv1(x)
        y = gelu(self.embedding_maskfeature_ln(y))
        return self.embedding_maskfeature_conv2(y)
