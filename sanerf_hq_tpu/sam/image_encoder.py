"""SAM ViT image encoder (flax), NHWC, jit-friendly fixed 1024x1024 input.

Produces the [B, 64, 64, 256] feature map the SANeRF-HQ pipeline distills
(reference usage: nerf/trainer.py:520-523 via SamPredictor.features), plus
the intermediate global-block embeddings the HQ decoder consumes
(`interm_features`, nerf/trainer.py:524-525).

Architecture: ViT with 16x16 patch embed, absolute + decomposed relative
position embeddings, windowed attention except at the global blocks, and a
2-conv neck to 256 channels.  Parameter names match the torch checkpoints
1:1 (see weights.py).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import LayerNorm2d, MLPBlock


def get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Interpolate/select relative positional embeddings for q/k sizes.
    rel_pos: [2*max-1, head_dim]."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        # linear resize along axis 0
        rel_pos = jax.image.resize(
            rel_pos, (max_rel_dist, rel_pos.shape[1]), method="linear"
        )
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


def add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w, q_size, k_size):
    """attn: [B*nh, qh*qw, kh*kw]; q: [B*nh, qh*qw, dim]."""
    qh, qw = q_size
    kh, kw = k_size
    Rh = get_rel_pos(qh, kh, rel_pos_h)  # [qh, kh, dim]
    Rw = get_rel_pos(qw, kw, rel_pos_w)  # [qw, kw, dim]
    B = q.shape[0]
    r_q = q.reshape(B, qh, qw, -1)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, Rh)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, Rw)
    attn = attn.reshape(B, qh, qw, kh, kw)
    attn = attn + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
    return attn.reshape(B, qh * qw, kh * kw)


def window_partition(x, window_size: int):
    """x: [B, H, W, C] -> windows [B*nW, ws, ws, C], with padding."""
    B, H, W, C = x.shape
    pad_h = (window_size - H % window_size) % window_size
    pad_w = (window_size - W % window_size) % window_size
    x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // window_size, window_size, Wp // window_size,
                  window_size, C)
    windows = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size,
                                                    window_size, C)
    return windows, (Hp, Wp)


def window_unpartition(windows, window_size: int, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = windows.shape[0] // (Hp * Wp // window_size // window_size)
    x = windows.reshape(B, Hp // window_size, Wp // window_size, window_size,
                        window_size, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


class Attention(nn.Module):
    num_heads: int
    use_rel_pos: bool = True
    input_size: Tuple[int, int] = (14, 14)

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        B, H, W, C = x.shape
        head_dim = C // self.num_heads
        qkv = nn.Dense(3 * C, name="qkv")(x.reshape(B, H * W, C))
        qkv = qkv.reshape(B, H * W, 3, self.num_heads, head_dim)
        qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(3, B * self.num_heads,
                                                   H * W, head_dim)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * (head_dim ** -0.5)) @ k.transpose(0, 2, 1)
        if self.use_rel_pos:
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros,
                (2 * self.input_size[0] - 1, head_dim),
            )
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros,
                (2 * self.input_size[1] - 1, head_dim),
            )
            attn = add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w,
                                          (H, W), (H, W))
        attn = jax.nn.softmax(attn, axis=-1)
        x = (attn @ v).reshape(B, self.num_heads, H, W, head_dim)
        x = x.transpose(0, 2, 3, 1, 4).reshape(B, H, W, C)
        return nn.Dense(C, name="proj")(x)


class Block(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    window_size: int = 0
    input_size: Tuple[int, int] = (64, 64)

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        C = x.shape[-1]
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.window_size > 0:
            H, W = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, self.window_size)
            attn_size = (self.window_size, self.window_size)
        else:
            attn_size = self.input_size
        x = Attention(self.num_heads, input_size=attn_size, name="attn")(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, (H, W))
        x = shortcut + x
        x = x + MLPBlock(int(C * self.mlp_ratio), name="mlp")(
            nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        )
        return x


class ImageEncoderViT(nn.Module):
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 1280  # vit_h
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.0
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (7, 15, 23, 31)

    @nn.compact
    def __call__(self, x, return_interm: bool = False):
        """x: [B, H, W, 3] normalized. Returns [B, H/16, W/16, out_chans]
        (and the list of global-block embeddings if return_interm — the
        HQ-SAM `interm_features`)."""
        x = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            name="patch_embed_proj",
        )(x)  # [B, H/16, W/16, D]
        pos_embed = self.param(
            "pos_embed", nn.initializers.zeros,
            (1, self.img_size // self.patch_size,
             self.img_size // self.patch_size, self.embed_dim),
        )
        x = x + pos_embed

        interm = []
        grid = self.img_size // self.patch_size
        for i in range(self.depth):
            ws = 0 if i in self.global_attn_indexes else self.window_size
            x = Block(
                self.num_heads, self.mlp_ratio, window_size=ws,
                input_size=(grid, grid), name=f"blocks_{i}",
            )(x)
            if i in self.global_attn_indexes:
                interm.append(x)

        # neck
        y = nn.Conv(self.out_chans, (1, 1), use_bias=False, name="neck_conv1")(x)
        y = LayerNorm2d(name="neck_ln1")(y)
        y = nn.Conv(self.out_chans, (3, 3), padding="SAME", use_bias=False,
                    name="neck_conv2")(y)
        y = LayerNorm2d(name="neck_ln2")(y)
        if return_interm:
            return y, interm
        return y


def vit_h_config():
    return dict(embed_dim=1280, depth=32, num_heads=16,
                global_attn_indexes=(7, 15, 23, 31))


def vit_l_config():
    return dict(embed_dim=1024, depth=24, num_heads=16,
                global_attn_indexes=(5, 11, 17, 23))


def vit_b_config():
    return dict(embed_dim=768, depth=12, num_heads=12,
                global_attn_indexes=(2, 5, 8, 11))
