"""Two-way transformer for the SAM mask decoder (flax)."""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .common import MLPBlock


class AttentionDS(nn.Module):
    """Attention with optional internal channel downsampling."""
    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        internal = self.embedding_dim // self.downsample_rate
        head_dim = internal // self.num_heads
        q = nn.Dense(internal, name="q_proj")(q)
        k = nn.Dense(internal, name="k_proj")(k)
        v = nn.Dense(internal, name="v_proj")(v)

        def split(x):
            b, n, c = x.shape
            return x.reshape(b, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        attn = (q @ k.transpose(0, 1, 3, 2)) / (head_dim ** 0.5)
        attn = nn.softmax(attn, axis=-1)
        out = attn @ v
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        return nn.Dense(self.embedding_dim, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            # first layer REPLACES queries with the attention output — no
            # residual (sam transformer.py TwoWayAttentionBlock.forward)
            queries = AttentionDS(
                self.embedding_dim, self.num_heads, name="self_attn"
            )(queries, queries, queries)
        else:
            q = queries + query_pe
            attn_out = AttentionDS(
                self.embedding_dim, self.num_heads, name="self_attn"
            )(q, q, queries)
            queries = queries + attn_out
        queries = nn.LayerNorm(epsilon=1e-5, name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + AttentionDS(
            self.embedding_dim, self.num_heads,
            self.attention_downsample_rate, name="cross_attn_token_to_image",
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm2")(queries)

        # the two-way transformer's MLP uses ReLU (sam-hq transformer.py,
        # TwoWayAttentionBlock activation default), unlike the ViT blocks
        queries = queries + MLPBlock(self.mlp_dim, act=nn.relu,
                                     name="mlp")(queries)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + AttentionDS(
            self.embedding_dim, self.num_heads,
            self.attention_downsample_rate, name="cross_attn_image_to_token",
        )(k, q, queries)
        keys = nn.LayerNorm(epsilon=1e-5, name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding/pe: [B, H, W, C]; point_embedding: [B, N, C]."""
        b, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(b, h * w, c)
        key_pe = image_pe.reshape(b if image_pe.shape[0] == b else 1, h * w, c)
        key_pe = jnp.broadcast_to(key_pe, keys.shape)
        queries = point_embedding

        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.embedding_dim, self.num_heads, self.mlp_dim,
                self.attention_downsample_rate,
                skip_first_layer_pe=(i == 0), name=f"layers_{i}",
            )(queries, keys, point_embedding, key_pe)

        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + AttentionDS(
            self.embedding_dim, self.num_heads,
            self.attention_downsample_rate, name="final_attn_token_to_image",
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm_final_attn")(queries)
        return queries, keys
