"""Shared blocks for the flax SAM implementation.

The SAM/HQ-SAM architecture (ViT encoder + prompt encoder + two-way mask
decoder) follows the public segment-anything model family, consumed by the
reference via pip `segment-anything-hq` (requirements.txt:24, SURVEY §2.2).
This is a from-scratch flax implementation whose parameter tree maps 1:1 to
the torch checkpoints so reference weights load directly (see weights.py).
"""
from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp


def gelu(x):
    """Exact (erf) GELU — torch nn.GELU's default.  flax nn.gelu defaults
    to the tanh approximation, which diverges from the SAM checkpoints'
    training-time activation by up to ~1e-3."""
    return nn.gelu(x, approximate=False)


class LayerNorm2d(nn.Module):
    """Channel-wise LayerNorm over NCHW-style channel axis; here we keep
    NHWC and normalize the last axis with eps 1e-6 (matches the torch
    LayerNorm2d used in SAM necks)."""
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):  # x: [..., C]
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (c,))
        b = self.param("bias", nn.initializers.zeros, (c,))
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        x = (x - mu) / jnp.sqrt(var + self.eps)
        return x * w + b


class MLPBlock(nn.Module):
    mlp_dim: int
    act: Callable = gelu

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = nn.Dense(self.mlp_dim, name="lin1")(x)
        x = self.act(x)
        x = nn.Dense(d, name="lin2")(x)
        return x


class MLPHead(nn.Module):
    """Plain MLP head used by the mask decoder hypernetworks / iou head."""
    hidden_dim: int
    output_dim: int
    num_layers: int
    sigmoid_output: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        if self.sigmoid_output:
            x = nn.sigmoid(x)
        return x
