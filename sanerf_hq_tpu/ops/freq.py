"""Frequency (positional) encoding: [x, sin(2^k x), cos(2^k x)].

Reference semantics: freqencoder/src/freqencoder.cu:30 and the pure-torch
twin encoding.py:6-44 — per input channel emit the raw value followed by
(sin, cos) pairs at octave frequencies 2^0..2^(deg-1).
Output dim = input_dim * (1 + 2 * degree).
"""
import jax.numpy as jnp


def freq_encode(x, degree: int = 4):
    """x: [..., D]. Returns [..., D * (1 + 2*degree)], channel-major like the
    reference: for each input channel d -> [x_d, sin(2^0 x_d), cos(2^0 x_d),
    sin(2^1 x_d), cos(2^1 x_d), ...]."""
    parts = [x[..., :, None]]  # [..., D, 1]
    for k in range(degree):
        f = (2.0 ** k) * x
        parts.append(jnp.sin(f)[..., :, None])
        parts.append(jnp.cos(f)[..., :, None])
    out = jnp.concatenate(parts, axis=-1)  # [..., D, 1+2*deg]
    return out.reshape(*x.shape[:-1], -1)


def freq_output_dim(input_dim: int, degree: int) -> int:
    return input_dim * (1 + 2 * degree)
