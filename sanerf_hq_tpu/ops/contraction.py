"""MERF / mip-NeRF-360 infinity-norm scene contraction.

Reference semantics: nerf/renderer.py:60-81.  Points with inf-norm magnitude
below 1 pass through; outside, every coordinate is divided by the magnitude
except the arg-max coordinate which maps to sign(x) * (2 - 1/mag), keeping the
contracted domain inside [-2, 2]^3.
"""
import jax.numpy as jnp


def contract(x):
    """x: [..., C] -> contracted z: [..., C]."""
    ax = jnp.abs(x)
    mag = jnp.max(ax, axis=-1, keepdims=True)
    is_max = ax == mag  # ties (measure-zero) apply the max-scale to all tied
    # coords; the reference scatters to a single argmax index.
    inv = 1.0 / jnp.maximum(mag, 1e-38)
    scale = jnp.where(is_max, (2.0 - inv) * inv, inv)
    return jnp.where(mag < 1.0, x, x * scale)


def uncontract(z):
    """Inverse of contract. Reference: nerf/renderer.py:72-81."""
    az = jnp.abs(z)
    mag = jnp.max(az, axis=-1, keepdims=True)
    is_max = az == mag
    scale_other = 1.0 / jnp.maximum(2.0 - mag, 1e-8)
    scale_max = 1.0 / jnp.maximum(2.0 * mag - mag * mag, 1e-8)
    scale = jnp.where(is_max, scale_max, scale_other)
    return jnp.where(mag < 1.0, z, z * scale)
