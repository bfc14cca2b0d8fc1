"""Truncated-gradient exponential.

Reference semantics: activation.py:5-18 — forward is exp(x) in float32,
backward is g * exp(clamp(x, -15, 15)) so huge densities cannot blow up the
gradient.  Implemented as a jax.custom_vjp so it composes with jit/pjit/remat.
"""
import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(x.astype(jnp.float32))


def _trunc_exp_fwd(x):
    x = x.astype(jnp.float32)
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


@jax.custom_vjp
def safe_trunc_exp(x):
    """Forward-clamped variant for dense-MLP fields: exp with the input
    clipped to 15 so sigma can never overflow to inf (exp dynamics learn
    geometry far faster than softplus, but raw MLP outputs can exceed 88
    early in training and inf * 0 interval widths produce NaNs).  Backward
    matches trunc_exp."""
    return jnp.exp(jnp.clip(x.astype(jnp.float32), -30.0, 15.0))


def _safe_fwd(x):
    x = x.astype(jnp.float32)
    return jnp.exp(jnp.clip(x, -30.0, 15.0)), x


def _safe_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


safe_trunc_exp.defvjp(_safe_fwd, _safe_bwd)
