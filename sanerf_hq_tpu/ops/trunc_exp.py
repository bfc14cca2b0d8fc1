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
