"""Tiny MLP building blocks (flax.linen).

Reference semantics: nerf/network.py:9-66.
  - MLP: Linear stack with ReLU between layers (no activation on the last).
  - SkipConnMLP: leaky-ReLU stack; at each skip layer the original input is
    concatenated back in.
Initialization matches torch nn.Linear defaults (kaiming_uniform(a=sqrt(5)) ==
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both kernel and bias) so training
dynamics match the reference.
"""
from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

# U(-sqrt(3*scale/fan_in), +sqrt(3*scale/fan_in)); scale=1/3 -> 1/sqrt(fan_in)
torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _torch_bias_init(fan_in: int):
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        import jax
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class MLP(nn.Module):
    dim_out: int
    dim_hidden: int
    num_layers: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        for l in range(self.num_layers):
            fout = self.dim_out if l == self.num_layers - 1 else self.dim_hidden
            x = nn.Dense(
                fout,
                use_bias=self.use_bias,
                kernel_init=torch_kernel_init,
                bias_init=_torch_bias_init(x.shape[-1]),
            )(x)
            if l != self.num_layers - 1:
                x = nn.relu(x)
        return x


class SkipConnMLP(nn.Module):
    dim_out: int
    dim_hidden: int
    num_layers: int
    skip_layers: Tuple[int, ...] = ()
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        x_in = x
        for l in range(self.num_layers):
            if l in self.skip_layers:
                x = jnp.concatenate([x, x_in], axis=-1)
            fout = self.dim_out if l == self.num_layers - 1 else self.dim_hidden
            x = nn.Dense(
                fout,
                use_bias=self.use_bias,
                kernel_init=torch_kernel_init,
                bias_init=_torch_bias_init(x.shape[-1]),
            )(x)
            if l != self.num_layers - 1:
                x = nn.leaky_relu(x, negative_slope=0.01)
        return x
