"""Training state: params + optimizer + EMA + freeze mask.

Reference semantics:
  - Adam(eps=1e-15, default betas) (main.py:283)
  - LambdaLR lr * 0.1 ** min(step/iters, 1), stepped every iteration
    (main.py:298-299, scheduler_update_every_step=True)
  - EMA decay 0.95 over trainable params (nerf/trainer.py:139), updated once
    per epoch (nerf/trainer.py:1522).  torch_ema defaults to
    use_num_updates=True, so the effective decay ramps as
    min(decay, (1 + n) / (10 + n)) — 0.18 on the first epoch, 0.95 only
    after ~180 epochs.  Without the ramp, short runs (the reference's
    stage-3 is 200 iters ~ 10 epochs) evaluate against a nearly-initial
    EMA average.
  - stage hand-off: params loaded from init_ckpt are frozen by name
    membership (main.py:249-256) — here an explicit boolean freeze mask and
    optax.set_to_zero for the frozen subtree.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import flax
import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any
    ema_updates: jnp.ndarray
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    ema_decay: float = struct.field(pytree_node=False, default=0.95)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )

    def update_ema(self):
        # torch_ema num_updates ramp (torch_ema/ema.py update()): increments
        # first, so update k (1-based) uses min(decay, (1 + k) / (10 + k))
        n = self.ema_updates + 1
        d = jnp.minimum(self.ema_decay, (1.0 + n) / (10.0 + n))
        new_ema = jax.tree.map(
            lambda e, p: d * e + (1.0 - d) * p, self.ema_params, self.params
        )
        return self.replace(ema_params=new_ema, ema_updates=n)


def exp_decay_schedule(base_lr: float, total_iters: int) -> Callable:
    """lr(t) = base_lr * 0.1 ** min(t / total_iters, 1) (main.py:298-299)."""

    def schedule(step):
        frac = jnp.minimum(step / total_iters, 1.0)
        return base_lr * (0.1 ** frac)

    return schedule


def scale_updates_by_tree(scales) -> optax.GradientTransformation:
    """Per-leaf learning-rate multipliers (applied after Adam)."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        # under optax.multi_transform (freeze masks) frozen leaves arrive
        # as MaskedNode placeholders — pass them through untouched
        def mul(u, s):
            return u if isinstance(u, optax.MaskedNode) else u * s

        scaled = jax.tree.map(
            mul, updates, scales,
            is_leaf=lambda x: isinstance(x, optax.MaskedNode))
        return scaled, state

    return optax.GradientTransformation(init, update)


def make_optimizer(base_lr: float, total_iters: int,
                   freeze_mask: Optional[Any] = None,
                   lr_scales: Optional[Any] = None) -> optax.GradientTransformation:
    """Adam(eps=1e-15) with the reference's exponential decay.

    freeze_mask: pytree of bools matching params; True = frozen (gradient
    zeroed), mirroring requires_grad=False in main.py:249-256.
    lr_scales: optional pytree of per-leaf lr multipliers — the flagship
    MLP field needs ~20x lower lr on its dense kernels than the hash-table
    lr the reference schedule was tuned for (hash embeddings tolerate 1e-2;
    dense freq-MLPs saturate the deferred sigmoid color head into an
    all-background local optimum at that lr — measured in docs/PERF.md)."""
    tx = optax.adam(
        learning_rate=exp_decay_schedule(base_lr, total_iters),
        b1=0.9, b2=0.999, eps=1e-15,
    )
    if lr_scales is not None:
        tx = optax.chain(tx, scale_updates_by_tree(lr_scales))
    if freeze_mask is not None:
        labels = jax.tree.map(lambda f: "frozen" if f else "train", freeze_mask)
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, labels
        )
    return tx


def mlp_field_lr_scales(params, mlp_scale: float = 0.05):
    """lr-multiplier tree for MLPField: hash-table feature grids (s_grid /
    m_grid) keep the base lr, dense kernels get mlp_scale x."""
    import flax

    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))
    # feature tables (hash grids, CP bases) keep the base lr like the
    # reference's grid embeddings; only dense kernels get the reduced lr
    def is_table(k):
        return any(p in ("s_grid", "m_grid") or p.startswith("cp_")
                   for p in k)

    scales = {k: (1.0 if is_table(k) else mlp_scale) for k in flat}
    return flax.traverse_util.unflatten_dict(scales)


def create_train_state(params, base_lr: float, total_iters: int,
                       freeze_mask: Optional[Any] = None,
                       ema_decay: float = 0.95,
                       lr_scales: Optional[Any] = None) -> TrainState:
    tx = make_optimizer(base_lr, total_iters, freeze_mask, lr_scales)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=params,
        ema_updates=jnp.zeros((), jnp.int32),
        tx=tx,
        ema_decay=ema_decay,
    )


def freeze_mask_from_loaded(params, loaded_params) -> Any:
    """True (frozen) for every leaf whose path exists in loaded_params —
    the reference freezes exactly the params present in the stage-1
    checkpoint (main.py:249-256)."""
    flat_loaded = set(flax.traverse_util.flatten_dict(
        flax.core.unfreeze(loaded_params)).keys())
    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))
    mask = {k: (k in flat_loaded) for k in flat.keys()}
    return flax.traverse_util.unflatten_dict(mask)
