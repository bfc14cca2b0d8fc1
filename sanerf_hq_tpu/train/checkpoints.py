"""Checkpointing with the reference's latest/best/rolling-window semantics.

Reference: nerf/trainer.py:1685-1843 — rolling window max_keep_ckpt=2,
separate best checkpoint keyed on the eval metric (EMA weights copied in),
load supports full-state resume, model-only, and partial (strict=False)
loads for cross-stage hand-off.

Implemented on orbax-checkpoint; state is a pytree
{params, opt_state, ema_params, step, stats}.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, workspace: str, max_keep: int = 2):
        self.dir = os.path.abspath(os.path.join(workspace, "checkpoints"))
        os.makedirs(self.dir, exist_ok=True)
        self.max_keep = max_keep
        self._ckptr = ocp.StandardCheckpointer()

    # -- save ------------------------------------------------------------
    def save(self, step: int, state_tree: Any, best: bool = False):
        name = "best" if best else f"step_{step:08d}"
        path = os.path.join(self.dir, name)
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        self._ckptr.save(path, jax.device_get(state_tree))
        self._ckptr.wait_until_finished()
        if not best:
            self._prune()

    def _prune(self):
        ckpts = sorted(
            d for d in os.listdir(self.dir) if d.startswith("step_")
        )
        while len(ckpts) > self.max_keep:
            victim = ckpts.pop(0)
            import shutil

            shutil.rmtree(os.path.join(self.dir, victim))

    # -- load ------------------------------------------------------------
    def latest_path(self) -> Optional[str]:
        ckpts = sorted(
            d for d in os.listdir(self.dir) if d.startswith("step_")
        ) if os.path.isdir(self.dir) else []
        return os.path.join(self.dir, ckpts[-1]) if ckpts else None

    def best_path(self) -> Optional[str]:
        p = os.path.join(self.dir, "best")
        return p if os.path.exists(p) else None

    def restore(self, which: str = "latest", target: Any = None) -> Optional[Any]:
        """which: 'latest' | 'best' | explicit path."""
        if which == "latest":
            path = self.latest_path()
        elif which == "best":
            path = self.best_path()
        else:
            path = which
        if path is None or not os.path.exists(path):
            return None
        if target is not None:
            return self._ckptr.restore(path, target=jax.device_get(target))
        return self._ckptr.restore(path)


def partial_load(params: Any, loaded: Any):
    """strict=False-style partial load (cross-stage hand-off,
    nerf/trainer.py:1800-1805): copy leaves present in `loaded` into
    `params`, keep the rest.  Returns (merged_params, loaded_keys)."""
    import flax

    flat_p = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))
    flat_l = flax.traverse_util.flatten_dict(flax.core.unfreeze(loaded))
    loaded_keys = []
    for k, v in flat_l.items():
        if k in flat_p and np.shape(v) == np.shape(flat_p[k]):
            flat_p[k] = v
            loaded_keys.append(k)
    return flax.traverse_util.unflatten_dict(flat_p), loaded_keys
