"""SANeRF-HQ field network: hash-grid radiance field + proposal nets +
optional SAM-feature field and object-mask field.

Reference semantics: nerf/network.py:85-231.
  - main grid: 16 levels x 2 ch, 2^19 table, base 16, desired res
    2048 * grid_bound; grid_mlp MLP(32 -> 1+15, hidden 64, 3 layers, no bias)
  - view branch: SH degree 4 (16 dims); view_mlp MLP(15+16 -> 3, hidden 32,
    3 layers, no bias) applied AFTER compositing (deferred color,
    nerf/renderer.py:338-340)
  - two proposal nets: hash grid 5 levels x 2 ch, 2^17, desired res 128/256
    + MLP(10 -> 1, hidden 16, 2 layers, no bias)
  - SAM field: s_grid 16 levels x 8 ch desired res 512; samvit_mlp =
    SkipConnMLP(128+15+16+4 -> 256, hidden 256, 5 layers, skip=[2]) +
    LayerNorm (nerf/network.py:102-116)
  - mask field: m_grid like s_grid; mask_mlp = SkipConnMLP(128+15 -> n_inst,
    hidden 256, 3 layers, no bias) (nerf/network.py:118-128)

Note: the reference's `sam_use_view_direction=False` path feeds a 147-dim
feature into a 163-dim MLP (nerf/network.py:105-116 vs renderer.py:366-367 —
a latent crash; every shipped script passes --sam_use_view_direction).  Here
the MLP input dim is derived from the actual feature composition, so both
paths work.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import (
    HashGridSpec,
    hash_encode,
    sh_encode,
    trunc_exp,
)
from ..ops.hashgrid import init_hash_table
from .mlp import MLP, SkipConnMLP


GEOM_FEAT_DIM = 15
SH_DEGREE = 4
SH_DIM = SH_DEGREE * SH_DEGREE
SAM_OUTPUT_DIM = 256


def main_grid_spec(grid_bound: float) -> HashGridSpec:
    return HashGridSpec(
        input_dim=3, num_levels=16, level_dim=2, base_resolution=16,
        log2_hashmap_size=19, desired_resolution=int(2048 * grid_bound),
    )


def feature_grid_spec() -> HashGridSpec:
    """s_grid / m_grid config (nerf/network.py:102,120)."""
    return HashGridSpec(
        input_dim=3, num_levels=16, level_dim=8, base_resolution=16,
        log2_hashmap_size=19, desired_resolution=512,
    )


def lightweight_mask_grid_spec() -> HashGridSpec:
    return HashGridSpec(
        input_dim=3, num_levels=16, level_dim=2, base_resolution=16,
        log2_hashmap_size=10, desired_resolution=256,
    )


def prop_grid_spec(desired_resolution: int) -> HashGridSpec:
    return HashGridSpec(
        input_dim=3, num_levels=5, level_dim=2, base_resolution=16,
        log2_hashmap_size=17, desired_resolution=desired_resolution,
    )


def active_reg_grid(model, stage: str):
    """Resolve which hash table TV/WD regularization applies to for the
    given stage ('rgb' | 'sam' | 'mask'), mirroring the reference dispatch
    apply_total_variation / apply_weight_decay (nerf/network.py:189-203):
    with_sam -> s_grid, with_mask -> m_grid, else the main grid.

    Returns (param_name, HashGridSpec) or None when the model has no hash
    table for that stage (e.g. the MLP flagship field)."""
    import dataclasses as _dc

    if not isinstance(model, SANeRFField):
        return None
    pack = (lambda s: _dc.replace(s, packed=True)) if model.packed else (lambda s: s)
    if stage == "sam":
        if not model.with_sam:
            return None
        return "s_grid", pack(model.feat_spec or feature_grid_spec())
    if stage == "mask":
        if not model.with_mask:
            return None
        if model.mask_mlp_type == "default":
            return "m_grid", pack(model.feat_spec or feature_grid_spec())
        return "m_grid", lightweight_mask_grid_spec()
    return "grid", pack(model.main_spec or main_grid_spec(model.grid_bound))


class SANeRFField(nn.Module):
    """All fields & MLPs; pure function of (params, coords)."""

    grid_bound: float = 2.0
    with_sam: bool = False
    with_mask: bool = False
    mask_mlp_type: str = "default"
    n_inst: int = 2
    sam_use_view_direction: bool = False
    # optional spec overrides (testing / ablation); None = reference config
    main_spec: Optional[HashGridSpec] = None
    feat_spec: Optional[HashGridSpec] = None
    prop_spec_0: Optional[HashGridSpec] = None
    prop_spec_1: Optional[HashGridSpec] = None
    # TPU-native packed-corner mode: one row gather per (point, level)
    # instead of 2^D — ~8x faster lookups at 8x parameter memory (see
    # ops/hashgrid.py); a different function class than strict NGP parity
    packed: bool = False

    def _maybe_pack(self, spec):
        import dataclasses as _dc

        return _dc.replace(spec, packed=True) if self.packed else spec

    def setup(self):
        self.grid_spec = self._maybe_pack(
            self.main_spec or main_grid_spec(self.grid_bound))
        self.grid = self.param(
            "grid", lambda k: init_hash_table(k, self.grid_spec)
        )
        self.grid_mlp = MLP(1 + GEOM_FEAT_DIM, 64, 3, use_bias=False)
        self.view_mlp = MLP(3, 32, 3, use_bias=False)

        self.prop_specs = (
            self._maybe_pack(self.prop_spec_0 or prop_grid_spec(128)),
            self._maybe_pack(self.prop_spec_1 or prop_grid_spec(256)),
        )
        self.prop_grid_0 = self.param(
            "prop_grid_0", lambda k: init_hash_table(k, self.prop_specs[0])
        )
        self.prop_grid_1 = self.param(
            "prop_grid_1", lambda k: init_hash_table(k, self.prop_specs[1])
        )
        self.prop_mlp_0 = MLP(1, 16, 2, use_bias=False)
        self.prop_mlp_1 = MLP(1, 16, 2, use_bias=False)

        if self.with_sam:
            self.s_spec = self._maybe_pack(self.feat_spec or feature_grid_spec())
            self.s_grid_table = self.param(
                "s_grid", lambda k: init_hash_table(k, self.s_spec)
            )
            self.samvit_mlp = SkipConnMLP(
                SAM_OUTPUT_DIM, SAM_OUTPUT_DIM, 5, skip_layers=(2,), use_bias=True
            )
            self.samvit_norm = nn.LayerNorm(epsilon=1e-5)

        if self.with_mask:
            if self.mask_mlp_type == "default":
                self.m_spec = self._maybe_pack(
                    self.feat_spec or feature_grid_spec())
                self.m_grid_table = self.param(
                    "m_grid", lambda k: init_hash_table(k, self.m_spec)
                )
                self.mask_mlp = SkipConnMLP(
                    self.n_inst, 256, 3, skip_layers=(), use_bias=False
                )
            elif self.mask_mlp_type == "lightweight_mask":
                self.m_spec = lightweight_mask_grid_spec()
                self.m_grid_table = self.param(
                    "m_grid", lambda k: init_hash_table(k, self.m_spec)
                )
                self.mask_mlp = MLP(self.n_inst, 64, 3, use_bias=False)
            else:
                raise ValueError(self.mask_mlp_type)

    # -- field queries ---------------------------------------------------
    def common_forward(self, x):
        """x: [..., 3] contracted coords in [-grid_bound, grid_bound].
        Returns (sigma [...], geo_feat [..., 15], grid_output [..., 32]).
        Reference: nerf/network.py:146-154."""
        grid_output = hash_encode(self.grid, x, self.grid_spec, bound=self.grid_bound)
        f = self.grid_mlp(grid_output)
        sigma = trunc_exp(f[..., 0])
        feat = f[..., 1:]
        return sigma, feat, grid_output

    def density(self, x, proposal: int = -1):
        """Density-only query; proposal in {0, 1} routes to the proposal
        nets (nerf/network.py:173-186)."""
        if proposal == 0:
            h = hash_encode(self.prop_grid_0, x, self.prop_specs[0], bound=self.grid_bound)
            return trunc_exp(self.prop_mlp_0(h)[..., 0])
        if proposal == 1:
            h = hash_encode(self.prop_grid_1, x, self.prop_specs[1], bound=self.grid_bound)
            return trunc_exp(self.prop_mlp_1(h)[..., 0])
        sigma, _, _ = self.common_forward(x)
        return sigma

    def forward_color(self, x, d):
        """Full query at the final level. d must be normalized.
        color is the *pre-MLP* per-sample feature cat(geo_feat, SH(d))
        (nerf/network.py:156-171); the view MLP runs after compositing."""
        sigma, feat, grid_output = self.common_forward(x)
        d_enc = sh_encode(d, SH_DEGREE)
        color = jnp.concatenate([feat, d_enc], axis=-1)
        return sigma, feat, color, grid_output

    def apply_view_mlp(self, f_image):
        """Deferred color head (sigmoid applied by the renderer)."""
        return self.view_mlp(f_image)

    def sam_features(self, x):
        return hash_encode(self.s_grid_table, x, self.s_spec, bound=self.grid_bound)

    def apply_samvit_mlp(self, f):
        return self.samvit_norm(self.samvit_mlp(f))

    def mask_features(self, x):
        return hash_encode(self.m_grid_table, x, self.m_spec, bound=self.grid_bound)

    def apply_mask_mlp(self, m):
        return self.mask_mlp(m)

    def __call__(self, x, d):
        """Convenience entry (init / single query)."""
        sigma, feat, color, grid_output = self.forward_color(x, d)
        out = {"sigma": sigma, "geo_feat": feat, "color": color,
               "grid_output": grid_output}
        # touch all submodules so init creates every param collection
        _ = self.density(x, proposal=0)
        _ = self.density(x, proposal=1)
        _ = self.apply_view_mlp(
            jnp.zeros((*x.shape[:-1], GEOM_FEAT_DIM + SH_DIM), x.dtype)
        )
        if self.with_sam:
            s = self.sam_features(x)
            in_dim = (
                s.shape[-1] + GEOM_FEAT_DIM + SH_DIM + 4
                if self.sam_use_view_direction
                else s.shape[-1] + GEOM_FEAT_DIM + 4
            )
            _ = self.apply_samvit_mlp(jnp.zeros((*x.shape[:-1], in_dim), x.dtype))
        if self.with_mask:
            m = self.mask_features(x)
            if self.mask_mlp_type == "default":
                _ = self.apply_mask_mlp(
                    jnp.concatenate([m, feat], axis=-1)
                )
            else:
                _ = self.apply_mask_mlp(
                    jnp.concatenate([m, color], axis=-1)
                )
        return out
