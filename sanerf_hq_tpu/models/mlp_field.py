"""TPU-native flagship field: frequency-encoded MLP radiance field.

WHY THIS EXISTS (measured on TPU v5e, see docs/PERF.md): XLA random gather
runs at ~177M lookups/s and scatter-add at ~23M/s, while the MXU delivers
~100+ TFLOP/s.  An Instant-NGP hash grid needs 128 gathers per sample —
its speed-of-light on this chip is ~0.015 Mrays/s regardless of kernel
engineering, because random HBM access is scalar-issue bound.  The
TPU-idiomatic field channels all work into matmuls: frequency encoding +
dense MLPs (the mip-NeRF/jaxnerf design, which Google ran on TPU for
exactly this reason).  This field implements the SAME interface as
SANeRFField so the renderer, trainer, and all three stages are
representation-agnostic:

  - field_type='hashgrid' -> SANeRFField  (reference parity w/ CUDA
    gridencoder semantics, gather-bound on TPU)
  - field_type='mlp'      -> MLPField     (flagship: MXU-bound,
    north-star throughput)

Architecture: deferred color exactly like the reference renderer
(nerf/renderer.py:338-340) — per-sample features are composited, THEN the
tiny view MLP runs per ray.  Proposal densities come from small
freq-encoded MLPs instead of hash grids (mip-NeRF 360's proposal-MLP
design) — pure matmul.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import HashGridSpec, hash_encode, sh_encode, trunc_exp, freq_encode
from ..ops.hashgrid import init_hash_table
from .mlp import MLP, SkipConnMLP, torch_kernel_init
from .fields import (
    GEOM_FEAT_DIM,
    SH_DEGREE,
    SH_DIM,
    SAM_OUTPUT_DIM,
    feature_grid_spec,
    lightweight_mask_grid_spec,
)


class FreqMLP(nn.Module):
    """Frequency-encode -> dense trunk (bias-free, bf16 compute, fp32
    params/outputs).  On TPU the whole stack runs as ONE fused Pallas
    kernel (ops/fused_mlp.py) — activations never leave VMEM; off-TPU it
    falls back to the identical jnp reference."""
    dim_out: int
    dim_hidden: int = 256
    num_layers: int = 4
    freq_degree: int = 10
    skip_layer: int = -1
    extra_dim: int = 0  # width of optional features appended to freq(x)
    # fused Pallas path (transposed layout, points on lanes): measured
    # 2.8-4.6x faster than unfused XLA for both narrow and wide networks
    # (docs/PERF.md); opt-out per instance for debugging
    fused: bool = True

    @nn.compact
    def __call__(self, x, extra=None):
        from ..ops.fused_mlp import fused_freq_mlp
        from ..ops.freq import freq_output_dim

        D = x.shape[-1]
        in_dim = freq_output_dim(D, self.freq_degree) + self.extra_dim
        ws = []
        fin = in_dim
        for l in range(self.num_layers):
            if l == self.skip_layer:
                fin = fin + in_dim
            fout = self.dim_out if l == self.num_layers - 1 else self.dim_hidden
            ws.append(self.param(f"w{l}", torch_kernel_init, (fin, fout)))
            fin = fout
        if self.extra_dim:
            # extra features ride the unfused path for now (the fused
            # kernel signature is freq-only); layer-0 weights absorb the
            # [freq | extra] layout
            from ..ops.fused_mlp import _reference_forward_with_extra

            return _reference_forward_with_extra(
                x, extra, ws, self.freq_degree, self.skip_layer)
        use_pallas = None if self.fused else False
        return fused_freq_mlp(x, ws, self.freq_degree, self.skip_layer,
                              use_pallas=use_pallas)


class MLPField(nn.Module):
    """Drop-in alternative backbone to SANeRFField (same method surface)."""

    grid_bound: float = 2.0
    with_sam: bool = False
    with_mask: bool = False
    mask_mlp_type: str = "default"
    n_inst: int = 2
    sam_use_view_direction: bool = False
    hidden: int = 256
    num_layers: int = 4
    freq_degree: int = 10
    prop_hidden: int = 64
    prop_layers: int = 3
    prop_freq_degree: int = 6
    # shifts initial density to exp(density_bias): at 0 the init field is
    # near-opaque (optical depth to the far plane ~ bound), transmittance
    # dies before the scene and training falls into a near-plane local
    # optimum on textured scenes; a negative bias keeps far samples alive
    density_bias: float = 0.0
    # CP-factorized spatial features (TensoRF-style, arXiv 2203.09517):
    # per-axis basis vectors contracted against linear-interp one-hots.
    # On TPU this is MXU matmul work, not hash gathers — the spatial
    # capacity the pure freq-MLP lacks on textured scenes at hash-grid
    # speed.  cp_rank 0 disables (plain freq-MLP flagship).
    cp_rank: int = 0
    cp_res: int = 256
    feat_spec: Optional[HashGridSpec] = None
    # Feature-container representation for s_grid / m_grid.  The reference
    # trains hash-grid feature volumes (nerf/network.py:102,120); on TPU
    # those are the exact gather/scatter-bound regime docs/PERF.md measures
    # at ~100x off speed-of-light (forward ~177M gathers/s, backward ~23M
    # scatter-adds/s — stage-2 distill at 64x64 feature rays needs ~117M of
    # EACH per step).  'cp' re-designs them as rank-R CP volumes with a
    # linear projection to the reference feature width: pure MXU matmuls
    # forward AND backward, same renderer/MLP wiring downstream.
    # 'hashgrid' keeps the reference-like volume for parity studies.
    feat_rep: str = "cp"
    feat_rank: int = 128
    feat_res: int = 256

    def setup(self):
        self.trunk = FreqMLP(
            1 + GEOM_FEAT_DIM, self.hidden, self.num_layers,
            self.freq_degree, skip_layer=self.num_layers // 2, fused=True,
            extra_dim=self.cp_rank,
        )
        if self.cp_rank > 0:
            init = nn.initializers.normal(0.3)
            self.cp_basis = [
                self.param(f"cp_{a}", init, (self.cp_res, self.cp_rank))
                for a in "xyz"
            ]
        self.view_mlp = MLP(3, 32, 3, use_bias=False)
        self.prop_mlp_0 = FreqMLP(1, self.prop_hidden, self.prop_layers,
                                  self.prop_freq_degree, fused=True)
        self.prop_mlp_1 = FreqMLP(1, self.prop_hidden, self.prop_layers,
                                  self.prop_freq_degree, fused=True)

        # SAM / mask feature containers: CP volumes by default (matmul-
        # bound; see feat_rep docstring above) or reference-like hash
        # grids.  Either way the downstream samvit/mask MLPs see the same
        # feature width, so the renderer and stage drivers are agnostic.
        if self.with_sam:
            self.s_spec = self.feat_spec or feature_grid_spec()
            if self.feat_rep == "cp":
                self._make_cp_feature("s", self.s_spec.output_dim)
            else:
                self.s_grid_table = self.param(
                    "s_grid", lambda k: init_hash_table(k, self.s_spec)
                )
            self.samvit_mlp = SkipConnMLP(
                SAM_OUTPUT_DIM, SAM_OUTPUT_DIM, 5, skip_layers=(2,), use_bias=True
            )
            self.samvit_norm = nn.LayerNorm(epsilon=1e-5)

        if self.with_mask:
            if self.mask_mlp_type == "default":
                self.m_spec = self.feat_spec or feature_grid_spec()
                self.mask_mlp = SkipConnMLP(
                    self.n_inst, 256, 3, skip_layers=(), use_bias=False
                )
            else:
                self.m_spec = lightweight_mask_grid_spec()
                self.mask_mlp = MLP(self.n_inst, 64, 3, use_bias=False)
            if self.feat_rep == "cp":
                self._make_cp_feature("m", self.m_spec.output_dim)
            else:
                self.m_grid_table = self.param(
                    "m_grid", lambda k: init_hash_table(k, self.m_spec)
                )

    def _make_cp_feature(self, tag: str, channels: int):
        """Rank-R CP feature volume: 3 per-axis bases [feat_res, R] + a
        [R, channels] projection.  Names cp_{tag}_* so mlp_field_lr_scales
        keeps them at the table lr like the reference's grid embeddings."""
        init = nn.initializers.normal(0.3)
        for a in "xyz":
            setattr(self, f"cp_{tag}_{a}", self.param(
                f"cp_{tag}_{a}", init, (self.feat_res, self.feat_rank)))
        setattr(self, f"cp_{tag}_proj", self.param(
            f"cp_{tag}_proj", nn.initializers.normal(0.1),
            (self.feat_rank, channels)))

    def _cp_feature_lookup(self, x, tag: str):
        """World coords -> [..., channels] CP features (one-hot-interp
        matmuls; see cp_features for the MXU rationale)."""
        xn = self._norm(x)
        S = self.feat_res
        p = jnp.clip((xn + 1.0) * 0.5, 0.0, 1.0) * (S - 1)
        i0 = jnp.clip(jnp.floor(p).astype(jnp.int32), 0, S - 2)
        f = p - i0
        iota = jnp.arange(S, dtype=jnp.int32)
        g = None
        for ai, a in enumerate("xyz"):
            ia = i0[..., ai, None]
            fa = f[..., ai, None]
            W = (jnp.where(iota == ia, 1.0 - fa, 0.0)
                 + jnp.where(iota == ia + 1, fa, 0.0))
            La = jnp.dot(W, getattr(self, f"cp_{tag}_{a}"),
                         preferred_element_type=jnp.float32)
            g = La if g is None else g * La
        return jnp.dot(g, getattr(self, f"cp_{tag}_proj"),
                       preferred_element_type=jnp.float32)

    # scatter-free stage-1 backbone (matmul-only backward): the trainer's
    # device-side epoch scan may run uncapped (hash-grid scans >32 steps
    # have crashed the TPU worker; this field never has)
    field_kind = "mlp"

    def _norm(self, x):
        # contracted coords in [-grid_bound, grid_bound] -> [-1, 1]
        return x / self.grid_bound

    def _density_act(self, raw):
        # forward-clamped exp density: exp dynamics learn geometry fast
        # (softplus stalls in the white-background local optimum — see
        # docs/PERF.md quality notes) while the clamp prevents the inf
        # sigmas that NaN'd the unclamped trunc_exp on dense-MLP outputs.
        from ..ops.trunc_exp import safe_trunc_exp

        return safe_trunc_exp(raw + self.density_bias)

    def cp_features(self, xn):
        """xn: [..., 3] in [-1, 1].  Linear-interp CP line features,
        product over axes -> [..., cp_rank].

        Contraction is expressed as interp-one-hot matmuls on the MXU
        ([N, S] two-nonzero rows @ [S, rank] basis): forward avoids the
        ~177M row/s gather ceiling and, critically, backward turns the
        basis gradient into W^T @ g instead of a ~23M update/s
        scatter_add (docs/PERF.md primitive rates) — the take-based
        version trained at 16 steps/s vs 285 for cp_rank=0."""
        S = self.cp_res
        p = jnp.clip((xn + 1.0) * 0.5, 0.0, 1.0) * (S - 1)
        i0 = jnp.clip(jnp.floor(p).astype(jnp.int32), 0, S - 2)
        f = p - i0
        iota = jnp.arange(S, dtype=jnp.int32)
        g = None
        for a in range(3):
            ia = i0[..., a, None]
            fa = f[..., a, None]
            W = (jnp.where(iota == ia, 1.0 - fa, 0.0)
                 + jnp.where(iota == ia + 1, fa, 0.0))
            La = jnp.dot(W, self.cp_basis[a],
                         preferred_element_type=jnp.float32)
            g = La if g is None else g * La
        return g

    def common_forward(self, x):
        xn = self._norm(x)
        extra = self.cp_features(xn) if self.cp_rank > 0 else None
        f = self.trunk(xn, extra=extra)
        sigma = self._density_act(f[..., 0])
        feat = f[..., 1:]
        return sigma, feat, f

    def density(self, x, proposal: int = -1):
        if proposal == 0:
            return self._density_act(self.prop_mlp_0(self._norm(x))[..., 0])
        if proposal == 1:
            return self._density_act(self.prop_mlp_1(self._norm(x))[..., 0])
        sigma, _, _ = self.common_forward(x)
        return sigma

    def forward_color(self, x, d):
        sigma, feat, raw = self.common_forward(x)
        d_enc = sh_encode(d, SH_DEGREE)
        color = jnp.concatenate([feat, d_enc], axis=-1)
        return sigma, feat, color, raw

    def apply_view_mlp(self, f_image):
        return self.view_mlp(f_image)

    # inference megakernel support (ops/render_level_pallas.py); the CP
    # contraction runs in-kernel as iota-one-hot matmuls on the MXU
    @property
    def supports_fused_final(self):
        return True

    def fused_prop_weights(self, rays_o, rays_d, real_bins, proposal: int,
                           opaque_last: bool = True):
        from ..ops.render_level_pallas import fused_prop_level

        mlp = self.prop_mlp_0 if proposal == 0 else self.prop_mlp_1
        ws = [mlp.variables["params"][f"w{l}"]
              for l in range(self.prop_layers)]
        return fused_prop_level(rays_o, rays_d, real_bins, ws,
                                self.prop_freq_degree, self.grid_bound,
                                opaque_last=opaque_last,
                                density_bias=self.density_bias)

    def fused_prop_next_bins(self, rays_o, rays_d, real_bins, s_bins, u,
                             proposal: int, opaque_last: bool = True,
                             frozen: bool = False):
        """Proposal level + inverse-CDF resampling fused in one kernel
        (inference): returns the NEXT level's s-space bin edges [N, Q]
        without the per-sample weights ever leaving VMEM.  frozen=True
        stop-gradients the MLP weights so the kernel (which has no VJP)
        is safe under jax.grad — used by the frozen-backbone stage-2/3
        side-output path."""
        from ..ops.render_level_pallas import fused_prop_level_sample

        mlp = self.prop_mlp_0 if proposal == 0 else self.prop_mlp_1
        ws = [mlp.variables["params"][f"w{l}"]
              for l in range(self.prop_layers)]
        if frozen:
            ws = [jax.lax.stop_gradient(w) for w in ws]
        return fused_prop_level_sample(
            rays_o, rays_d, real_bins, s_bins, u, ws,
            self.prop_freq_degree, self.grid_bound,
            opaque_last=opaque_last, density_bias=self.density_bias)

    def fused_final_render(self, rays_o, rays_d, real_bins,
                           opaque_last: bool = True):
        """Final render level fused into one Pallas kernel (geometry +
        trunk + compositing in VMEM).  Returns (f_image [N, 31], depth [N],
        weights_sum [N])."""
        from ..ops.render_level_pallas import fused_final_level

        d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        sh = sh_encode(d, SH_DEGREE)  # [N, 16] per-ray
        ws = [self.trunk.variables["params"][f"w{l}"]
              for l in range(self.num_layers)]
        cps = list(self.cp_basis) if self.cp_rank > 0 else []
        return fused_final_level(
            rays_o, rays_d, real_bins, sh, ws, self.freq_degree,
            skip_layer=self.num_layers // 2, grid_bound=self.grid_bound,
            opaque_last=opaque_last, density_bias=self.density_bias,
            cps=cps, cp_res=self.cp_res,
        )

    def fused_final_render_frozen(self, rays_o, rays_d, real_bins,
                                  opaque_last: bool = True,
                                  need_geo: bool = False):
        """Frozen-backbone final level for return_feats/return_mask: the
        whole backbone render (trunk + CP + compositing) in one inference
        kernel under stop_gradient — the stage-2/3 freeze mask never lets
        gradient reach it, so its backward is dead weight the unfused path
        was paying for.  Returns (f_image [N, 31], depth [N], weights_sum
        [N], weights [N, T], geo [N, T, 15] | None)."""
        from ..ops.render_level_pallas import fused_final_level_frozen

        d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        sh = sh_encode(d, SH_DEGREE)
        ws = [self.trunk.variables["params"][f"w{l}"]
              for l in range(self.num_layers)]
        cps = list(self.cp_basis) if self.cp_rank > 0 else []
        return fused_final_level_frozen(
            rays_o, rays_d, real_bins, sh, ws, self.freq_degree,
            skip_layer=self.num_layers // 2, grid_bound=self.grid_bound,
            opaque_last=opaque_last, density_bias=self.density_bias,
            cps=cps, cp_res=self.cp_res, need_geo=need_geo)

    # training megakernels (custom-VJP, ops/render_level_pallas.py)
    def fused_prop_weights_train(self, rays_o, rays_d, real_bins,
                                 proposal: int, opaque_last: bool = True):
        from ..ops.render_level_pallas import prop_level_train

        mlp = self.prop_mlp_0 if proposal == 0 else self.prop_mlp_1
        ws = [mlp.variables["params"][f"w{l}"]
              for l in range(self.prop_layers)]
        return prop_level_train(
            (self.prop_freq_degree, self.grid_bound, opaque_last,
             self.density_bias),
            rays_o, rays_d, real_bins, *ws)

    def fused_prop_weights_train_sample(self, rays_o, rays_d, real_bins,
                                        s_bins, u, proposal: int,
                                        opaque_last: bool = True):
        """Training twin of fused_prop_next_bins: returns (weights [N, T]
        for the interlevel loss, next s-space bins [N, Q] detached)."""
        from ..ops.render_level_pallas import prop_level_train_sample

        mlp = self.prop_mlp_0 if proposal == 0 else self.prop_mlp_1
        ws = [mlp.variables["params"][f"w{l}"]
              for l in range(self.prop_layers)]
        return prop_level_train_sample(
            (self.prop_freq_degree, self.grid_bound, opaque_last,
             self.density_bias),
            rays_o, rays_d, real_bins, s_bins, u, *ws)

    def fused_final_render_train(self, rays_o, rays_d, real_bins,
                                 opaque_last: bool = True):
        """Differentiable fused final level.  Returns (f_image [N, 31],
        depth [N], weights_sum [N], weights [N, T])."""
        from ..ops.render_level_pallas import final_level_train

        d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        sh = sh_encode(d, SH_DEGREE)
        ws = [self.trunk.variables["params"][f"w{l}"]
              for l in range(self.num_layers)]
        cps = list(self.cp_basis) if self.cp_rank > 0 else []
        return final_level_train(
            (self.freq_degree, self.num_layers // 2, self.grid_bound,
             opaque_last, self.density_bias, self.cp_rank, self.cp_res),
            rays_o, rays_d, real_bins, sh, *ws, *cps)

    def sam_features(self, x):
        if self.feat_rep == "cp":
            return self._cp_feature_lookup(x, "s")
        return hash_encode(self.s_grid_table, x, self.s_spec, bound=self.grid_bound)

    def apply_samvit_mlp(self, f):
        return self.samvit_norm(self.samvit_mlp(f))

    def mask_features(self, x):
        if self.feat_rep == "cp":
            return self._cp_feature_lookup(x, "m")
        return hash_encode(self.m_grid_table, x, self.m_spec, bound=self.grid_bound)

    def apply_mask_mlp(self, m):
        return self.mask_mlp(m)

    def __call__(self, x, d):
        sigma, feat, color, raw = self.forward_color(x, d)
        _ = self.density(x, proposal=0)
        _ = self.density(x, proposal=1)
        _ = self.apply_view_mlp(
            jnp.zeros((*x.shape[:-1], GEOM_FEAT_DIM + SH_DIM), jnp.float32)
        )
        if self.with_sam:
            s = self.sam_features(x)
            in_dim = (
                s.shape[-1] + GEOM_FEAT_DIM + SH_DIM + 4
                if self.sam_use_view_direction
                else s.shape[-1] + GEOM_FEAT_DIM + 4
            )
            _ = self.apply_samvit_mlp(jnp.zeros((*x.shape[:-1], in_dim)))
        if self.with_mask:
            m = self.mask_features(x)
            if self.mask_mlp_type == "default":
                _ = self.apply_mask_mlp(jnp.concatenate([m, feat], axis=-1))
            else:
                _ = self.apply_mask_mlp(jnp.concatenate([m, color], axis=-1))
        return {"sigma": sigma, "geo_feat": feat, "color": color,
                "grid_output": raw}


def make_field(field_type: str = "hashgrid", **kw):
    """Factory: 'hashgrid' (reference parity) | 'hashgrid_packed' (TPU-
    accelerated NGP variant, 1 gather/level) | 'mlp' (TPU flagship)."""
    from .fields import SANeRFField

    if field_type in ("hashgrid", "hashgrid_packed"):
        allowed = {"grid_bound", "with_sam", "with_mask", "mask_mlp_type",
                   "n_inst", "sam_use_view_direction", "main_spec",
                   "feat_spec", "prop_spec_0", "prop_spec_1", "packed"}
        kw = dict(kw)
        if field_type == "hashgrid_packed":
            kw["packed"] = True
        return SANeRFField(**{k: v for k, v in kw.items() if k in allowed})
    if field_type == "mlp":
        allowed = {"grid_bound", "with_sam", "with_mask", "mask_mlp_type",
                   "n_inst", "sam_use_view_direction", "hidden", "num_layers",
                   "freq_degree", "prop_hidden", "prop_layers",
                   "prop_freq_degree", "density_bias", "cp_rank", "cp_res",
                   "feat_spec", "feat_rep", "feat_rank", "feat_res"}
        return MLPField(**{k: v for k, v in kw.items() if k in allowed})
    raise ValueError(f"unknown field_type {field_type}")
