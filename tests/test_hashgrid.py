"""Hash-grid encoder tests vs an independent numpy oracle transcribing the
CUDA semantics documented in SURVEY.md §2.2 (gridencoder/src/gridencoder.cu)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sanerf_hq_tpu.ops import HashGridSpec, hash_encode, hash_encode_unit, init_hash_table
from sanerf_hq_tpu.ops.hashgrid import total_variation_loss, weight_decay_loss

PRIMES = np.array(
    [1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737],
    dtype=np.uint64,
)


def _oracle_level_meta(spec):
    meta, offset = [], 0
    for lvl in range(spec.num_levels):
        res = int(np.ceil(spec.base_resolution * spec.scale ** lvl))
        size = min(2 ** spec.log2_hashmap_size, res ** spec.input_dim)
        size = int(np.ceil(size / 8) * 8)
        meta.append((res, offset, size))
        offset += size
    return meta


def _oracle_index(corner, res, size, gridtype, D):
    stride, index = 1, 0
    for d in range(D):
        if stride > size:
            break
        index += int(corner[d]) * stride
        stride *= res
    if gridtype == "hash" and stride > size:
        h = np.uint64(0)
        for d in range(D):
            h ^= (np.uint64(corner[d]) * PRIMES[d]) & np.uint64(0xFFFFFFFF)
            h &= np.uint64(0xFFFFFFFF)
        index = int(h)
    return index % size


def _oracle_encode(table, x, spec):
    D, C = spec.input_dim, spec.level_dim
    B = x.shape[0]
    out = np.zeros((B, spec.num_levels * C), dtype=np.float64)
    meta = _oracle_level_meta(spec)
    for b in range(B):
        if np.any(x[b] < 0) or np.any(x[b] > 1):
            continue
        for lvl, (res, offset, size) in enumerate(meta):
            pos = np.clip(x[b] * res - 0.5, 0, res - 1)
            pos_grid = np.floor(pos).astype(np.int64)
            frac = pos - pos_grid
            acc = np.zeros(C)
            for cidx in range(1 << D):
                w = 1.0
                corner = np.zeros(D, dtype=np.int64)
                for d in range(D):
                    if (cidx >> d) & 1:
                        w *= frac[d]
                        corner[d] = min(pos_grid[d] + 1, res - 1)
                    else:
                        w *= 1 - frac[d]
                        corner[d] = pos_grid[d]
                idx = _oracle_index(corner, res, size, spec.gridtype, D)
                acc += w * table[offset + idx]
            out[b, lvl * C:(lvl + 1) * C] = acc
    return out


@pytest.mark.parametrize(
    "spec",
    [
        # small spec: all levels dense
        HashGridSpec(input_dim=3, num_levels=4, level_dim=2, base_resolution=4,
                     log2_hashmap_size=19, per_level_scale=2.0),
        # forces hashing at upper levels
        HashGridSpec(input_dim=3, num_levels=6, level_dim=2, base_resolution=16,
                     log2_hashmap_size=10, per_level_scale=2.0),
        # the main-field config shape (trimmed levels for test speed)
        HashGridSpec(input_dim=3, num_levels=8, level_dim=2, base_resolution=16,
                     log2_hashmap_size=15, desired_resolution=512),
        # tiled grid
        HashGridSpec(input_dim=3, num_levels=5, level_dim=4, base_resolution=8,
                     log2_hashmap_size=9, per_level_scale=2.0, gridtype="tiled"),
        # 2D input
        HashGridSpec(input_dim=2, num_levels=4, level_dim=2, base_resolution=16,
                     log2_hashmap_size=8, per_level_scale=2.0),
    ],
)
def test_hash_encode_matches_oracle(spec):
    key = jax.random.PRNGKey(0)
    table = init_hash_table(key, spec)
    rng = np.random.default_rng(5)
    x = rng.uniform(-0.2, 1.2, size=(64, spec.input_dim)).astype(np.float32)
    ours = np.asarray(hash_encode_unit(table, jnp.asarray(x), spec))
    oracle = _oracle_encode(np.asarray(table, np.float64), x, spec)
    np.testing.assert_allclose(ours, oracle, atol=1e-6)


def test_offsets_multiple_of_8_and_total():
    spec = HashGridSpec(num_levels=16, level_dim=2, base_resolution=16,
                        log2_hashmap_size=19, desired_resolution=4096)
    for res, offset, size, use_hash in spec.level_meta():
        assert offset % 8 == 0 and size % 8 == 0
        assert size <= int(np.ceil(2 ** 19 / 8) * 8)
    # first level 16^3 -> dense
    assert not spec.level_meta()[0][3]
    # last level 4096^3 >> 2^19 -> hashed
    assert spec.level_meta()[-1][3]


def test_oob_zero_output_and_grad():
    spec = HashGridSpec(num_levels=2, level_dim=2, base_resolution=4,
                        log2_hashmap_size=19)
    table = init_hash_table(jax.random.PRNGKey(1), spec)
    x = jnp.array([[1.5, 0.5, 0.5], [0.5, 0.5, 0.5]])
    out = hash_encode_unit(table, x, spec)
    assert np.all(np.asarray(out[0]) == 0)
    assert np.any(np.asarray(out[1]) != 0)
    # OOB point contributes no table gradient
    g = jax.grad(lambda t: jnp.sum(hash_encode_unit(t, x[:1], spec)))(table)
    assert np.all(np.asarray(g) == 0)
    g2 = jax.grad(lambda t: jnp.sum(hash_encode_unit(t, x[1:], spec)))(table)
    assert np.any(np.asarray(g2) != 0)


def test_grad_wrt_inputs_and_table():
    spec = HashGridSpec(num_levels=3, level_dim=2, base_resolution=8,
                        log2_hashmap_size=12)
    table = init_hash_table(jax.random.PRNGKey(2), spec)
    x = jnp.array([[0.3, 0.6, 0.1]])

    # numerical grad wrt x matches autodiff (linear interp is differentiable
    # away from grid planes)
    def f(xx):
        return jnp.sum(hash_encode_unit(table, xx, spec) ** 2)

    g = jax.grad(f)(x)
    eps = 1e-4
    for d in range(3):
        xp = x.at[0, d].add(eps)
        xm = x.at[0, d].add(-eps)
        num = (f(xp) - f(xm)) / (2 * eps)
        np.testing.assert_allclose(g[0, d], num, rtol=2e-2, atol=1e-6)


def test_bound_mapping():
    spec = HashGridSpec(num_levels=2, level_dim=2, base_resolution=4,
                        log2_hashmap_size=19)
    table = init_hash_table(jax.random.PRNGKey(3), spec)
    x_world = jnp.array([[0.0, 0.0, 0.0]])
    out_b2 = hash_encode(table, x_world, spec, bound=2.0)
    out_unit = hash_encode_unit(table, jnp.array([[0.5, 0.5, 0.5]]), spec)
    np.testing.assert_allclose(out_b2, out_unit, atol=1e-7)


def test_max_level_partial_eval():
    spec = HashGridSpec(num_levels=4, level_dim=2, base_resolution=4,
                        log2_hashmap_size=19)
    table = init_hash_table(jax.random.PRNGKey(4), spec)
    x = jnp.array([[0.3, 0.3, 0.3]])
    out = np.asarray(hash_encode_unit(table, x, spec, max_level=2))
    assert np.any(out[:, :4] != 0)
    assert np.all(out[:, 4:] == 0)


def test_regularizer_losses_finite_and_positive():
    spec = HashGridSpec(num_levels=4, level_dim=2, base_resolution=8,
                        log2_hashmap_size=10)
    table = init_hash_table(jax.random.PRNGKey(5), spec) + 0.01
    tv = float(total_variation_loss(table, spec, jax.random.PRNGKey(6), n_samples=256))
    wd = float(weight_decay_loss(table, spec))
    assert np.isfinite(tv) and tv >= 0
    assert wd > 0
    g = jax.grad(lambda t: weight_decay_loss(t, spec))(table)
    assert np.all(np.isfinite(np.asarray(g)))


def test_packed_encode_matches_manual_trilinear():
    """Packed-corner mode: one row per cell holding all 2^D corner features;
    output must equal manual trilinear interpolation of that row."""
    spec = HashGridSpec(input_dim=3, num_levels=3, level_dim=2,
                        base_resolution=4, log2_hashmap_size=8,
                        per_level_scale=2.0, packed=True)
    table = init_hash_table(jax.random.PRNGKey(0), spec)
    assert table.shape[1] == 8 * 2
    rng = np.random.default_rng(7)
    x = rng.uniform(0, 1, size=(16, 3)).astype(np.float32)
    out = np.asarray(hash_encode_unit(table, jnp.asarray(x), spec))

    from sanerf_hq_tpu.ops.hashgrid import _level_index

    tab = np.asarray(table, np.float64)
    for b in range(16):
        for lvl, (res, offset, size, use_hash) in enumerate(spec.level_meta()):
            pos = np.clip(x[b] * res - 0.5, 0, res - 1)
            pg = np.floor(pos).astype(np.int64)
            fr = pos - pg
            flat = offset + int(np.asarray(
                _level_index(jnp.asarray(pg)[None], res, size, use_hash, 3))[0])
            row = tab[flat].reshape(8, 2)
            acc = np.zeros(2)
            for c in range(8):
                w = 1.0
                for d in range(3):
                    w *= fr[d] if (c >> d) & 1 else (1 - fr[d])
                acc += w * row[c]
            np.testing.assert_allclose(out[b, lvl * 2:(lvl + 1) * 2], acc,
                                       atol=1e-5)
    # OOB still zero; grads flow
    oob = hash_encode_unit(table, jnp.asarray([[1.5, 0.5, 0.5]]), spec)
    assert np.all(np.asarray(oob) == 0)
    g = jax.grad(lambda t: jnp.sum(
        hash_encode_unit(t, jnp.asarray(x), spec)))(table)
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_onehot_backward_parity(monkeypatch):
    """Small dense levels take the one-hot-matmul backward (docs/PERF.md
    'Hash-grid backward strategies'); its grad must equal the scatter_add
    path bit-for-bit-ish on both the unpacked and packed encoders."""
    import sanerf_hq_tpu.ops.hashgrid as hg

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, size=(257, 3)), jnp.float32)

    for packed in (False, True):
        spec = HashGridSpec(num_levels=4, level_dim=2, base_resolution=4,
                            log2_hashmap_size=10, desired_resolution=32,
                            packed=packed)
        # levels are a mix of dense-below-threshold and hashed
        metas = spec.level_meta()
        assert any(not h and s <= 16384 for _, _, s, h in metas)
        table = init_hash_table(jax.random.PRNGKey(1), spec)

        def loss(t):
            return jnp.sum(jnp.sin(3.0 * hash_encode_unit(t, x, spec)))

        monkeypatch.setattr(hg, "_ONEHOT_MAX_ROWS", 16384)
        hash_encode_unit._clear_cache()
        g_mm = np.asarray(jax.grad(loss)(table))
        monkeypatch.setattr(hg, "_ONEHOT_MAX_ROWS", 0)
        hash_encode_unit._clear_cache()
        g_sc = np.asarray(jax.grad(loss)(table))
        np.testing.assert_allclose(g_mm, g_sc, rtol=1e-5, atol=1e-7)
        assert np.abs(g_mm).sum() > 0
