"""Tests for masked query compaction and stable partitions."""

import numpy as np
import jax
import jax.numpy as jnp

from intrinsicavatar_tpu.ops.compact import (
    compact_apply, compact_indices, stable_partition_indices,
    stable_partition_rows,
)


def test_stable_partition(rng):
    for _ in range(10):
        mask = jnp.asarray(rng.uniform(size=64) < 0.4)
        idx = np.asarray(stable_partition_indices(mask))
        m = np.asarray(mask)
        nv = int(m.sum())
        # valid first, each group in original order
        assert np.all(m[idx[:nv]])
        assert not np.any(m[idx[nv:]])
        assert np.all(np.diff(idx[:nv]) > 0)
        assert np.all(np.diff(idx[nv:]) > 0)


def test_stable_partition_rows(rng):
    mask = jnp.asarray(rng.uniform(size=(8, 32)) < 0.5)
    idx = np.asarray(stable_partition_rows(mask))
    m = np.asarray(mask)
    for r in range(8):
        nv = int(m[r].sum())
        assert np.all(m[r, idx[r, :nv]])


def test_compact_apply_matches_dense(rng):
    M = 200
    pts = jnp.asarray(rng.normal(size=(M, 3)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=M) < 0.3)

    def fn(x):
        return (jnp.sum(x**2, -1), x * 2.0)

    out = compact_apply(fn, pts, mask, budget=128,
                        fills=[(-1.0), jnp.zeros(3)])
    s, d = np.asarray(out[0]), np.asarray(out[1])
    m = np.asarray(mask)
    ref_s = np.sum(np.asarray(pts) ** 2, -1)
    np.testing.assert_allclose(s[m], ref_s[m], rtol=1e-5)
    np.testing.assert_allclose(s[~m], -1.0)
    np.testing.assert_allclose(d[m], np.asarray(pts)[m] * 2, rtol=1e-5)
    np.testing.assert_allclose(d[~m], 0.0)


def test_compact_apply_overflow(rng):
    """More valid entries than budget: overflow keeps fill values."""
    M = 100
    pts = jnp.asarray(rng.normal(size=(M, 3)).astype(np.float32))
    mask = jnp.ones(M, bool)
    out = compact_apply(lambda x: (jnp.ones(x.shape[0]),), pts, mask,
                        budget=60, fills=[0.0])
    s = np.asarray(out[0])
    assert s[:60].sum() == 60  # first 60 evaluated
    assert s[60:].sum() == 0   # overflow filled


def test_compact_grad_flows(rng):
    pts = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=32) < 0.5)
    w = jnp.ones(3)

    def loss(w):
        out = compact_apply(lambda x: (x @ w,), pts, mask, 32, [0.0])
        return jnp.sum(out[0])

    g = np.asarray(jax.grad(loss)(w))
    ref = np.asarray(pts)[np.asarray(mask)].sum(0)
    np.testing.assert_allclose(g, ref, rtol=1e-5)


def test_compact_indices_interleaved_drops_far_samples():
    """Sample-major compaction: overflow must drop the FAR samples of each
    ray, never every sample of the trailing rays."""
    import jax.numpy as jnp
    import numpy as np
    from intrinsicavatar_tpu.ops.compact import compact_indices_interleaved

    R, S = 4, 8
    mask = jnp.ones((R, S), bool)          # fully valid: 32 lanes
    lane, picked = compact_indices_interleaved(mask, 16)  # half budget
    lane = np.asarray(lane)
    assert np.asarray(picked).all()
    rays, samples = lane // S, lane % S
    # every ray keeps its first S/2 samples
    for r in range(R):
        kept = np.sort(samples[rays == r])
        np.testing.assert_array_equal(kept, np.arange(S // 2))
