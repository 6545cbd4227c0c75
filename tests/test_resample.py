"""Unit tests: vectorized resampling ops vs serial-scan oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from intrinsicavatar_tpu.ops import resample as R
import oracles


def random_ray(rng, S, steps, with_crossing=False):
    edges = np.sort(rng.uniform(0.0, 2.0, size=steps + 1))
    t_starts = np.full(S, 1e9, np.float32)
    t_ends = np.full(S, 1e9, np.float32)
    weights = np.zeros(S, np.float32)
    sdfs = np.zeros(S, np.float32)
    mask = np.zeros(S, bool)
    t_starts[:steps] = edges[:-1]
    t_ends[:steps] = edges[1:]
    w = rng.uniform(0.0, 0.02, size=steps).astype(np.float32)
    # make some rays nearly saturated, others mostly background
    w *= rng.choice([1.0, 40.0])
    weights[:steps] = w
    s = rng.uniform(-0.5, 0.5, size=steps).astype(np.float32)
    if with_crossing and steps > 4:
        k = rng.integers(2, steps - 1)
        s[:k] = np.abs(s[:k])
        s[k:] = -np.abs(s[k:]) - 1e-3
    sdfs[:steps] = s
    mask[:steps] = True
    return t_starts, t_ends, weights, sdfs, mask, steps


@pytest.mark.parametrize("with_crossing", [False, True])
@pytest.mark.parametrize("n_bins", [1, 7, 32])
def test_cdf_resample_matches_oracle(rng, with_crossing, n_bins):
    S = 24
    for trial in range(30):
        steps = int(rng.integers(1, S + 1))
        ts, te, w, s, m, steps = random_ray(rng, S, steps, with_crossing)
        out = R.cdf_resample_1(
            jnp.asarray(ts), jnp.asarray(te), jnp.asarray(w), jnp.asarray(s),
            jnp.asarray(m), n_bins,
        )
        ots, ooff, oidx, obg, ofg, obgc, osurf = oracles.cdf_resample_ray(
            ts[:steps], te[:steps], w[:steps], s[:steps], n_bins
        )
        np.testing.assert_allclose(np.asarray(out.ts), ots, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.offsets), ooff, rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(out.indices), oidx)
        np.testing.assert_array_equal(np.asarray(out.is_bg), obg)
        np.testing.assert_array_equal(np.asarray(out.fg_counts)[:steps], ofg)
        assert int(out.bg_count) == obgc
        assert int(out.surface_idx) == osurf


def edges_from_occupancy(rng, S, occ):
    """Build an edge list (vals, is_left, is_right) from a 0/1 occupancy run."""
    step = 0.01
    u = rng.uniform()
    grid = (np.arange(S + 1) + u) * step
    is_left = np.zeros(S + 1, bool)
    is_right = np.zeros(S + 1, bool)
    is_left[:-1] = occ
    is_right[1:] = occ
    keep = is_left | is_right
    return grid[keep], is_left[keep], is_right[keep]


@pytest.mark.parametrize("n_new", [4, 16])
def test_merge_resample_matches_oracle(rng, n_new):
    S = 32
    E = S + 1
    for trial in range(30):
        occ = rng.uniform(size=S) < rng.uniform(0.2, 0.9)
        if not occ.any():
            occ[rng.integers(0, S)] = True
        vals_c, left_c, right_c = edges_from_occupancy(rng, S, occ)
        steps = len(vals_c)
        w_c = np.zeros(steps, np.float32)
        real = left_c[:-1] & right_c[1:]
        w_c[:-1][real] = rng.uniform(0, 0.15, size=real.sum())

        vals = np.full(E, 1e9, np.float32)
        is_left = np.zeros(E, bool)
        is_right = np.zeros(E, bool)
        valid = np.zeros(E, bool)
        weights = np.zeros(E, np.float32)
        vals[:steps] = vals_c
        is_left[:steps] = left_c
        is_right[:steps] = right_c
        valid[:steps] = True
        weights[:steps] = w_c

        out = R.merge_resample_1(
            jnp.asarray(vals), jnp.asarray(is_left), jnp.asarray(is_right),
            jnp.asarray(valid), jnp.asarray(weights), n_new,
        )
        ovals, oleft, oright, onew = oracles.merge_resample_ray(
            vals_c, left_c, right_c, w_c, n_new
        )
        n_out = int(np.asarray(out.valid).sum())
        assert n_out == len(ovals)
        np.testing.assert_allclose(np.asarray(out.vals)[:n_out], ovals,
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(out.is_left)[:n_out], oleft)
        np.testing.assert_array_equal(np.asarray(out.is_right)[:n_out], oright)
        np.testing.assert_array_equal(np.asarray(out.is_new)[:n_out], onew)
        # payload carry: old edge identity survives the merge permutation
        payload = np.concatenate([np.arange(E, dtype=np.float32),
                                  np.full(n_new, -1, np.float32)])
        carried = payload[np.asarray(out.gather_idx)]
        old_slots = ~np.asarray(out.is_new)[:n_out]
        orig_positions = carried[:n_out][old_slots].astype(int)
        np.testing.assert_allclose(vals[orig_positions],
                                   np.asarray(out.vals)[:n_out][old_slots])


@pytest.mark.parametrize("n_samples", [4, 16])
def test_fine_resample_matches_oracle(rng, n_samples):
    S = 24
    for trial in range(30):
        steps = int(rng.integers(1, S + 1))
        ts, te, w, s, m, steps = random_ray(rng, S, steps)
        out = R.fine_resample_1(jnp.asarray(ts), jnp.asarray(te), jnp.asarray(w),
                              jnp.asarray(m), n_samples)
        ors, ore, ofg = oracles.fine_resample_ray(ts[:steps], te[:steps],
                                                  w[:steps], n_samples)
        got_mask = np.asarray(out.mask)
        np.testing.assert_array_equal(got_mask, ofg)
        np.testing.assert_allclose(np.asarray(out.t_starts)[got_mask],
                                   ors[ofg], rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.t_ends)[got_mask],
                                   ore[ofg], rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("n_samples", [4])
@pytest.mark.parametrize("with_crossing", [False, True])
def test_sdf_fine_resample_matches_oracle(rng, n_samples, with_crossing):
    S = 24
    for trial in range(30):
        steps = int(rng.integers(2, S + 1))
        ts, te, w, s, m, steps = random_ray(rng, S, steps, with_crossing)
        alphas = rng.uniform(0, 0.9, size=S).astype(np.float32)
        out = R.sdf_fine_resample_1(jnp.asarray(ts), jnp.asarray(te),
                                  jnp.asarray(alphas), jnp.asarray(s),
                                  jnp.asarray(m), n_samples)
        ors, ore, ofg = oracles.sdf_fine_resample_ray(
            ts[:steps], te[:steps], alphas[:steps], s[:steps], n_samples
        )
        got_mask = np.asarray(out.mask)
        np.testing.assert_array_equal(got_mask, ofg)
        np.testing.assert_allclose(np.asarray(out.t_starts)[got_mask],
                                   ors[ofg], rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.t_ends)[got_mask],
                                   ore[ofg], rtol=1e-4, atol=1e-6)


def test_vmapped_shapes(rng):
    S, Rn, B = 16, 8, 12
    ts = np.sort(rng.uniform(0, 2, size=(Rn, S)), axis=-1).astype(np.float32)
    te = ts + 0.01
    w = rng.uniform(0, 0.1, size=(Rn, S)).astype(np.float32)
    s = rng.uniform(-1, 1, size=(Rn, S)).astype(np.float32)
    m = np.ones((Rn, S), bool)
    out = R.cdf_resample_rays(jnp.asarray(ts), jnp.asarray(te), jnp.asarray(w),
                              jnp.asarray(s), jnp.asarray(m), B)
    assert out.ts.shape == (Rn, B)
    assert out.fg_counts.shape == (Rn, S)
    assert out.surface_idx.shape == (Rn,)
