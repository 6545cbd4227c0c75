"""Unit tests for masked volume-rendering primitives."""

import numpy as np
import jax
import jax.numpy as jnp

from intrinsicavatar_tpu.ops import volrend as V
from intrinsicavatar_tpu.ops import math as M


def test_render_weight_from_alpha_matches_serial(rng):
    R, S = 16, 32
    alphas = rng.uniform(0, 0.9, size=(R, S)).astype(np.float32)
    mask = rng.uniform(size=(R, S)) < 0.7
    w, tr = V.render_weight_from_alpha(jnp.asarray(alphas), jnp.asarray(mask))
    w, tr = np.asarray(w), np.asarray(tr)
    for r in range(R):
        t = 1.0
        for s in range(S):
            if mask[r, s]:
                assert np.isclose(tr[r, s], t, rtol=1e-5)
                assert np.isclose(w[r, s], alphas[r, s] * t, rtol=1e-5)
                t *= 1.0 - alphas[r, s]
            else:
                assert w[r, s] == 0.0


def test_weights_sum_le_one(rng):
    alphas = rng.uniform(0, 1, size=(8, 64)).astype(np.float32)
    w, _ = V.render_weight_from_alpha(jnp.asarray(alphas))
    assert np.all(np.asarray(w.sum(-1)) <= 1.0 + 1e-5)


def test_accumulate_along_rays(rng):
    R, S, C = 4, 8, 3
    w = rng.uniform(size=(R, S)).astype(np.float32)
    v = rng.normal(size=(R, S, C)).astype(np.float32)
    m = rng.uniform(size=(R, S)) < 0.5
    got = np.asarray(V.accumulate_along_rays(jnp.asarray(w), jnp.asarray(v),
                                             jnp.asarray(m)))
    want = (w[..., None] * v * m[..., None]).sum(1)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    opac = np.asarray(V.accumulate_along_rays(jnp.asarray(w), None,
                                              jnp.asarray(m)))
    np.testing.assert_allclose(opac[:, 0], (w * m).sum(1), rtol=1e-5)


def test_laplace_density_limits():
    beta = jnp.asarray(0.1)
    # far outside: density -> 0 ; far inside: density -> 1/beta
    assert float(V.laplace_density(jnp.asarray(5.0), beta)) < 1e-8
    np.testing.assert_allclose(
        float(V.laplace_density(jnp.asarray(-5.0), beta)), 10.0, rtol=1e-5
    )
    # at the surface: 1/(2 beta)
    np.testing.assert_allclose(
        float(V.laplace_density(jnp.asarray(0.0), beta)), 5.0, rtol=1e-5
    )


def test_laplace_density_grad_finite():
    g = jax.grad(lambda s: V.laplace_density(s, jnp.asarray(0.05)))(jnp.asarray(0.0))
    assert np.isfinite(float(g))


def test_alpha_from_sdf_monotone():
    beta = jnp.asarray(0.1)
    sdfs = jnp.linspace(-1, 1, 64)
    a = V.alpha_from_sdf(sdfs, jnp.asarray(0.05), beta)
    assert np.all(np.diff(np.asarray(a)) <= 1e-7)
    assert np.all((np.asarray(a) >= 0) & (np.asarray(a) <= 1))


def test_render_visibility(rng):
    alphas = jnp.asarray([[0.99, 0.99, 0.5, 0.5]])
    vis = V.render_visibility_from_alpha(alphas, early_stop_eps=1e-3)
    # transmittance before: 1, .01, 1e-4, 5e-5 -> first two visible
    np.testing.assert_array_equal(np.asarray(vis)[0], [True, True, False, False])


def test_srgb_roundtrip(rng):
    x = jnp.asarray(rng.uniform(0, 1, size=(128, 3)).astype(np.float32))
    y = M.srgb_to_linear(M.linear_to_srgb(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_rodrigues_vs_known():
    # 90 deg about z
    R = M.rodrigues(jnp.asarray([0.0, 0.0, np.pi / 2]))
    want = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    np.testing.assert_allclose(np.asarray(R), want, atol=1e-6)
    # identity at ~0
    R0 = M.rodrigues(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(R0), np.eye(3), atol=1e-5)


def test_rigid_inverse():
    rng = np.random.default_rng(0)
    Rm = M.rodrigues(jnp.asarray(rng.normal(size=3).astype(np.float32)))
    T = M.transform_mat(Rm, jnp.asarray(rng.normal(size=3).astype(np.float32)))
    I = np.asarray(T @ M.rigid_inverse(T))
    np.testing.assert_allclose(I, np.eye(4), atol=1e-5)


def test_trunc_exp_grad_clamped():
    g = jax.grad(lambda x: M.trunc_exp(x))(jnp.asarray(20.0))
    np.testing.assert_allclose(float(g), np.exp(15.0), rtol=1e-5)
