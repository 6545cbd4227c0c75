"""PBR correctness: emitter sampling/pdf consistency, BRDF MC identities."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from intrinsicavatar_tpu.pbr import envlight as E
from intrinsicavatar_tpu.pbr import brdf as B
from intrinsicavatar_tpu.utils.config import wrap


def test_uv_xyz_roundtrip(rng):
    d = rng.normal(size=(512, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    u, v = E.xyz_to_uv(jnp.asarray(d, jnp.float32))
    d2 = np.asarray(E.uv_to_xyz(u, v))
    np.testing.assert_allclose(d2, d, atol=1e-5)


def test_envlight_tensor_importance_sampling(rng):
    """MC estimate of integral L dw via emitter sampling matches direct MC."""
    cfg = wrap({"envlight_config": {"base_res": 16, "scale": 1.0,
                                    "bias": 0.1}})
    em = E.EnvLightTensor(cfg)
    params = em.init(jax.random.PRNGKey(0))
    pdf_state = em.update_pdf(params)

    n = 200000
    dirs = em.sample(pdf_state, jax.random.PRNGKey(1), n)
    pdf = np.asarray(em.pdf(pdf_state, dirs))[:, 0]
    li = np.asarray(em.eval(params, dirs))
    est_is = (li / pdf[:, None]).mean(0)  # ∫ L dω estimate

    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    li_u = np.asarray(em.eval(params, jnp.asarray(d, jnp.float32)))
    est_mc = li_u.mean(0) * 4 * np.pi

    np.testing.assert_allclose(est_is, est_mc, rtol=0.05)


def test_envlight_sg_eval_positive_and_image():
    cfg = wrap({"envlight_config": {"base_res": 16, "num_SGs": 8}})
    em = E.EnvLightSG(cfg)
    params = em.init(jax.random.PRNGKey(0))
    img = np.asarray(em.generate_image(params))
    assert img.shape == (16, 32, 3)
    assert np.all(img >= 0)
    st = em.update_pdf(params)
    d = em.sample(st, jax.random.PRNGKey(1), 64)
    assert np.allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-4)


def test_stratified_sphere_uniform():
    dirs, inv_pdf = E.sample_uniform_sphere_stratified(
        jax.random.PRNGKey(0), 16, 32)
    d = np.asarray(dirs)
    assert d.shape == (512, 3)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(inv_pdf[0, 0]), 4 * np.pi, rtol=1e-6)
    # stratification: mean close to zero
    assert np.abs(d.mean(0)).max() < 0.05


def _mc_white_furnace(scatterer, params, alpha, metallic_val, key, n=200000):
    """∫ f(wo) dω via uniform sphere MC for a head-on view."""
    normal = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    wi = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    d = jax.random.normal(key, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    albedo = jnp.ones((n, 3))
    rough = jnp.full((n,), alpha)
    metal = jnp.full((n, 1), metallic_val)
    atten = jnp.zeros((n, 1))
    diff, spec = scatterer.eval(params, normal, wi, d, rough, rough, albedo,
                                metal, atten)
    return (np.asarray(diff).mean(0) * 4 * np.pi,
            np.asarray(spec).mean(0) * 4 * np.pi)


def test_lambertian_integrates_to_one(rng):
    lam = B.Lambertian()
    diff_int, _ = _mc_white_furnace(lam, {}, 0.5, 0.0, jax.random.PRNGKey(0))
    # ∫ cos/π over hemisphere = 1
    np.testing.assert_allclose(diff_int, 1.0, rtol=0.03)


def test_ggx_energy_below_one(rng):
    ggx = B.GGX()
    for alpha in (0.2, 0.5, 0.9):
        _, spec_int = _mc_white_furnace(ggx, {}, alpha, 1.0,
                                        jax.random.PRNGKey(1))
        # with shadowing the white furnace is < 1 but not tiny
        assert np.all(spec_int < 1.1), spec_int
        assert np.all(spec_int > 0.2), spec_int


def test_brdf_sampling_pdf_consistency(rng):
    """E[f/p] under BRDF sampling == E[f]*4π under uniform sampling."""
    ml = B.MultiLobe()
    n = 200000
    normal = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    wi_v = jnp.asarray([0.3, -0.2, 0.93])
    wi_v = wi_v / jnp.linalg.norm(wi_v)
    wi = jnp.tile(wi_v[None], (n, 1))
    albedo = jnp.full((n, 3), 0.7)
    rough = jnp.full((n,), 0.4)
    metal = jnp.full((n, 1), 0.3)
    atten = jnp.zeros((n, 1))

    wo = ml.sample({}, jax.random.PRNGKey(0), normal, wi, rough, rough,
                   albedo, metal, atten)
    pdf = np.asarray(ml.pdf({}, normal, wi, wo, rough, rough, albedo, metal,
                            atten))[:, 0]
    diff, spec = ml.eval({}, normal, wi, wo, rough, rough, albedo, metal,
                         atten)
    f = np.asarray(diff) * 0.3 + np.asarray(spec)  # arbitrary blend
    ok = pdf > 1e-5
    est_brdf = (f[ok] / pdf[ok, None]).mean(0) * ok.mean()

    d = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    diff_u, spec_u = ml.eval({}, normal, wi, d, rough, rough, albedo, metal,
                             atten)
    f_u = np.asarray(diff_u) * 0.3 + np.asarray(spec_u)
    est_unif = f_u.mean(0) * 4 * np.pi
    np.testing.assert_allclose(est_brdf, est_unif, rtol=0.1, atol=0.01)


def test_sggx_phase_modes():
    sp = B.SpecularSGGX()
    n = 128
    normal = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    wi = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    rough = jnp.full((n,), 0.3)
    alb = jnp.ones((n, 3))
    metal = jnp.full((n, 1), 1.0)
    atten = jnp.zeros((n, 1))
    wo = sp.sample({}, jax.random.PRNGKey(0), normal, wi, rough, rough, alb,
                   metal, atten)
    p = sp.pdf({}, normal, wi, wo, rough, rough, alb, metal, atten)
    assert np.all(np.asarray(p) >= 0)
    d, s = sp.eval({}, normal, wi, wo, rough, rough, alb, metal, atten)
    assert np.all(np.isfinite(np.asarray(s)))
