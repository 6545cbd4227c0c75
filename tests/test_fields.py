"""Tests: encodings, hash grid, MLP zoo, and the canonical fields."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from intrinsicavatar_tpu.ops import encoding as E
from intrinsicavatar_tpu.ops.hashgrid import (
    HashGridSpec, hashgrid_encode, init_hashgrid,
)
from intrinsicavatar_tpu.nets.mlp import VanillaMLP, LipschitzMLP, VanillaCondMLP
from intrinsicavatar_tpu.fields.geometry import VolumeSDF
from intrinsicavatar_tpu.fields.radiance import VolumeRefDirRadiance
from intrinsicavatar_tpu.fields.density import LearnedLaplaceDensity
from intrinsicavatar_tpu.fields.material import VolumeMaterial
from intrinsicavatar_tpu.utils.config import wrap


# ---------------------------------------------------------------- encodings

def test_sh_orthonormal(rng):
    n = 200000
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    Y = np.asarray(E.spherical_harmonics(jnp.asarray(v, jnp.float32), 4))
    gram = (Y.T @ Y) / n * 4 * np.pi  # MC estimate of <Yi, Yj> over sphere
    np.testing.assert_allclose(gram, np.eye(16), atol=0.05)


def test_frequency_encode_shape_and_mask():
    x = jnp.asarray([[0.3, -0.2, 0.5]])
    enc = E.frequency_encode(x, 4)
    assert enc.shape == (1, 3 * 2 * 4)
    mask = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    enc_m = E.frequency_encode(x, 4, mask)
    assert np.allclose(np.asarray(enc_m).reshape(4, 2, 3)[2:], 0.0)


def test_hashgrid_level_mask_schedule():
    # start_level 4 at step 500, +1 level / 125 steps, 16 levels x 2 feats
    m0 = np.asarray(E.hashgrid_level_mask(0, 16, 2, 4, 500, 125))
    assert m0.sum() == 8  # 4 levels x 2 features
    m1 = np.asarray(E.hashgrid_level_mask(500 + 125 * 3, 16, 2, 4, 500, 125))
    assert m1.sum() == 14
    m2 = np.asarray(E.hashgrid_level_mask(10**6, 16, 2, 4, 500, 125))
    assert m2.sum() == 32


def test_sh_band_mask_progressive():
    m = np.asarray(E.sh_band_mask(0, 4, 0, 1000))
    assert m[0] == 0.0
    m_half = np.asarray(E.sh_band_mask(500, 4, 0, 1000))
    assert m_half[0] == 1.0 and m_half[1] == 1.0  # first 2 bands unlocked
    assert np.all(np.asarray(E.sh_band_mask(2000, 4, 0, 1000)) == 1.0)
    assert m.shape == (16,)


def test_ide_shapes():
    v = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    kappa_inv = jnp.asarray([[0.0], [0.5]])
    out = E.integrated_directional_encoding(v, kappa_inv, 5)
    n_ml = sum(2**i + 1 for i in range(5))
    assert out.shape == (2, 2 * n_ml)
    assert np.all(np.isfinite(np.asarray(out)))


# ---------------------------------------------------------------- hash grid

def test_hashgrid_dense_vertex_exact(rng):
    spec = HashGridSpec(n_levels=2, n_features_per_level=2,
                        log2_hashmap_size=19, base_resolution=4,
                        per_level_scale=2.0)
    key = jax.random.PRNGKey(0)
    table = init_hashgrid(key, spec) * 1e4  # amplify for visibility
    # level 0: scale = 3, res = 4; grid vertex i at x = (i - 0.5)/3
    i = 2
    x = jnp.asarray([[(i - 0.5) / 3.0] * 3])
    out = np.asarray(hashgrid_encode(table, x, spec))
    idx = i + i * 4 + i * 16
    np.testing.assert_allclose(out[0, :2], np.asarray(table[0, idx]), rtol=1e-4)


def test_hashgrid_interpolation_linear(rng):
    spec = HashGridSpec(n_levels=1, n_features_per_level=2,
                        log2_hashmap_size=10, base_resolution=4,
                        per_level_scale=2.0)
    table = init_hashgrid(jax.random.PRNGKey(1), spec)
    x0 = np.array([0.31, 0.43, 0.17])
    x1 = x0 + np.array([0.003, 0.0, 0.0])
    xm = (x0 + x1) / 2
    out = np.asarray(hashgrid_encode(
        table, jnp.asarray(np.stack([x0, x1, xm]), jnp.float32), spec))
    np.testing.assert_allclose(out[2], (out[0] + out[1]) / 2, rtol=1e-3,
                               atol=1e-9)


def test_hashgrid_dense_flags_no_int32_overflow():
    """res^3 overflows int32 beyond res=1290; the finest default levels
    must classify as hashed, not dense (round-1 regression)."""
    spec = HashGridSpec()  # default: finest res ~4k
    res = spec.resolutions.astype(np.int64)
    dense = spec.dense_levels
    assert not dense[res**3 > spec.table_size].any()
    assert dense[res**3 <= spec.table_size].all()


def test_hashgrid_vjp_x_matches_autodiff(rng):
    from intrinsicavatar_tpu.ops.hashgrid import hashgrid_encode_vjp_x
    spec = HashGridSpec(n_levels=4, n_features_per_level=2,
                        log2_hashmap_size=8, base_resolution=4,
                        per_level_scale=2.0, include_xyz=True)
    key = jax.random.PRNGKey(3)
    table = init_hashgrid(key, spec) * 1e3
    x = jnp.asarray(rng.uniform(0.05, 0.95, size=(32, 3)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(32, spec.n_output_dims))
                    .astype(np.float32))
    _, pull = jax.vjp(lambda p: hashgrid_encode(table, p, spec), x)
    auto = np.asarray(pull(g)[0])
    manual = np.asarray(hashgrid_encode_vjp_x(table, x, spec, g))
    np.testing.assert_allclose(manual, auto, rtol=1e-4, atol=1e-5)


def test_hashgrid_include_xyz_and_mask():
    spec = HashGridSpec(n_levels=2, n_features_per_level=2, include_xyz=True,
                        log2_hashmap_size=10, base_resolution=4)
    table = init_hashgrid(jax.random.PRNGKey(2), spec)
    x = jnp.asarray([[0.25, 0.5, 0.75]])
    mask = jnp.zeros(4)
    out = np.asarray(hashgrid_encode(table, x, spec, mask))
    np.testing.assert_allclose(out[0, :3], [-0.5, 0.0, 0.5], atol=1e-6)
    assert np.all(out[0, 3:] == 0.0)


def test_hashgrid_grad_flows():
    spec = HashGridSpec(n_levels=2, n_features_per_level=2,
                        log2_hashmap_size=10, base_resolution=4)
    table = init_hashgrid(jax.random.PRNGKey(3), spec)
    x = jnp.asarray([[0.3, 0.4, 0.5]])
    g = jax.grad(lambda t: jnp.sum(hashgrid_encode(t, x, spec)))(table)
    assert float(jnp.sum(jnp.abs(g))) > 0


# ---------------------------------------------------------------- MLPs

def test_vanilla_mlp_sphere_init():
    mlp = VanillaMLP(3, 13, n_neurons=64, n_hidden_layers=1,
                     sphere_init=True, sphere_init_radius=0.5,
                     weight_norm=True)
    params = mlp.init(jax.random.PRNGKey(0))
    # raw xyz input in [-1,1]: output channel 0 approximates ||x|| - 0.5
    xs = jnp.asarray([[0.0, 0.0, 0.0], [0.9, 0.0, 0.0], [0.0, 0.9, 0.9]])
    sdf = np.asarray(mlp(params, xs))[:, 0]
    assert sdf[0] < 0 < sdf[1] < sdf[2]


def test_lipschitz_mlp_bound():
    mlp = LipschitzMLP(8, 5, n_neurons=32, n_hidden_layers=2)
    params = mlp.init(jax.random.PRNGKey(0))
    # crushing the bound makes the network (almost) constant
    tiny = jax.tree.map(lambda x: x, params)
    for p in tiny:
        p["c"] = jnp.full_like(p["c"], -20.0)  # softplus ~ 0
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 8))
    out = np.asarray(mlp(tiny, x))
    assert np.ptp(out, axis=0).max() < 1e-6
    assert float(mlp.lipschitz_bound_full(params)) > 0


def test_cond_mlp_skip_and_cond():
    mlp = VanillaCondMLP(6, 3, dim_cond=4, n_neurons=32, n_hidden_layers=4,
                         skip_in=(2,), cond_in=(0,))
    params = mlp.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (10, 6))
    cond = jax.random.normal(jax.random.PRNGKey(2), (4,))
    out = mlp(params, x, cond)
    assert out.shape == (10, 3)
    out2 = mlp(params, x, cond * 2)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


# ---------------------------------------------------------------- fields

GEOM_CFG = wrap({
    "feature_dim": 13,
    "xyz_encoding_config": {
        "otype": "ProgressiveBandHashGrid", "n_levels": 8,
        "n_features_per_level": 2, "log2_hashmap_size": 15,
        "base_resolution": 16, "per_level_scale": 1.447269237440378,
        "include_xyz": True, "start_level": 4, "update_steps": 125,
        "start_step": 500,
    },
    "mlp_network_config": {
        "otype": "VanillaMLP", "output_activation": "none", "n_neurons": 64,
        "n_hidden_layers": 1, "sphere_init": True, "sphere_init_radius": 0.5,
        "weight_norm": True,
    },
})


def make_geometry():
    geo = VolumeSDF(GEOM_CFG)
    geo.prepare_bbox(np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]]))
    params = geo.init(jax.random.PRNGKey(0))
    return geo, params


def test_volume_sdf_sphere_start():
    geo, params = make_geometry()
    mask = geo.level_mask(0)
    sdf_c = float(geo.sdf(params, jnp.zeros((1, 3)), mask)[0])
    sdf_out = float(geo.sdf(params, jnp.asarray([[0.95, 0.0, 0.0]]), mask)[0])
    assert sdf_c < 0 < sdf_out


def test_volume_sdf_grad_and_laplace():
    geo, params = make_geometry()
    mask = geo.level_mask(1000)
    x = jnp.asarray([[0.3, 0.2, -0.1], [0.0, 0.6, 0.0]])
    sdf, grad, feat, lap = geo.sdf_grad_feature(
        params, x, mask, with_laplace=True, rng=jax.random.PRNGKey(1))
    assert grad.shape == (2, 3)
    assert feat.shape == (2, 13)
    assert np.all(np.isfinite(np.asarray(lap)))
    # sphere-init gradient points outward
    d = np.sum(np.asarray(grad) * np.asarray(x), axis=-1)
    assert np.all(d > 0)
    # eikonal-ish at init: |grad| near 1 within a loose band
    n = np.linalg.norm(np.asarray(grad), axis=-1)
    assert np.all((n > 0.3) & (n < 3.0))


def test_radiance_field_forward():
    cfg = wrap({
        "input_feature_dim": 16,
        "xyz_encoding_config": GEOM_CFG["xyz_encoding_config"],
        "mlp_network_config": {"otype": "VanillaMLP", "n_neurons": 64,
                               "n_hidden_layers": 2,
                               "output_activation": "none"},
        "color_activation": "sigmoid",
        "start_step": 0, "full_band_step": 1000,
        "dir_encoding_config": {"otype": "SphericalHarmonics", "degree": 4},
    })
    rad = VolumeRefDirRadiance(cfg)
    rad.prepare_bbox(np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]]))
    params = rad.init(jax.random.PRNGKey(0))
    N = 5
    pts = jax.random.uniform(jax.random.PRNGKey(1), (N, 3), minval=-1, maxval=1)
    feat = jax.random.normal(jax.random.PRNGKey(2), (N, 13))
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (N, 1))
    normals = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (N, 1))
    color, xyz_feat = rad(params, pts, feat, dirs, normals,
                          level_mask=rad.level_mask(10000),
                          sh_mask=rad.sh_mask(10000))
    assert color.shape == (N, 3)
    assert xyz_feat.shape == (N, rad.spec.n_output_dims)
    assert np.all((np.asarray(color) >= 0) & (np.asarray(color) <= 1))


def test_material_field():
    cfg = wrap({
        "input_feature_dim": 48, "n_output_dim": 5,
        "albedo_scale": 0.77, "albedo_bias": 0.03,
        "roughness_scale": 0.9, "roughness_bias": 0.09,
        "mlp_network_config": {"otype": "LipshitzMLP", "n_neurons": 64,
                               "n_hidden_layers": 2,
                               "output_activation": "none"},
        "material_activation": "sigmoid",
    })
    mat = VolumeMaterial(cfg)
    params = mat.init(jax.random.PRNGKey(0))
    out = np.asarray(mat(params, jax.random.normal(jax.random.PRNGKey(1), (7, 48))))
    assert out.shape == (7, 5)
    assert np.all((out[:, :3] >= 0.03) & (out[:, :3] <= 0.8))
    assert np.all((out[:, 3] >= 0.09) & (out[:, 3] <= 0.99))
    assert float(mat.lipschitz_bound(params)) > 0


def test_density_learned_beta():
    den = LearnedLaplaceDensity(wrap({"beta_min": 1e-4,
                                      "params_init": {"beta": 0.3}}))
    params = den.init()
    beta = float(den.get_beta(params))
    np.testing.assert_allclose(beta, 0.3001, rtol=1e-5)
    d = float(den(params, jnp.asarray(0.0)))
    np.testing.assert_allclose(d, 0.5 / beta, rtol=1e-5)
