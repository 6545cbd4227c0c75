"""The fused encode+MLP+grad custom VJP vs jax autodiff of the explicit
first-order graph (`ops/encode_grad.py` vs `ops/hashgrid.py` + manual MLP
backprop).  CPU reference; equality must hold including border clamps and
progressive level masks."""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from intrinsicavatar_tpu.ops.hashgrid import (
    HashGridSpec, hashgrid_encode, hashgrid_encode_raw,
    hashgrid_encode_vjp_x, init_hashgrid,
)
from intrinsicavatar_tpu.ops.encode_grad import encode_mlp_sdfgrad
from intrinsicavatar_tpu.nets.mlp import VanillaMLP


def _setup(include_xyz, masked, seed=0):
    spec = HashGridSpec(n_levels=6, n_features_per_level=2,
                        log2_hashmap_size=10, base_resolution=4,
                        per_level_scale=1.9, include_xyz=include_xyz)
    assert spec.dense_levels.any() and not spec.dense_levels.all()
    mlp = VanillaMLP(spec.n_output_dims, 13, n_neurons=32,
                     n_hidden_layers=1, sphere_init=True, weight_norm=True)
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    table = init_hashgrid(k1, spec) * 1e3  # non-trivial features
    mlp_params = mlp.init(k2)
    # cover in-domain and out-of-domain (border-clamped) queries
    x = jax.random.uniform(k3, (257, 3), minval=-0.15, maxval=1.15)
    lf = spec.n_levels * spec.n_features_per_level
    if masked:
        mask = (jnp.arange(lf) < lf - 4).astype(jnp.float32)
    else:
        mask = jnp.ones((lf,))
    return spec, mlp, table, mlp_params, x, mask


def _reference_pair(spec, mlp, table, mlp_params, x, mask):
    enc = hashgrid_encode_raw(table, x, spec, mask)
    feat, g_enc = mlp.value_and_input_grad(mlp_params, enc)
    grad = hashgrid_encode_vjp_x(table, x, spec, g_enc, mask)
    return feat, grad


@pytest.mark.parametrize("include_xyz", [False, True])
@pytest.mark.parametrize("masked", [False, True])
def test_forward_matches_reference(include_xyz, masked):
    spec, mlp, table, mlp_params, x, mask = _setup(include_xyz, masked)
    feat_r, grad_r = _reference_pair(spec, mlp, table, mlp_params, x, mask)
    feat_c, grad_c = encode_mlp_sdfgrad(
        spec, mlp.value_and_input_grad, table, mlp_params, x, mask)
    np.testing.assert_allclose(feat_c, feat_r, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(grad_c, grad_r, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("include_xyz", [False, True])
@pytest.mark.parametrize("masked", [False, True])
def test_backward_matches_autodiff(include_xyz, masked):
    """d loss / d (table, mlp, x) of a loss touching BOTH outputs."""
    spec, mlp, table, mlp_params, x, mask = _setup(include_xyz, masked)
    a = jnp.linspace(0.5, 1.5, 13)

    def loss_ref(table, mlp_params, x):
        feat, grad = _reference_pair(spec, mlp, table, mlp_params, x, mask)
        return jnp.sum(jnp.sin(feat @ a)) + jnp.sum(jnp.cos(grad) * grad)

    def loss_custom(table, mlp_params, x):
        feat, grad = encode_mlp_sdfgrad(
            spec, mlp.value_and_input_grad, table, mlp_params, x, mask)
        return jnp.sum(jnp.sin(feat @ a)) + jnp.sum(jnp.cos(grad) * grad)

    v_r, g_r = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(
        table, mlp_params, x)
    v_c, g_c = jax.value_and_grad(loss_custom, argnums=(0, 1, 2))(
        table, mlp_params, x)
    np.testing.assert_allclose(v_c, v_r, rtol=1e-5)
    for gr, gc, name in zip(g_r, g_c, ["table", "mlp", "x"]):
        flat_r, _ = jax.flatten_util.ravel_pytree(gr)
        flat_c, _ = jax.flatten_util.ravel_pytree(gc)
        scale = np.maximum(np.abs(flat_r).max(), 1e-3)
        np.testing.assert_allclose(
            flat_c / scale, flat_r / scale, atol=2e-5,
            err_msg=f"grad mismatch for {name}")


def test_geometry_field_uses_fused_path():
    """VolumeSDF analytic mode end-to-end: value_and_grad of an
    eikonal-style loss agrees with the pre-fusion explicit graph."""
    from intrinsicavatar_tpu.fields.geometry import VolumeSDF
    from intrinsicavatar_tpu.utils.config import wrap

    cfg = wrap({
        "feature_dim": 13,
        "grad_type": "analytic",
        "xyz_encoding_config": {
            "n_levels": 6, "log2_hashmap_size": 10, "base_resolution": 4,
            "per_level_scale": 1.9, "include_xyz": True,
        },
        "mlp_network_config": {
            "otype": "VanillaMLP", "n_neurons": 32, "n_hidden_layers": 1,
            "sphere_init": True, "weight_norm": True,
        },
    })
    geo = VolumeSDF(cfg)
    geo.prepare_bbox(np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]]))
    params = geo.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (129, 3)) * 0.4
    mask = jnp.ones((12,))

    def loss_fused(params):
        sdf, grad, feat = geo.sdf_grad_feature(params, x, mask)
        return (jnp.sum((jnp.linalg.norm(grad, axis=-1) - 1.0) ** 2)
                + jnp.sum(sdf ** 2) + jnp.sum(feat ** 2) * 1e-3)

    def loss_explicit(params):
        enc = hashgrid_encode_raw(params["table"], geo._normalize(x),
                                  geo.spec, mask)
        feat, g_enc = geo.mlp.value_and_input_grad(params["mlp"], enc)
        grad_n = hashgrid_encode_vjp_x(params["table"], geo._normalize(x),
                                       geo.spec, g_enc, mask)
        grad = grad_n / jnp.asarray(geo.scale)[None, :]
        sdf = feat[:, 0]
        return (jnp.sum((jnp.linalg.norm(grad, axis=-1) - 1.0) ** 2)
                + jnp.sum(sdf ** 2) + jnp.sum(feat ** 2) * 1e-3)

    v_f, g_f = jax.value_and_grad(loss_fused)(params)
    v_e, g_e = jax.value_and_grad(loss_explicit)(params)
    np.testing.assert_allclose(v_f, v_e, rtol=1e-5)
    flat_f, _ = jax.flatten_util.ravel_pytree(g_f)
    flat_e, _ = jax.flatten_util.ravel_pytree(g_e)
    scale = np.maximum(np.abs(flat_e).max(), 1e-3)
    np.testing.assert_allclose(flat_f / scale, flat_e / scale, atol=2e-5)


def test_analytic_fwd_grad_type_works_and_matches():
    """grad_type='analytic_fwd' must survive the encode's custom VJP
    (jax.jvp rejects custom_vjp functions -> the raw_autodiff scope) and
    agree with the fused analytic path, including reverse-over-forward
    for the eikonal-style training loss."""
    from intrinsicavatar_tpu.fields.geometry import VolumeSDF
    from intrinsicavatar_tpu.utils.config import wrap

    base = {
        "feature_dim": 13,
        "xyz_encoding_config": {
            "n_levels": 6, "log2_hashmap_size": 10, "base_resolution": 4,
            "per_level_scale": 1.9, "include_xyz": True,
        },
        "mlp_network_config": {
            "otype": "VanillaMLP", "n_neurons": 32, "n_hidden_layers": 1,
            "sphere_init": True, "weight_norm": True,
        },
    }
    geos = {}
    for mode in ("analytic", "analytic_fwd"):
        cfg = wrap({**base, "grad_type": mode})
        geo = VolumeSDF(cfg)
        geo.prepare_bbox(np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]]))
        geos[mode] = geo
    params = geos["analytic"].init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (65, 3)) * 0.4

    out = {}
    for mode, geo in geos.items():
        def loss(params, geo=geo):
            sdf, grad, feat = geo.sdf_grad_feature(params, x, jnp.ones(12))
            return (jnp.sum((jnp.linalg.norm(grad, axis=-1) - 1.0) ** 2)
                    + jnp.sum(sdf ** 2))
        out[mode] = jax.value_and_grad(loss)(params)
    v_a, g_a = out["analytic"]
    v_f, g_f = out["analytic_fwd"]
    np.testing.assert_allclose(float(v_f), float(v_a), rtol=1e-5)
    fa, _ = jax.flatten_util.ravel_pytree(g_a)
    ff, _ = jax.flatten_util.ravel_pytree(g_f)
    np.testing.assert_allclose(np.asarray(ff), np.asarray(fa),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("include_xyz", [False, True])
def test_encode_custom_vjp_matches_autodiff(include_xyz):
    """hashgrid_encode's custom VJP (sort-aggregated table grad + closed-
    form input grad) vs XLA autodiff of hashgrid_encode_raw."""
    spec, mlp, table, mlp_params, x, mask = _setup(include_xyz, True)
    a = jnp.linspace(0.5, 1.5, spec.n_output_dims)

    def loss(enc_fn, table, x):
        return jnp.sum(jnp.sin(enc_fn(table, x, spec, mask) @ a))

    g_c = jax.grad(lambda t, x: loss(hashgrid_encode, t, x),
                   argnums=(0, 1))(table, x)
    g_r = jax.grad(lambda t, x: loss(hashgrid_encode_raw, t, x),
                   argnums=(0, 1))(table, x)
    for gc, gr, name in zip(g_c, g_r, ["table", "x"]):
        scale = np.maximum(np.abs(np.asarray(gr)).max(), 1e-3)
        np.testing.assert_allclose(np.asarray(gc) / scale,
                                   np.asarray(gr) / scale, atol=3e-6,
                                   err_msg=name)


def test_aggregate_rows_matches_scatter():
    from intrinsicavatar_tpu.ops.scatter import aggregate_rows
    key = jax.random.PRNGKey(3)
    idx = jax.random.randint(key, (5000,), 0, 257)
    vals = jax.random.normal(jax.random.fold_in(key, 1), (5000, 3))
    ref = jnp.zeros((257, 3)).at[idx].add(vals)
    got = aggregate_rows(idx, vals, 257, method="sort")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    got2 = aggregate_rows(idx, vals, 257, method="scatter")
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref), atol=1e-6)
