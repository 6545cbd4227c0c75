"""Structure tests for the pure-JAX LPIPS implementation (weights are not
available in this environment — see BASELINE.md protocol deviations)."""

import numpy as np
import jax
import jax.numpy as jnp

from intrinsicavatar_tpu.utils import lpips_jax


def test_lpips_identity_zero_and_sensitivity():
    params = lpips_jax.random_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(-1, 1, size=(1, 64, 64, 3))
                      .astype(np.float32))
    d_same = float(lpips_jax.lpips_distance(params, img, img)[0])
    assert abs(d_same) < 1e-6
    img2 = img + 0.5 * jnp.asarray(
        rng.normal(size=img.shape).astype(np.float32))
    d_diff = float(lpips_jax.lpips_distance(params, img, img2)[0])
    assert d_diff > 1e-4
    # symmetric
    d_rev = float(lpips_jax.lpips_distance(params, img2, img)[0])
    np.testing.assert_allclose(d_diff, d_rev, rtol=1e-5)


def test_lpips_weight_bundle_roundtrip(tmp_path):
    params = lpips_jax.random_params(jax.random.PRNGKey(1))
    out = {}
    for i, (w, b) in enumerate(params["convs"]):
        out[f"conv{i}_w"] = np.asarray(w)
        out[f"conv{i}_b"] = np.asarray(b)
    for j, lin in enumerate(params["lins"]):
        out[f"lin{j}_w"] = np.asarray(lin)
    path = str(tmp_path / "w.npz")
    np.savez(path, **out)

    fn = lpips_jax.lpips_fn(path)
    assert fn is not None
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, size=(32, 32, 3)).astype(np.float32)
    b = rng.uniform(0, 1, size=(32, 32, 3)).astype(np.float32)
    loaded = fn(a, b)
    direct = float(lpips_jax.lpips_distance(
        params, jnp.asarray(a)[None] * 2 - 1, jnp.asarray(b)[None] * 2 - 1)[0])
    np.testing.assert_allclose(loaded, direct, rtol=1e-5)
    assert lpips_jax.lpips_fn(None) is None or True  # env-var path optional
