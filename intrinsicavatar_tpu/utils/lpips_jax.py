"""LPIPS (VGG16) in pure JAX.

Architecture-exact implementation of the LPIPS-VGG metric the reference
evaluates with (`systems/criterions.py:105-126` in taconite/IntrinsicAvatar,
via the ``lpips`` pip package): VGG16 conv features at relu{1_2, 2_2, 3_3,
4_3, 5_3}, per-channel unit normalization, learned 1x1 linear heads, spatial
mean, layer sum.  Inputs are HWC RGB in [0, 1].

Weights are NOT bundled (this build environment has no network egress and
no cached torchvision/lpips checkpoints — see BASELINE.md "Protocol
deviations").  Provide them as an ``.npz`` produced by
``scripts/convert_lpips_weights.py`` on any machine with the published
checkpoints, via the ``INTRINSICAVATAR_LPIPS_WEIGHTS`` env var or an
explicit path.  npz keys::

    conv{i}_w  [kh, kw, cin, cout]   (i = 0..12, VGG16 order)
    conv{i}_b  [cout]
    lin{j}_w   [c_j]                 (j = 0..4, LPIPS linear heads)
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 configuration: output channels per conv, 'M' = 2x2 max pool
_VGG16 = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
          512, 512, 512, "M", 512, 512, 512]
# indices (into the conv-only sequence) after whose relu LPIPS taps features
_TAPS = (1, 3, 6, 9, 12)

# LPIPS input normalization (the package's scaling_layer constants)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def load_weights(path: str | None = None):
    """Load the npz weight bundle; returns None when unavailable."""
    path = path or os.environ.get("INTRINSICAVATAR_LPIPS_WEIGHTS")
    if not path or not os.path.exists(path):
        return None
    z = np.load(path)
    params = {"convs": [], "lins": []}
    for i in range(13):
        params["convs"].append((jnp.asarray(z[f"conv{i}_w"]),
                                jnp.asarray(z[f"conv{i}_b"])))
    for j in range(5):
        params["lins"].append(jnp.asarray(z[f"lin{j}_w"]))
    return params


def _vgg_features(params, x):
    """``x`` [B, H, W, 3] in [-1, 1] -> list of 5 tap feature maps."""
    x = (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
    feats = []
    ci = 0
    for spec in _VGG16:
        if spec == "M":
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID")
            continue
        w, b = params["convs"][ci]
        x = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        x = jax.nn.relu(x)
        if ci in _TAPS:
            feats.append(x)
        ci += 1
    return feats


def _unit_norm(f, eps=1e-10):
    return f / jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True) + eps)


def lpips_distance(params, img0, img1):
    """LPIPS distance between ``[B, H, W, 3]`` images in [-1, 1]."""
    f0 = _vgg_features(params, img0)
    f1 = _vgg_features(params, img1)
    total = 0.0
    for j, (a, b) in enumerate(zip(f0, f1)):
        d = (_unit_norm(a) - _unit_norm(b)) ** 2       # [B, H, W, C]
        lin = params["lins"][j]                        # [C]
        total = total + jnp.mean(jnp.sum(d * lin, -1), axis=(1, 2))
    return total


def lpips_fn(path: str | None = None):
    """Returns ``f(pred_hwc01, gt_hwc01) -> float`` or None w/o weights."""
    params = load_weights(path)
    if params is None:
        return None
    jitted = jax.jit(lambda a, b: lpips_distance(params, a, b))

    def compute(pred, gt):
        a = jnp.asarray(np.asarray(pred, np.float32))[None] * 2.0 - 1.0
        b = jnp.asarray(np.asarray(gt, np.float32))[None] * 2.0 - 1.0
        return float(jitted(a, b)[0])

    return compute


def random_params(key, dtype=jnp.float32):
    """Random-weight parameter bundle (structure tests only — NOT LPIPS)."""
    params = {"convs": [], "lins": []}
    cin = 3
    taps_c = []
    for spec in _VGG16:
        if spec == "M":
            continue
        key, k1 = jax.random.split(key)
        w = jax.random.normal(k1, (3, 3, cin, spec), dtype) \
            * (1.0 / np.sqrt(9 * cin))
        params["convs"].append((w, jnp.zeros((spec,), dtype)))
        cin = spec
    for i in _TAPS:
        taps_c.append(params["convs"][i][0].shape[-1])
    for c in taps_c:
        key, k1 = jax.random.split(key)
        params["lins"].append(jax.random.uniform(k1, (c,), dtype))
    return params
