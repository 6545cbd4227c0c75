"""Core scalar/vector math used across the framework (pure jnp).

Semantics mirror the reference implementation's helpers
(`models/utils.py`, `models/rf/density.py`, `systems/criterions.py` in
taconite/IntrinsicAvatar) but are written masked/branch-free for XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Pad-free channel access.
#
# The XLA:TPU backend in this environment SIGILLs (fusion cost model) when
# the *backward* of a trailing-dim slice — a `pad` op — fuses with
# matmul/gather backwards.  On any tensor that carries gradients, extract or
# split channels with these one-hot/selector contractions instead of
# slicing: `x @ e_i` is mathematically identical to `x[..., i]` but its
# backward is a broadcast multiply, not a pad.  (Round-1 bisection:
# `mean(mlp(enc)[..., 0])` crashes the compiler; `mean(mlp(enc) @ e0)` is
# fine.)  Slices of non-differentiated tensors are unaffected.
# ---------------------------------------------------------------------------

def take_channel(x: "jax.Array", i: int) -> "jax.Array":
    """``x[..., i]`` without a slice: one-hot contraction (pad-free VJP)."""
    C = x.shape[-1]
    e = np.zeros((C,), np.float32)
    e[i] = 1.0
    return x @ jnp.asarray(e, x.dtype)


def split_channels(x: "jax.Array", sizes) -> list:
    """Split the trailing dim into chunks via selector matmuls (pad-free VJP).

    ``split_channels(x, [3, 1, 1])`` == ``[x[..., :3], x[..., 3:4],
    x[..., 4:5]]`` with safe backward.
    """
    C = x.shape[-1]
    outs = []
    o = 0
    for s in sizes:
        S = np.zeros((C, s), np.float32)
        S[o:o + s] = np.eye(s, dtype=np.float32)
        outs.append(x @ jnp.asarray(S, x.dtype))
        o += s
    return outs


def vec3_components(v: "jax.Array"):
    """``(v_x, v_y, v_z)`` of a differentiated ``[..., 3]`` without slices."""
    return take_channel(v, 0), take_channel(v, 1), take_channel(v, 2)


def cross3(a: "jax.Array", b: "jax.Array") -> "jax.Array":
    """Pad-free cross product of ``[..., 3]`` vectors (jnp.cross slices)."""
    ax, ay, az = vec3_components(a)
    bx, by, bz = vec3_components(b)
    return jnp.stack([ay * bz - az * by,
                      az * bx - ax * bz,
                      ax * by - ay * bx], axis=-1)


# ---------------------------------------------------------------------------
# Basic vector helpers (reference: models/utils.py:111-116)
# ---------------------------------------------------------------------------

def dot(x: jax.Array, y: jax.Array) -> jax.Array:
    """Row-wise dot product, keepdims. ``[..., D] x [..., D] -> [..., 1]``."""
    return jnp.sum(x * y, axis=-1, keepdims=True)


def reflect(x: jax.Array, n: jax.Array) -> jax.Array:
    """Reflect direction ``x`` (pointing away from surface) about normal ``n``."""
    return 2.0 * dot(x, n) * n - x


def safe_normalize(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """L2-normalize along the last axis, guarding zero vectors.

    Matches ``F.normalize(x, p=2, dim=-1, eps=1e-6)`` semantics: divides by
    ``max(||x||, eps)``.
    """
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(norm, eps)


def scale_anything(x, inp_scale, tgt_scale):
    """Affine rescale from ``inp_scale=[lo,hi]`` to ``tgt_scale=[lo,hi]``."""
    x = (x - inp_scale[0]) / (inp_scale[1] - inp_scale[0])
    return x * (tgt_scale[1] - tgt_scale[0]) + tgt_scale[0]


# ---------------------------------------------------------------------------
# sRGB <-> linear (reference: models/utils.py lin2srgb + torch_pbr.rgb_to_srgb)
# ---------------------------------------------------------------------------

def linear_to_srgb(x: jax.Array) -> jax.Array:
    """Linear RGB -> sRGB with the piecewise IEC 61966-2-1 transfer curve,

    clamped to [0, 1] (reference ``get_activation('lin2srgb')``,
    `models/utils.py:96`).
    """
    srgb = jnp.where(
        x > 0.0031308,
        jnp.power(jnp.clip(x, min=0.0031308), 1.0 / 2.4) * 1.055 - 0.055,
        12.92 * x,
    )
    return jnp.clip(srgb, 0.0, 1.0)


def srgb_to_linear(x: jax.Array) -> jax.Array:
    """Inverse of :func:`linear_to_srgb` (without the output clamp)."""
    return jnp.where(
        x > 0.04045,
        jnp.power((jnp.clip(x, min=0.04045) + 0.055) / 1.055, 2.4),
        x / 12.92,
    )


def luminance(rgb: jax.Array) -> jax.Array:
    """Rec.709 luminance of linear RGB, keepdims ``[..., 3] -> [..., 1]``."""
    w = jnp.asarray([0.2126, 0.7152, 0.0722], dtype=rgb.dtype)
    return jnp.sum(rgb * w, axis=-1, keepdims=True)


def luma(rgb: jax.Array) -> jax.Array:
    """Rec.601 luma used for demodulated radiance (torch_pbr ``luma``)."""
    w = jnp.asarray([0.299, 0.587, 0.114], dtype=rgb.dtype)
    return jnp.sum(rgb * w, axis=-1, keepdims=True)


def max_value(rgb: jax.Array) -> jax.Array:
    """Per-pixel max over channels, keepdims (torch_pbr ``max_value``)."""
    return jnp.max(rgb, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Truncated exp (reference: models/utils.py:64-79)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def trunc_exp(x):
    """``exp(x)`` whose gradient is computed with ``x`` clamped at 15."""
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, max=15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


# ---------------------------------------------------------------------------
# Activation registry (reference: models/utils.py:82-108)
# ---------------------------------------------------------------------------

def get_activation(name):
    """String-keyed activation lookup matching the reference registry."""
    if name is None:
        return lambda x: x
    name = str(name).lower()
    if name == "none":
        return lambda x: x
    if name.startswith("scale"):
        s = float(name[5:])
        return lambda x: jnp.clip(x, 0.0, s) / s
    if name.startswith("clamp"):
        c = float(name[5:])
        return lambda x: jnp.clip(x, 0.0, c)
    if name.startswith("mul"):
        m = float(name[3:])
        return lambda x: x * m
    if name == "lin2srgb":
        return linear_to_srgb
    if name == "trunc_exp":
        return trunc_exp
    if name.startswith("+") or name.startswith("-"):
        v = float(name)
        return lambda x: x + v
    if name == "sigmoid":
        return jax.nn.sigmoid
    if name == "tanh":
        return jnp.tanh
    if name == "relu":
        return jax.nn.relu
    if name == "softplus":
        return jax.nn.softplus
    if name == "exp":
        return jnp.exp
    raise ValueError(f"unknown activation {name!r}")


# ---------------------------------------------------------------------------
# Rodrigues / rotations
# ---------------------------------------------------------------------------

def rodrigues(rot_vecs: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Axis-angle ``[..., 3]`` -> rotation matrices ``[..., 3, 3]``.

    Matches SMPL's ``batch_rodrigues`` (reference
    `models/deformers/smplx/lbs.py`), branch-free at angle ~ 0.
    """
    angle = jnp.linalg.norm(rot_vecs + eps, axis=-1, keepdims=True)  # [...,1]
    axis = rot_vecs / angle
    cos = jnp.cos(angle)[..., None]  # [...,1,1]
    sin = jnp.sin(angle)[..., None]

    rx, ry, rz = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=-1
    ).reshape(*rot_vecs.shape[:-1], 3, 3)
    eye = jnp.eye(3, dtype=rot_vecs.dtype)
    outer = axis[..., :, None] * axis[..., None, :]
    return cos * eye + (1.0 - cos) * outer + sin * K


def transform_mat(R: jax.Array, t: jax.Array) -> jax.Array:
    """Build ``[..., 4, 4]`` homogeneous transforms from ``[...,3,3]`` + ``[...,3]``."""
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)  # [...,3,4]
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=R.dtype),
        (*R.shape[:-2], 1, 4),
    )
    return jnp.concatenate([top, bottom], axis=-2)


def rigid_inverse(T: jax.Array) -> jax.Array:
    """Invert ``[..., 4, 4]`` rigid transforms analytically (R^T, -R^T t)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", Rt, t)
    return transform_mat(Rt, ti)


def apply_homogeneous(T: jax.Array, x: jax.Array) -> jax.Array:
    """Apply ``[..., 4, 4]`` (or ``[...,3,4]``) transforms to points ``[..., 3]``."""
    return jnp.einsum("...ij,...j->...i", T[..., :3, :3], x) + T[..., :3, 3]


# ---------------------------------------------------------------------------
# Soft histogram (reference: models/utils.py:133-147, used by albedo entropy)
# ---------------------------------------------------------------------------

def gaussian_histogram(x: jax.Array, bins: int, lo: float, hi: float,
                       sigma: jax.Array) -> jax.Array:
    """Soft (Gaussian-kernel) histogram of ``x`` flattened, returns ``[bins]``."""
    delta = float(hi - lo) / float(bins)
    centers = lo + delta * (jnp.arange(bins, dtype=x.dtype) + 0.5)
    d = x[None, :] - centers[:, None]
    k = jnp.exp(-0.5 * (d / sigma) ** 2) / (sigma * jnp.sqrt(2.0 * jnp.pi)) * delta
    return jnp.sum(k, axis=1)


def compute_albedo_rescale_factor(gt_albedo, pred_albedo, mask):
    """Per-channel least-squares scale aligning prediction to GT.

    Reference: `models/utils.py:268-277`.  ``mask`` is a boolean weight on
    rows; computed as ``sum(x * x_hat) / sum(x_hat^2)`` per channel.
    """
    m = mask.astype(gt_albedo.dtype)[..., None]
    num = jnp.sum(gt_albedo * pred_albedo * m, axis=tuple(range(gt_albedo.ndim - 1)))
    den = jnp.sum(pred_albedo * pred_albedo * m, axis=tuple(range(gt_albedo.ndim - 1)))
    return num / jnp.maximum(den, 1e-12)
