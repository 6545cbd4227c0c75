"""Input encodings: frequency, spherical harmonics, IDE, progressive masks.

TPU-native equivalents of the encodings used by the reference
(`models/network_utils.py:15-176` + tcnn ``SphericalHarmonics`` in
taconite/IntrinsicAvatar).  All progressive coarse-to-fine schedules are pure
functions of ``global_step`` returning mask arrays, so a jitted train step can
take the step as a traced input instead of mutating module state.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Frequency (NeRF positional) encoding with annealed band mask
# ---------------------------------------------------------------------------

def frequency_encode(x: jax.Array, n_frequencies: int, mask: jax.Array | None = None,
                     x_scale: float = 1.0, x_offset: float = 0.0) -> jax.Array:
    """NeRF positional encoding ``[sin(2^k x), cos(2^k x)]_k``.

    Matches ``VanillaFrequency`` (`models/network_utils.py:15-55`): output
    ordering is per-frequency ``(sin, cos)`` over all input channels,
    optionally weighted by a per-frequency ``mask``.
    Output dim = ``in_dim * 2 * n_frequencies``.
    """
    x = x * x_scale + x_offset
    freqs = 2.0 ** jnp.arange(n_frequencies, dtype=x.dtype)
    xb = x[..., None, :] * freqs[:, None]                     # [..., F, D]
    enc = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2)      # [..., F, 2, D]
    if mask is not None:
        enc = enc * mask[:, None, None]
    return enc.reshape(*x.shape[:-1], -1)


def frequency_mask(global_step, n_frequencies: int, n_masking_step: int,
                   start_step: int = 0) -> jax.Array:
    """Cosine-annealed frequency mask (`models/network_utils.py:40-55`)."""
    if n_masking_step <= 0:
        return jnp.ones((n_frequencies,), jnp.float32)
    step = jnp.maximum(jnp.asarray(global_step, jnp.float32) - start_step, 0.0)
    ptr = step / n_masking_step * n_frequencies - jnp.arange(n_frequencies)
    return (1.0 - jnp.cos(jnp.pi * jnp.clip(ptr, 0.0, 1.0))) / 2.0


# ---------------------------------------------------------------------------
# Progressive level masks (hash grid + SH bands)
# ---------------------------------------------------------------------------

def hashgrid_level_mask(global_step, n_levels: int, n_features_per_level: int,
                        start_level: int, start_step: int, update_steps: int,
                        smooth: bool = False, full_band_step: int = 5000) -> jax.Array:
    """Per-feature mask unlocking hash-grid levels coarse-to-fine.

    Matches ``ProgressiveBandHashGrid.update_step``
    (`models/network_utils.py:81-100`): stepwise mode unlocks one level every
    ``update_steps`` steps starting from ``start_level`` at ``start_step``;
    smooth mode cosine-fades levels over ``[start_step, full_band_step]``.
    Returns ``[n_levels * n_features_per_level]`` float mask.
    """
    step = jnp.asarray(global_step, jnp.float32)
    lvl = jnp.arange(n_levels, dtype=jnp.float32)
    if smooth:
        t = jnp.maximum(step - start_step, 0.0)
        alpha = n_levels * t / max(full_band_step - start_step, 1)
        w = (1.0 - jnp.cos(jnp.pi * jnp.clip(alpha - lvl, 0.0, 1.0))) / 2.0
    else:
        current = jnp.minimum(
            start_level + jnp.maximum(step - start_step, 0.0) // update_steps,
            n_levels,
        )
        w = (lvl < current).astype(jnp.float32)
    return jnp.repeat(w, n_features_per_level)


def sh_band_mask(global_step, degree: int, start_step: int,
                 full_band_step: int) -> jax.Array:
    """Progressive SH band mask (`models/rf/radiance.py:137-155`).

    Band ``d`` (size ``2d+1``) cosine-fades in as
    ``alpha = degree * (step - start) / (full - start)`` passes ``d``.
    Returns ``[degree**2]`` float mask.
    """
    step = jnp.asarray(global_step, jnp.float32)
    t = jnp.maximum(step - start_step, 0.0)
    alpha = degree * t / max(full_band_step - start_step, 1)
    degs = jnp.arange(degree, dtype=jnp.float32)
    w = (1.0 - jnp.cos(jnp.pi * jnp.clip(alpha - degs, 0.0, 1.0))) / 2.0
    return jnp.repeat(w, np.arange(degree) * 2 + 1, total_repeat_length=degree**2)


# ---------------------------------------------------------------------------
# Spherical harmonics (degree 4 -> 16 coefficients, tcnn component order)
# ---------------------------------------------------------------------------

def spherical_harmonics(dirs: jax.Array, degree: int = 4) -> jax.Array:
    """Real SH basis evaluated at unit directions, bands l=0..degree-1.

    Equivalent of tcnn ``SphericalHarmonics`` (used at
    `configs/radiance/progressive_hash_grid.yaml` with degree 4).  tcnn takes
    inputs in [0,1] and internally maps to [-1,1]; here ``dirs`` are the unit
    directions directly.  Component order is (l ascending, m from -l to l),
    matching the ``sh_mask`` band layout of `models/rf/radiance.py:146-155`.
    """
    from intrinsicavatar_tpu.ops.math import vec3_components
    x, y, z = vec3_components(dirs)   # pad-free: dirs may carry gradients
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    comps = [jnp.full_like(x, 0.28209479177387814)]
    if degree > 1:
        comps += [
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
        ]
    if degree > 2:
        comps += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * zz - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * (xx - yy),
        ]
    if degree > 3:
        comps += [
            0.59004358992664352 * y * (-3.0 * xx + yy),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * zz),
            0.3731763325901154 * z * (5.0 * zz - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * zz),
            1.4453057213202769 * z * (xx - yy),
            0.59004358992664352 * x * (-xx + 3.0 * yy),
        ]
    if degree > 4:
        raise NotImplementedError("SH degree > 4 not needed by the reference")
    return jnp.stack(comps, axis=-1)


# ---------------------------------------------------------------------------
# Integrated directional encoding (RefNeRF IDE)
# ---------------------------------------------------------------------------

def _generalized_binomial_coeff(a, k):
    return np.prod(a - np.arange(k)) / math.factorial(k)


def _assoc_legendre_coeff(l, m, k):
    """Coefficient of cos^k sin^m in P_l^m (reference models/utils.py:176-196)."""
    return (
        (-1) ** m
        * 2**l
        * math.factorial(l)
        / math.factorial(k)
        / math.factorial(l - k - m)
        * _generalized_binomial_coeff(0.5 * (l + k + m - 1.0), l)
    )


def _sph_harm_coeff(l, m, k):
    return np.sqrt(
        (2.0 * l + 1.0) * math.factorial(l - m)
        / (4.0 * np.pi * math.factorial(l + m))
    ) * _assoc_legendre_coeff(l, m, k)


def _ide_tables(degree: int):
    """Precompute the (m,l) list and z-Vandermonde coefficient matrix."""
    ml_list = []
    for i in range(degree):
        l = 2**i
        for m in range(l + 1):
            ml_list.append((m, l))
    ml = np.array(ml_list).T                     # [2, C]
    l_max = 2 ** (degree - 1)
    mat = np.zeros((l_max + 1, ml.shape[1]), np.float32)
    for i, (m, l) in enumerate(ml.T):
        for k in range(l - m + 1):
            mat[k, i] = _sph_harm_coeff(l, m, k)
    return ml.astype(np.float32), mat


def integrated_directional_encoding(dirs: jax.Array, kappa_inv: jax.Array,
                                    degree: int = 5) -> jax.Array:
    """RefNeRF IDE: vMF-attenuated SH of l = 1,2,4,...,2^(degree-1).

    Matches ``IntegratedDirectionalEncoding``
    (`models/network_utils.py:103-153`); output dim = 2 * #(m,l) pairs
    (real and imaginary parts).
    """
    ml, mat = _ide_tables(degree)
    m_arr = jnp.asarray(ml[0])
    l_arr = jnp.asarray(ml[1])
    mat = jnp.asarray(mat)

    x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
    vmz = jnp.concatenate([z**i for i in range(mat.shape[0])], axis=-1)
    xiy = jax.lax.complex(x, y)
    vmxy = jnp.concatenate([xiy ** int(m) for m in np.asarray(ml[0])], axis=-1)
    sph = vmxy * jnp.einsum("...i,ij->...j", vmz, mat)
    sigma = 0.5 * l_arr * (l_arr + 1.0)
    ide = sph * jnp.exp(-sigma * kappa_inv)
    return jnp.concatenate([jnp.real(ide), jnp.imag(ide)], axis=-1)
