"""Rectangular masked volume-rendering primitives.

TPU-native replacements for the packed-sample kernels of nerfacc 0.5.3
(`render_weight_from_alpha`, `accumulate_along_rays`,
`render_visibility_from_alpha` — imported by the reference at
`models/intrinsic_avatar.py:20-28` and `models/volrend.py:10-14`).

Layout convention used framework-wide: samples along each ray live in a fixed
rectangular tensor ``[n_rays, S]`` with a boolean ``mask`` marking valid
samples.  Transmittance scans become exclusive cumulative products and
accumulation becomes a masked sum — both fuse trivially under XLA, and the
backward pass of ``cumprod`` is handled by autodiff (the reference needs a
hand-written CUDA backward for the packed inclusive scan).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def laplace_density(sdf: jax.Array, beta: jax.Array) -> jax.Array:
    """VolSDF Laplace-CDF density.

    ``alpha_vs * Laplace(0, beta).cdf(-sdf)`` with ``alpha_vs = 1/beta``,
    written via ``expm1`` for numerical stability exactly as the reference
    (`models/rf/density.py:25-34`):

        density = (1/beta) * (0.5 + 0.5 * sign(sdf) * expm1(-|sdf|/beta))
    """
    return jnp.reciprocal(beta) * (
        0.5 + 0.5 * jnp.sign(sdf) * jnp.expm1(-jnp.abs(sdf) / beta)
    )


def alpha_from_sdf(sdf: jax.Array, dists: jax.Array, beta: jax.Array) -> jax.Array:
    """Per-interval opacity ``1 - exp(-density(sdf) * dist)``.

    Reference: `models/intrinsic_avatar.py:390-394` (``get_alpha``).
    """
    return 1.0 - jnp.exp(-laplace_density(sdf, beta) * dists)


def exclusive_prod(x: jax.Array, axis: int = -1) -> jax.Array:
    """Exclusive cumulative product along ``axis`` (first element = 1).

    Shift by roll + masked overwrite instead of slice+concat: the
    slice-backward pad on a differentiated minor dim crashes the TPU
    fusion pass (see ops.math.take_channel).
    """
    p = jnp.cumprod(x, axis=axis)
    rolled = jnp.roll(p, 1, axis=axis)
    n = x.shape[axis]
    first = jax.lax.broadcasted_iota(
        jnp.int32, x.shape, axis % x.ndim) == 0
    return jnp.where(first, jnp.ones_like(p), rolled)


def render_weight_from_alpha(
    alphas: jax.Array, mask: Optional[jax.Array] = None
):
    """Volume-rendering weights from per-interval alphas.

    ``w_i = alpha_i * prod_{j<i} (1 - alpha_j)`` over valid samples, masked
    samples contribute nothing and do not attenuate.  Replaces nerfacc's
    packed ``render_weight_from_alpha``.

    Args:
      alphas: ``[..., S]`` in [0, 1).
      mask:   optional ``[..., S]`` bool validity.

    Returns:
      ``(weights, trans)`` each ``[..., S]`` — ``trans`` is the transmittance
      *before* each sample.
    """
    if mask is not None:
        alphas = jnp.where(mask, alphas, 0.0)
    trans = exclusive_prod(1.0 - alphas, axis=-1)
    weights = alphas * trans
    return weights, trans


def render_visibility_from_alpha(
    alphas: jax.Array,
    mask: Optional[jax.Array] = None,
    early_stop_eps: float = 1e-4,
) -> jax.Array:
    """Boolean visibility: transmittance before the sample > ``early_stop_eps``.

    Replaces nerfacc ``render_visibility_from_alpha``; used to prune samples
    behind an opaque surface.
    """
    _, trans = render_weight_from_alpha(alphas, mask)
    vis = trans > early_stop_eps
    if mask is not None:
        vis = vis & mask
    return vis


def accumulate_along_rays(
    weights: jax.Array,
    values: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Weighted sum of per-sample values along the sample axis.

    Replaces nerfacc ``accumulate_along_rays`` (a segment-sum over packed
    samples) with a masked reduction.

    Args:
      weights: ``[..., S]``.
      values:  ``[..., S, C]`` or None (accumulates the weights themselves,
               producing opacity ``[..., 1]``).
      mask:    optional ``[..., S]`` bool.

    Returns:
      ``[..., C]`` (or ``[..., 1]`` when ``values`` is None).
    """
    if mask is not None:
        weights = jnp.where(mask, weights, 0.0)
    if values is None:
        return jnp.sum(weights, axis=-1, keepdims=True)
    return jnp.einsum("...s,...sc->...c", weights, values)


def rays_alive(mask: jax.Array) -> jax.Array:
    """Per-ray bool: does the ray have any valid sample. ``[..., S] -> [...]``."""
    return jnp.any(mask, axis=-1)


def distortion_loss(
    weights: jax.Array,
    t_starts: jax.Array,
    t_ends: jax.Array,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Mip-NeRF 360 distortion loss over rectangular samples.

    Equivalent of ``torch_efficient_distloss.flatten_eff_distloss`` used by
    the reference (`systems/intrinsic_avatar.py:9`, weight defaults to 0).
    Computed per ray then averaged over rays with any valid sample.
    """
    if mask is not None:
        weights = jnp.where(mask, weights, 0.0)
    mids = 0.5 * (t_starts + t_ends)
    intervals = t_ends - t_starts
    # Pairwise term: sum_ij w_i w_j |m_i - m_j| ; O(S^2) per ray but S is small.
    dm = jnp.abs(mids[..., :, None] - mids[..., None, :])
    loss_inter = jnp.sum(weights[..., :, None] * weights[..., None, :] * dm, axis=(-1, -2))
    loss_intra = jnp.sum(weights**2 * intervals, axis=-1) / 3.0
    per_ray = loss_inter + loss_intra
    if mask is not None:
        alive = rays_alive(mask)
        denom = jnp.maximum(jnp.sum(alive), 1)
        return jnp.sum(jnp.where(alive, per_ray, 0.0)) / denom
    return jnp.mean(per_ray)
