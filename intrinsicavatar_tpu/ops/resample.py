"""Inverse-CDF ray resampling with SDF zero-crossing pinning.

TPU-native re-implementations of the reference's four CUDA resampling kernels
(`lib/nerfacc/cuda/csrc/cdf.cu` in taconite/IntrinsicAvatar):

  * :func:`cdf_resample`       — `cdf_resampling_kernel` (cdf.cu:10-148):
    scattering-point sampling with an implicit background bin and surface
    pinning (Sec. 3.4 of the IntrinsicAvatar paper).
  * :func:`merge_resample`     — `cdf_resampling_merge_kernel` (cdf.cu:218-333):
    importance upsampling that merges new samples into an existing sorted
    edge list, flagging which outputs are new so only they are re-queried.
  * :func:`fine_resample`      — `cdf_resampling_fine_kernel` (cdf.cu:404-534):
    standard n+1-point inverse-CDF interval resampling.
  * :func:`sdf_fine_resample`  — `cdf_resampling_sdf_fine_kernel`
    (cdf.cu:537-638): finds the first SDF zero-crossing then importance
    samples onward from it using running transmittance.

The CUDA kernels are one-thread-per-ray serial scans over ragged packed
samples.  Here every ray owns a fixed-width slot array (``[S]`` values plus a
validity mask, valid entries left-packed and sorted by t) and the serial scan
becomes ``cumsum`` + ``searchsorted``, vmapped over rays — rectangular,
static-shaped, and MXU/VPU friendly.

All functions in this module operate on a single ray; use the ``*_rays``
wrappers (plain ``jax.vmap``) for batches.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

BG_OFFSET = 10000.0  # background sample t offset (cdf.cu:131)


def _uniform_bins(n_bins: int, dtype=jnp.float32) -> jax.Array:
    """The kernels' stratified CDF positions.

    ``u_k = 1/(2B) + k * (1 - 1/B) / (B - 1)`` for ``k = 0..B-1`` — evenly
    spaced from ``1/(2B)`` to ``1 - 1/(2B)`` (cdf.cu:53-58).
    """
    if n_bins == 1:
        return jnp.asarray([0.5], dtype=dtype)
    k = jnp.arange(n_bins, dtype=dtype)
    step = (1.0 - 1.0 / n_bins) / (n_bins - 1)
    return 1.0 / (2.0 * n_bins) + k * step


class CdfResampleOut(NamedTuple):
    ts: jax.Array            # [B] sampled t values (pinned at the surface)
    offsets: jax.Array       # [B] offset of each sample inside its interval
    indices: jax.Array       # [B] source interval index of each sample
    is_bg: jax.Array         # [B] bool, True for background-bin samples
    fg_counts: jax.Array     # [S] int32, samples landing in each interval
    bg_count: jax.Array      # [] int32, samples in the background bin
    surface_idx: jax.Array   # [] int32, crossing interval index or -1


def cdf_resample(
    t_starts: jax.Array,
    t_ends: jax.Array,
    weights: jax.Array,
    sdfs: jax.Array,
    mask: jax.Array,
    n_samples: int,
) -> CdfResampleOut:
    """Stratified inverse-CDF draw of scattering points with surface pinning.

    Semantics of `cdf_resampling_kernel` (cdf.cu:10-148):

    * The weight CDF is **not** normalized to the foreground: an implicit
      background bin of mass ``max(1 - sum(w), 0)`` is appended, so samples
      whose stratified position exceeds the foreground mass become background
      samples at ``t = last_end + BG_OFFSET``.
    * ``sdfs[i]`` is the SDF at sample/interval ``i``; the first interval with
      ``sdf_i >= 0 and sdf_{i+1} < 0`` is the zero-crossing interval.  Samples
      inside it whose linearly-interpolated SDF would be negative — and all
      foreground samples in later intervals — are pinned to the t of the last
      sample in front of the surface (repeating its position), so no
      scattering point is placed inside the body.

    Args (single ray; valid entries left-packed, sorted by t):
      t_starts, t_ends, weights, sdfs: ``[S]``.
      mask: ``[S]`` bool.
      n_samples: number of stratified samples B (static).
    """
    S = t_starts.shape[0]
    B = n_samples
    dtype = t_starts.dtype
    steps = jnp.sum(mask.astype(jnp.int32))
    has_any = steps > 0
    last = jnp.maximum(steps - 1, 0)

    w = jnp.where(mask, weights, 0.0)
    wsum_fg = jnp.sum(w)
    denom = wsum_fg + jnp.maximum(1.0 - wsum_fg, 0.0)
    cdf = jnp.cumsum(w) / denom                      # CDF at interval ends
    cdf_prev = cdf - w / denom
    fg_total = cdf[last]

    u = _uniform_bins(B, dtype)
    idx = jnp.searchsorted(cdf, u, side="right").astype(jnp.int32)
    idx = jnp.clip(idx, 0, last)
    is_bg = (u >= fg_total) | ~has_any

    seg = jnp.maximum(cdf[idx] - cdf_prev[idx], 1e-20)
    dist = t_ends[idx] - t_starts[idx]
    offset = (u - cdf_prev[idx]) * dist / seg
    t_raw = t_starts[idx] + offset

    # --- zero-crossing detection (interval i crosses if sdf_i>=0, sdf_{i+1}<0)
    nxt_mask = jnp.roll(mask, -1).at[-1].set(False)
    sdf_next = jnp.roll(sdfs, -1)
    crossing = mask & nxt_mask & (sdfs >= 0.0) & (sdf_next < 0.0)
    any_cross = jnp.any(crossing)
    cross_idx = jnp.where(any_cross, jnp.argmax(crossing), S + 1).astype(jnp.int32)

    # Samples inside the crossing interval: keep t only while interpolated SDF
    # stays non-negative (cdf.cu:76-88).
    sdf_lo = sdfs[idx]
    sdf_hi = sdf_next[idx]
    sdf_approx = sdf_lo + (sdf_hi - sdf_lo) * offset / jnp.maximum(dist, 1e-20)
    in_cross = idx == cross_idx
    beyond = idx > cross_idx
    pinned = (~is_bg) & (beyond | (in_cross & (sdf_approx < 0.0)))

    # Forward-fill pinned samples from the last unpinned one; the j==0
    # fallback is the start of that sample's interval (cdf.cu:85).
    t_bg = t_ends[last] + BG_OFFSET
    t_cand = jnp.where(is_bg, t_bg, t_raw)
    src = jnp.where(~pinned, jnp.arange(B), -1)
    src = jax.lax.associative_scan(jnp.maximum, src)
    ts = jnp.where(src >= 0, t_cand[jnp.maximum(src, 0)], t_starts[idx[0]])

    offsets = jnp.where(is_bg, BG_OFFSET, offset)
    indices = jnp.where(is_bg, last, idx)

    fg_counts = jnp.zeros((S,), jnp.int32).at[indices].add(
        jnp.where(is_bg, 0, 1), mode="drop"
    )
    bg_count = jnp.sum(is_bg.astype(jnp.int32))

    # surface_idx is recorded only when the serial scan advances *past* the
    # crossing interval (cdf.cu:113-118), i.e. some stratified position lies
    # beyond its CDF end.
    passed = any_cross & has_any & (u[-1] >= cdf[jnp.minimum(cross_idx, S - 1)])
    surface_idx = jnp.where(passed, cross_idx, -1).astype(jnp.int32)

    return CdfResampleOut(ts, offsets, indices, is_bg, fg_counts, bg_count,
                          surface_idx)


class MergeResampleOut(NamedTuple):
    vals: jax.Array          # [E+B] merged edge values (sorted; invalid = +inf)
    is_left: jax.Array       # [E+B] edge opens a sample interval
    is_right: jax.Array      # [E+B] edge closes a sample interval
    valid: jax.Array         # [E+B] slot validity (left-packed)
    is_new: jax.Array        # [E+B] slot came from resampling (needs re-query)
    gather_idx: jax.Array    # [E+B] index into concat(old[E], new[B]) producing
    #                          this layout — use to carry per-edge payloads.


def merge_resample(
    vals: jax.Array,
    is_left: jax.Array,
    is_right: jax.Array,
    valid: jax.Array,
    weights: jax.Array,
    n_samples: int,
) -> MergeResampleOut:
    """Merge ``n_samples`` inverse-CDF draws into a sorted edge list.

    Semantics of `cdf_resampling_merge_kernel` (cdf.cu:218-333).  The input is
    an *edge* representation: ``vals[i]``/``vals[i+1]`` bound sample interval
    ``i`` iff ``is_left[i] & is_right[i+1]`` (gaps between occupancy segments
    are not sample intervals).  ``weights[i]`` is the rendering weight of
    interval ``i``.  New samples are drawn from the unnormalized CDF (with
    implicit background mass); positions beyond the foreground mass are
    dropped (the kernel simply stops emitting).  Old edges are preserved
    verbatim; new edges get both flags set and ``is_new=True``.

    To carry any payload aligned with the old edges (e.g. cached SDF values)
    into the merged layout::

        carried = jnp.concatenate([payload_old, fill_B])[out.gather_idx]
    """
    E = vals.shape[0]
    B = n_samples
    dtype = vals.dtype
    steps = jnp.sum(valid.astype(jnp.int32))
    has_any = steps > 0
    last = jnp.maximum(steps - 1, 0)

    nxt_valid = jnp.roll(valid, -1).at[-1].set(False)
    nxt_right = jnp.roll(is_right, -1)
    real = valid & nxt_valid & is_left & nxt_right        # interval i is real
    w = jnp.where(real, weights, 0.0)
    wsum_fg = jnp.sum(w)
    denom = wsum_fg + jnp.maximum(1.0 - wsum_fg, 0.0)
    cdf = jnp.cumsum(w) / denom
    cdf_prev = cdf - w / denom
    fg_total = cdf[last]

    u = _uniform_bins(B, dtype)
    placed = (u < fg_total) & has_any
    idx = jnp.clip(jnp.searchsorted(cdf, u, side="right"), 0, last)

    t0 = vals[idx]
    t1 = vals[jnp.minimum(idx + 1, E - 1)]
    seg = jnp.maximum(cdf[idx] - cdf_prev[idx], 1e-20)
    t_new = t0 + (u - cdf_prev[idx]) * (t1 - t0) / seg

    inf = jnp.asarray(jnp.inf, dtype)
    all_vals = jnp.concatenate([jnp.where(valid, vals, inf),
                                jnp.where(placed, t_new, inf)])
    all_left = jnp.concatenate([is_left & valid, placed])
    all_right = jnp.concatenate([is_right & valid, placed])
    all_valid = jnp.concatenate([valid, placed])
    all_new = jnp.concatenate([jnp.zeros((E,), bool), placed])

    # Stable sort by t with old edges winning ties (the kernel advances to the
    # next edge before emitting a sample at an equal CDF position).
    order = jnp.lexsort((all_new.astype(jnp.int32), all_vals))
    return MergeResampleOut(
        vals=all_vals[order],
        is_left=all_left[order],
        is_right=all_right[order],
        valid=all_valid[order],
        is_new=all_new[order],
        gather_idx=order,
    )


class FineResampleOut(NamedTuple):
    t_starts: jax.Array  # [n] resampled interval starts
    t_ends: jax.Array    # [n] resampled interval ends
    mask: jax.Array      # [n] interval validity


def fine_resample(
    t_starts: jax.Array,
    t_ends: jax.Array,
    weights: jax.Array,
    mask: jax.Array,
    n_samples: int,
) -> FineResampleOut:
    """Standard n+1-point inverse-CDF interval resampling.

    Semantics of `cdf_resampling_fine_kernel` (cdf.cu:404-534): draws
    ``n_samples + 1`` stratified CDF positions (background mass implicit, as
    everywhere), keeps consecutive pairs as new intervals; positions falling
    into the background are dropped, shrinking the valid set.
    """
    nb = n_samples + 1
    steps = jnp.sum(mask.astype(jnp.int32))
    has_any = steps > 0
    last = jnp.maximum(steps - 1, 0)

    w = jnp.where(mask, weights, 0.0)
    wsum_fg = jnp.sum(w)
    denom = wsum_fg + jnp.maximum(1.0 - wsum_fg, 0.0)
    cdf = jnp.cumsum(w) / denom
    cdf_prev = cdf - w / denom
    fg_total = cdf[last]

    u = _uniform_bins(nb, t_starts.dtype)
    placed = (u < fg_total) & has_any
    idx = jnp.clip(jnp.searchsorted(cdf, u, side="right"), 0, last)
    seg = jnp.maximum(cdf[idx] - cdf_prev[idx], 1e-20)
    t = t_starts[idx] + (u - cdf_prev[idx]) * (t_ends[idx] - t_starts[idx]) / seg

    return FineResampleOut(
        t_starts=t[:-1],
        t_ends=t[1:],
        mask=placed[:-1] & placed[1:],
    )


def sdf_fine_resample(
    t_starts: jax.Array,
    t_ends: jax.Array,
    alphas: jax.Array,
    sdfs: jax.Array,
    mask: jax.Array,
    n_samples: int,
) -> FineResampleOut:
    """Zero-crossing-anchored importance sampling for secondary rays.

    Semantics of `cdf_resampling_sdf_fine_kernel` (cdf.cu:537-638): find the
    first interval whose SDF crosses +→−, then importance-sample
    ``n_samples`` intervals onward from it using the *unnormalized* running
    transmittance CDF ``w_i = alpha_i * prod(1-alpha_j)`` (restarted at the
    crossing).  Rays without a crossing produce no valid intervals.
    """
    nb = n_samples + 1
    S = t_starts.shape[0]

    nxt_mask = jnp.roll(mask, -1).at[-1].set(False)
    sdf_next = jnp.roll(sdfs, -1)
    crossing = mask & nxt_mask & (sdfs >= 0.0) & (sdf_next < 0.0)
    found = jnp.any(crossing)
    cross_idx = jnp.where(found, jnp.argmax(crossing), 0).astype(jnp.int32)

    sel = mask & (jnp.arange(S) >= cross_idx)
    a = jnp.where(sel, alphas, 0.0)
    # running transmittance restarted at the crossing interval
    trans = jnp.cumprod(1.0 - a)
    trans_excl = jnp.concatenate([jnp.ones((1,), a.dtype), trans[:-1]])
    w = a * trans_excl
    cdf = jnp.cumsum(w)                     # unnormalized (<= 1)
    cdf_prev = cdf - w
    total = cdf[-1]

    u = _uniform_bins(nb, t_starts.dtype)
    placed = (u < total) & found
    idx = jnp.clip(jnp.searchsorted(cdf, u, side="right"), 0, S - 1)
    seg = jnp.maximum(cdf[idx] - cdf_prev[idx], 1e-20)
    t = t_starts[idx] + (u - cdf_prev[idx]) * (t_ends[idx] - t_starts[idx]) / seg

    return FineResampleOut(
        t_starts=t[:-1],
        t_ends=t[1:],
        mask=placed[:-1] & placed[1:],
    )


# --------------------------------------------------------------------------
# Batched (vmapped) wrappers; jitted since callers invoke them repeatedly
# with the same static sample counts.
# --------------------------------------------------------------------------

cdf_resample_rays = jax.jit(
    jax.vmap(cdf_resample, in_axes=(0, 0, 0, 0, 0, None)),
    static_argnums=(5,),
)
merge_resample_rays = jax.jit(
    jax.vmap(merge_resample, in_axes=(0, 0, 0, 0, 0, None)),
    static_argnums=(5,),
)
fine_resample_rays = jax.jit(
    jax.vmap(fine_resample, in_axes=(0, 0, 0, 0, None)),
    static_argnums=(4,),
)
sdf_fine_resample_rays = jax.jit(
    jax.vmap(sdf_fine_resample, in_axes=(0, 0, 0, 0, 0, None)),
    static_argnums=(5,),
)

# Single-ray jitted variants (used by the unit tests; batch dims of size 1
# would re-trace per shape otherwise).
cdf_resample_1 = jax.jit(cdf_resample, static_argnums=(5,))
merge_resample_1 = jax.jit(merge_resample, static_argnums=(5,))
fine_resample_1 = jax.jit(fine_resample, static_argnums=(4,))
sdf_fine_resample_1 = jax.jit(sdf_fine_resample, static_argnums=(5,))
