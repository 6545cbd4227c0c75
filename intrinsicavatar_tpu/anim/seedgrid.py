"""Per-frame baked canonical-correspondence grid for eval-time skinning.

At evaluation/relighting time the pose is FIXED per frame, so the inverse
skinning x_d -> x_c is a fixed field.  The reference re-runs its full
multi-init Broyden search for every query — primary, secondary, coarse
and fine alike (`models/deformers/fast_snarf/deformer_torch.py:94-125`).
A relit 540p/1024spp frame issues O(5e8) such queries; a 96^3 lattice is
O(9e5).  So: bake the correspondence field on a voxel lattice over the
deformed-space bbox ONCE per frame (one chunked pass of the ordinary
search machinery), then answer every query with ONE corner-packed row
gather + a short warm-started Broyden polish (`FastSNARF.deform_seeded`).
Data-dependent iteration is replaced by a gather — the TPU-native trade.

Root-branch safety: LBS inverse skinning is multi-valued near
self-contact.  Interpolating canonical positions ACROSS a branch
boundary yields garbage seeds, so each queried cell is classified on the
fly from its 8 corner roots: if the valid corners agree to within
``coh_factor`` cell diagonals the trilinear blend is used; otherwise the
nearest valid corner's root is used unblended (at most one cell away —
inside the polish's convergence basin).  Lanes whose polish still
diverges come back invalid and are counted (``sec_seed_polish_fail``),
never silently rendered.

Training does NOT use this: poses change per step and a step touches
about as many points as the bake itself.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from intrinsicavatar_tpu.anim.broyden import _corner_setup, corner_pack


class SeedGrid(NamedTuple):
    """Corner-packed correspondence lattice over the deformed-space bbox.

    ``packed[cell, corner*C + c]`` holds ``(x_c*ok, y_c*ok, z_c*ok, ok)``
    — and, when baked with an SDF channel (C == 6),
    ``(sdf*sdf_ok, sdf_ok)`` — at the 8 cell corners ("border" packing:
    cells == D*H*W and base cells are always in-grid).  ``center``/
    ``half`` map SMPL-space points into the lattice's [-1,1]^3 frame per
    axis.  Resolution is static, recovered from ``packed.shape[0]``
    (cubic lattice).

    The SDF channel lets eval-time *placement* passes (secondary coarse
    march, importance rounds) read sdf from one row gather instead of a
    seeded Broyden polish + hash encode + MLP per query — those passes
    only position fine samples; every shading/visibility weight is still
    computed from exact re-queries at the placed samples.

    ``sdf_ok`` is the PRE-dilation search validity: validity dilation
    exists to hand out polish SEEDS at the body margin (the polish then
    re-decides validity), but the sdf channel is consumed raw — an
    adopted node's neighbor-mean sdf would put ghost density in space
    the search itself calls empty, so adopted nodes stay sdf-invalid and
    the gather falls back to the searched path's not-converged fill
    (1e5).
    """

    packed: jax.Array     # [res^3, 8*C], C in (4, 6)
    center: jax.Array     # [3]
    half: jax.Array       # [3]

    @property
    def resolution(self) -> int:
        return round(self.packed.shape[0] ** (1.0 / 3.0))

    @property
    def channels(self) -> int:
        return self.packed.shape[1] // 8

    @property
    def has_sdf(self) -> bool:
        return self.channels >= 5


def bake_seed_grid(deform_fn: Callable, aabb: jax.Array, resolution: int,
                   chunk: int = 65536) -> SeedGrid:
    """Run the full root search over the lattice; pack results.

    Args:
      deform_fn: ``(pts [N,3]) -> (pts_cano [N,3], valid [N])`` or
        ``-> (pts_cano, valid, sdf [N])`` — the caller's ordinary
        (searched, min-SDF-reduced) canonicalization; the optional third
        output bakes a canonical-SDF channel alongside the seeds.
      aabb: ``[2,3]`` deformed-space bbox (lo, hi).
      resolution: lattice nodes per axis (align-corners over the bbox).
      chunk: points per ``lax.map`` step (bounds bake memory).
    """
    lo, hi = aabb[0], aabb[1]
    lin = jnp.linspace(0.0, 1.0, resolution)
    zz, yy, xx = jnp.meshgrid(lin, lin, lin, indexing="ij")
    norm01 = jnp.stack([xx, yy, zz], -1).reshape(-1, 3)
    pts = lo + norm01 * (hi - lo)
    N = pts.shape[0]
    n = -(-N // chunk)
    pad = n * chunk - N
    pts_p = jnp.pad(pts, ((0, pad), (0, 0))).reshape(n, chunk, 3)

    has_sdf = len(jax.eval_shape(deform_fn, pts_p[0])) > 2

    def body(p):
        out = deform_fn(p)
        xc, ok = out[0], out[1]
        sdf = out[2] if has_sdf else jnp.zeros(p.shape[0])
        return xc, ok, sdf

    xc, ok, sdf = jax.lax.map(body, pts_p)
    xc = xc.reshape(-1, 3)[:N]
    ok = ok.reshape(-1)[:N]
    sdf = sdf.reshape(-1)[:N]

    # validity dilation: nodes where the search failed (periphery, far
    # lattice shells) adopt the mean root of their valid 6-neighbors for
    # a few passes.  This removes the hard validity cliff at the body's
    # margin — an adopted seed a couple of cells from a real root is
    # inside the polish's convergence basin, and the polish (not the
    # bake's coverage) then decides validity, matching the searched
    # path's semantics at the periphery.
    res = resolution
    xg = jnp.concatenate([xc, sdf[:, None]], -1).reshape(res, res, res, 4)
    og = ok.reshape(res, res, res)

    def _shift0(a, shift, axis):
        """Shifted copy with zero fill (roll would wrap face-to-face)."""
        n = a.shape[axis]
        z = jnp.zeros_like(jax.lax.slice_in_dim(a, 0, 1, axis=axis))
        if shift > 0:
            body_ = jax.lax.slice_in_dim(a, 0, n - 1, axis=axis)
            return jnp.concatenate([z, body_], axis=axis)
        body_ = jax.lax.slice_in_dim(a, 1, n, axis=axis)
        return jnp.concatenate([body_, z], axis=axis)

    def dilate(_, state):
        xg, og = state
        ogf = og.astype(xg.dtype)[..., None]
        xm = xg * ogf
        acc = jnp.zeros_like(xg)
        cnt = jnp.zeros_like(ogf)
        for axis in (0, 1, 2):
            for shift in (1, -1):
                acc = acc + _shift0(xm, shift, axis)
                cnt = cnt + _shift0(ogf, shift, axis)
        fill = acc / jnp.maximum(cnt, 1.0)
        adopt = (~og) & (cnt[..., 0] > 0.5)
        xg = jnp.where(adopt[..., None], fill, xg)
        og = og | adopt
        return xg, og

    ok_orig = ok                       # pre-dilation: the sdf channel's mask
    xg, og = jax.lax.fori_loop(0, 2, dilate, (xg, og))
    xc = xg.reshape(-1, 4)[:, :3]
    ok = og.reshape(-1)

    okf = ok.astype(xc.dtype)
    shape = (resolution, resolution, resolution)
    chans = [xc[:, 0] * okf, xc[:, 1] * okf, xc[:, 2] * okf, okf]
    if has_sdf:
        # raw searched sdf under the pre-dilation mask: adopted margin
        # nodes provide seeds but never sdf (see class docstring)
        okf0 = ok_orig.astype(xc.dtype)
        chans += [sdf * okf0, okf0]
    packed = corner_pack(chans, shape, "border")
    return SeedGrid(packed=packed,
                    center=0.5 * (lo + hi),
                    half=jnp.maximum(0.5 * (hi - lo), 1e-6))


def gather_from_grid(grid: SeedGrid, pts: jax.Array,
                     coh_factor: float = 3.0):
    """Seeds (+ baked sdf) from one packed-row gather per point.

    Returns ``(seed_xc [N,3], seed_ok [N], sdf [N] | None)`` — ``sdf``
    only when the grid was baked with the SDF channel.  Coherent cells
    (valid
    corner roots within ``coh_factor`` cell diagonals of their mean) get
    the validity-masked trilinear blend; incoherent cells (root-branch
    boundaries) get the nearest valid corner's root unblended.  Cells
    with no valid corner return ``seed_ok=False`` — genuinely off-body
    space (callers fill sdf=1e5 there, matching the searched path's
    not-converged semantics).
    """
    res = grid.resolution
    D = H = W = res
    n = (pts - grid.center) / grid.half                       # [-1,1]^3
    # "border" packing clamps out-of-lattice queries to the boundary
    # cell; a point beyond the bbox (+half-cell slack) has no meaningful
    # row there — genuinely off-body space, invalid like a failed search
    inside = jnp.all(jnp.abs(n) <= 1.0 + 1.0 / max(res - 1, 1), axis=-1)
    x0, y0, z0, fx, fy, fz = _corner_setup(
        n[:, 0], n[:, 1], n[:, 2], D, H, W, "border")
    cell = (jnp.clip(z0, 0, D - 1) * H + jnp.clip(y0, 0, H - 1)) * W \
        + jnp.clip(x0, 0, W - 1)
    N = pts.shape[0]
    C = grid.channels
    rows = jnp.take(grid.packed, cell, axis=0).reshape(N, 8, C)
    ok_c = rows[:, :, 3] > 0.5                                # [N,8]
    okf = ok_c.astype(rows.dtype)
    xc_c = rows[:, :, :3]                                     # pre-masked

    wx = jnp.stack([1.0 - fx, fx], -1)
    wy = jnp.stack([1.0 - fy, fy], -1)
    wz = jnp.stack([1.0 - fz, fz], -1)
    w = (wx[:, :, None, None] * wy[:, None, :, None]
         * wz[:, None, None, :]).reshape(N, 8)

    wok = w * okf
    denom = jnp.sum(wok, axis=1, keepdims=True)
    trilerp = jnp.einsum("nk,nkc->nc", wok, xc_c) \
        / jnp.maximum(denom, 1e-9)

    n_ok = jnp.sum(okf, axis=1, keepdims=True)
    mean = jnp.sum(xc_c, axis=1) / jnp.maximum(n_ok, 1.0)     # [N,3]
    dev2 = jnp.max(
        jnp.sum((xc_c - mean[:, None, :]) ** 2, -1) * okf, axis=1)
    diag2 = jnp.sum((2.0 * grid.half / max(res - 1, 1)) ** 2)
    coherent = dev2 <= (coh_factor * coh_factor) * diag2

    # nearest VALID corner by trilinear weight (stored value = xc*ok;
    # the selected corner is valid whenever seed_ok holds, so it is xc)
    nearest = jnp.argmax(wok + okf * 1e-6, axis=1)            # [N]
    xc_near = jnp.take_along_axis(
        xc_c, nearest[:, None, None].repeat(3, -1), axis=1)[:, 0, :]
    seed_xc = jnp.where(coherent[:, None], trilerp, xc_near)
    seed_ok = jnp.any(ok_c, axis=1) & inside

    sdf = None
    if grid.has_sdf:
        # same coherent/nearest policy as the seeds but under the sdf
        # channel's OWN (pre-dilation) validity; cells with no
        # sdf-valid corner read far off-body (1e5 -> alpha 0), matching
        # the searched path's not-converged fill
        sdf_c = rows[:, :, 4]                                 # [N,8], *sok
        sok_c = rows[:, :, 5] > 0.5                           # [N,8]
        sokf = sok_c.astype(rows.dtype)
        wsok = w * sokf
        sdf_tri = jnp.sum(wsok * sdf_c, axis=1) \
            / jnp.maximum(jnp.sum(wsok, axis=1), 1e-9)
        near_s = jnp.argmax(wsok + sokf * 1e-6, axis=1)
        sdf_near = jnp.take_along_axis(sdf_c, near_s[:, None],
                                       axis=1)[:, 0]
        sdf = jnp.where(coherent, sdf_tri, sdf_near)
        sdf_ok = jnp.any(sok_c, axis=1) & inside
        sdf = jnp.where(sdf_ok, sdf, 1e5)
    return seed_xc, seed_ok, sdf


def seed_from_grid(grid: SeedGrid, pts: jax.Array, coh_factor: float = 3.0):
    """(seed_xc, seed_ok) view of :func:`gather_from_grid`."""
    xc, ok, _ = gather_from_grid(grid, pts, coh_factor)
    return xc, ok
