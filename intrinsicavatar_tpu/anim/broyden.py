"""Broyden inverse-LBS root finding + candidate filtering + forward skinning.

TPU-native equivalent of the Fast-SNARF CUDA kernels
(taconite/IntrinsicAvatar):

  * :func:`broyden_search` — `fuse_cuda_kernel_fast.cu:253-419`
    (``broyden_kernel``): per (point x bone-init) lane, initialize the
    canonical guess with the bone's inverse rigid transform, then run <=10
    Broyden iterations on ``g(x) = J_vox(x) @ [x;1] - x_target`` where
    ``J_vox`` is a trilinear sample of the baked fwd-skinning transform
    voxel; rank-1 "good Broyden" updates of ``J^-1``; convergence |g|<1e-5,
    divergence |g|>1e-1; a root is valid only if its normalized grid coords
    lie in [-1,1].
  * :func:`filter_duplicates` — `filter.cu:10-54`: among converged candidates
    of a point, drop any whose root is within 1e-4 of a *later* candidate.
  * :func:`forward_skinning` — `deformer_torch.py:213-227` (``skinning_mask``).

TPU layout note: the kernel state is held as *structure-of-arrays* — plain
``[M]`` vectors for each scalar register of the CUDA kernel (x, g, the nine
J^-1 entries).  Tensors shaped ``[M, 3]``/``[M, 3, 3]``/``[M, 12]`` pad
their minor dims to the 128-lane tile on TPU (42x HBM blowup at ``[M, 3]``),
so none are materialized inside the loop; every trilinear sample is a flat
1-D gather per channel.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# Bone indices used as Broyden initializations (`deformer_torch.py:27`).
INIT_BONES = np.array([0, 1, 2, 4, 5, 10, 11, 12, 15, 16, 17, 18, 19],
                      dtype=np.int32)


# ---------------------------------------------------------------------------
# SoA trilinear samplers
# ---------------------------------------------------------------------------

def _corner_setup(cx, cy, cz, D, H, W, padding):
    """Shared corner/fraction computation for [-1,1] align_corners coords.

    Returns (x0, y0, z0 int32 base corners, fx, fy, fz fractions).
    """
    ix = (cx + 1.0) * 0.5 * (W - 1)
    iy = (cy + 1.0) * 0.5 * (H - 1)
    iz = (cz + 1.0) * 0.5 * (D - 1)
    if padding == "border":
        ix = jnp.clip(ix, 0.0, W - 1.0)
        iy = jnp.clip(iy, 0.0, H - 1.0)
        iz = jnp.clip(iz, 0.0, D - 1.0)
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    z0 = jnp.floor(iz)
    return (x0.astype(jnp.int32), y0.astype(jnp.int32), z0.astype(jnp.int32),
            ix - x0, iy - y0, iz - z0)


def grid_sample_channels(vox_flat: Sequence[jax.Array], shape_dhw,
                         cx, cy, cz, padding: str = "zeros"):
    """Trilinear sample of C channels at SoA coords -> tuple of ``[N]``.

    ``vox_flat``: sequence of C flat ``[D*H*W]`` channel arrays;
    ``cx, cy, cz``: ``[N]`` coords in [-1, 1] (align_corners=True, matching
    the inlined CUDA sampler `fuse_cuda_kernel_fast.cu:111-248` for zeros
    padding and torch ``grid_sample(padding_mode='border')`` for border).
    """
    D, H, W = shape_dhw
    x0, y0, z0, fx, fy, fz = _corner_setup(cx, cy, cz, D, H, W, padding)
    C = len(vox_flat)
    out = [jnp.zeros_like(cx) for _ in range(C)]
    for dx in (0, 1):
        wx = fx if dx else 1.0 - fx
        for dy in (0, 1):
            wy = fy if dy else 1.0 - fy
            for dz in (0, 1):
                wz = fz if dz else 1.0 - fz
                px, py, pz = x0 + dx, y0 + dy, z0 + dz
                if padding == "border":
                    pxc = jnp.clip(px, 0, W - 1)
                    pyc = jnp.clip(py, 0, H - 1)
                    pzc = jnp.clip(pz, 0, D - 1)
                    w = wx * wy * wz
                else:
                    ok = ((px >= 0) & (px < W) & (py >= 0) & (py < H)
                          & (pz >= 0) & (pz < D))
                    pxc = jnp.clip(px, 0, W - 1)
                    pyc = jnp.clip(py, 0, H - 1)
                    pzc = jnp.clip(pz, 0, D - 1)
                    w = jnp.where(ok, wx * wy * wz, 0.0)
                idx = (pzc * H + pyc) * W + pxc
                for c in range(C):
                    out[c] = out[c] + w * jnp.take(vox_flat[c], idx, axis=0)
    return tuple(out)


def grid_sample_3d(vox: jax.Array, coords: jax.Array,
                   padding: str = "zeros") -> jax.Array:
    """AoS wrapper: ``vox [C, D, H, W]``, ``coords [N, 3]`` -> ``[N, C]``."""
    C = vox.shape[0]
    vf = [vox[c].reshape(-1) for c in range(C)]
    chans = grid_sample_channels(vf, vox.shape[1:], coords[:, 0],
                                 coords[:, 1], coords[:, 2], padding)
    return jnp.stack(chans, axis=-1)


# ---------------------------------------------------------------------------
# Corner-packed sampling: one row-gather per point
# ---------------------------------------------------------------------------
#
# XLA:TPU gathers cost per *row*, nearly independent of row width (measured:
# (1,12)-row gathers cost the same as scalar gathers).  Packing every cell's
# 2x2x2 neighborhood x C channels into one contiguous row of the table turns
# the 8 corners x C channels x per-element gathers of trilinear sampling
# into a single (1, 8*C) row gather per query — ~20x less gather work for
# the Broyden loop at 8x the (tiny) table memory.

def corner_pack(vox_flat, shape_dhw, padding: str = "zeros") -> jax.Array:
    """Pack ``[C, D*H*W]`` -> corner-neighborhood rows ``[cells, 8*C]``.

    Row layout: ``packed[cell, corner * C + c]`` with corners ordered by
    ``(dx, dy, dz)`` bits (dz fastest).  ``border`` bakes the clamped
    neighbor (coords are pre-clamped, so base cells are always in-grid and
    cells == D*H*W).  ``zeros`` bakes 0 for out-of-grid corners AND extends
    the grid by one zero shell on the *low* side of each axis
    (cells == (D+1)*(H+1)*(W+1)) so base cells straddling the lower boundary
    stay exact — :func:`grid_sample_packed` indexes the extended grid.
    """
    if isinstance(vox_flat, (list, tuple)):
        vox_flat = jnp.stack([v.reshape(-1) for v in vox_flat])
    C = vox_flat.shape[0]
    D, H, W = shape_dhw
    vox = vox_flat.reshape(C, D, H, W)
    if padding == "zeros":
        vox = jnp.pad(vox, ((0, 0), (1, 0), (1, 0), (1, 0)))
        D, H, W = D + 1, H + 1, W + 1
    cols = []
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                v = vox
                if dz:
                    shifted = jnp.roll(v, -1, axis=1)
                    edge = v[:, -1:] if padding == "border" \
                        else jnp.zeros_like(v[:, -1:])
                    v = jnp.concatenate([shifted[:, :-1], edge], axis=1)
                if dy:
                    shifted = jnp.roll(v, -1, axis=2)
                    edge = v[:, :, -1:] if padding == "border" \
                        else jnp.zeros_like(v[:, :, -1:])
                    v = jnp.concatenate([shifted[:, :, :-1], edge], axis=2)
                if dx:
                    shifted = jnp.roll(v, -1, axis=3)
                    edge = v[:, :, :, -1:] if padding == "border" \
                        else jnp.zeros_like(v[:, :, :, -1:])
                    v = jnp.concatenate([shifted[:, :, :, :-1], edge], axis=3)
                cols.append(v.reshape(C, -1))
    # [8, C, DHW] -> [DHW, 8*C]
    return jnp.stack(cols).reshape(8 * C, -1).T


def grid_sample_packed(packed: jax.Array, shape_dhw, n_channels: int,
                       cx, cy, cz, padding: str = "zeros"):
    """Trilinear sample from a corner-packed table -> tuple of C ``[N]``.

    Semantics identical to :func:`grid_sample_channels`.

    The corner-weighted sum is a single ``einsum('mk,mkc->mc')`` over the
    gathered ``[N, 8, C]`` rows: gathered data is consumed contiguously in
    row-major order, which measures ~5x faster on TPU than extracting the
    96 strided columns one by one (59M vs 12M rows/s at C=12 on v5e).
    """
    D, H, W = shape_dhw
    C = n_channels
    x0, y0, z0, fx, fy, fz = _corner_setup(cx, cy, cz, D, H, W, padding)
    if padding == "zeros":
        # extended-grid indexing (one zero shell on the low side per axis)
        cell = ((jnp.clip(z0 + 1, 0, D) * (H + 1) + jnp.clip(y0 + 1, 0, H))
                * (W + 1) + jnp.clip(x0 + 1, 0, W))
    else:
        cell = (jnp.clip(z0, 0, D - 1) * H + jnp.clip(y0, 0, H - 1)) * W \
            + jnp.clip(x0, 0, W - 1)
    N = cx.shape[0]
    rows = jnp.take(packed, cell, axis=0).reshape(N, 8, C)
    # corner weights [N, 8], (dx, dy, dz) bit order with dz fastest
    wx = jnp.stack([1.0 - fx, fx], -1)
    wy = jnp.stack([1.0 - fy, fy], -1)
    wz = jnp.stack([1.0 - fz, fz], -1)
    w = (wx[:, :, None, None] * wy[:, None, :, None]
         * wz[:, None, None, :]).reshape(N, 8)
    if padding != "border":
        okx = jnp.stack([(x0 >= 0) & (x0 < W),
                         (x0 + 1 >= 0) & (x0 + 1 < W)], -1)
        oky = jnp.stack([(y0 >= 0) & (y0 < H),
                         (y0 + 1 >= 0) & (y0 + 1 < H)], -1)
        okz = jnp.stack([(z0 >= 0) & (z0 < D),
                         (z0 + 1 >= 0) & (z0 + 1 < D)], -1)
        ok = (okx[:, :, None, None] & oky[:, None, :, None]
              & okz[:, None, None, :]).reshape(N, 8)
        w = jnp.where(ok, w, 0.0)
    out = jnp.einsum("mk,mkc->mc", w, rows)
    return tuple(out[:, c] for c in range(C))


# ---------------------------------------------------------------------------
# Broyden search (SoA)
# ---------------------------------------------------------------------------

class BroydenResult(NamedTuple):
    """SoA result: canonical roots as three [M] coords, J^-1 as nine [M]
    entries (row-major), validity [M].  Use :meth:`xc_array`/:meth:`jinv_array`
    for the stacked views (they materialize padded buffers — avoid in hot
    paths)."""

    x: jax.Array
    y: jax.Array
    z: jax.Array
    j_inv: tuple       # 9 x [M], row-major (J00..J22)
    valid: jax.Array   # [M] bool
    overflow: jax.Array = 0  # scalar: phase-2 lanes dropped over budget

    def xc_array(self):
        return jnp.stack([self.x, self.y, self.z], axis=-1)

    def jinv_array(self):
        M = self.x.shape[0]
        return jnp.stack(self.j_inv, axis=-1).reshape(M, 3, 3)


def _make_broyden_body(sample_J, in_bounds_of, cvg_thresh, dvg_thresh):
    """Shared Broyden iteration body over SoA state.

    State: ``(x, y, z, tx, ty, tz, g0, g1, g2, J^-1 x9, done, valid,
    out x/y/z, out J^-1 x9)`` — 30 ``[M]`` arrays.  Targets travel in the
    state so the body survives lane compaction between phases.
    """

    def body(_, s):
        (x, y, z, tx, ty, tz, g0, g1, g2,
         J00, J01, J02, J10, J11, J12, J20, J21, J22,
         done, valid, ox_, oy_, oz_,
         O00, O01, O02, O10, O11, O12, O20, O21, O22) = s
        active = ~done

        u0 = -(J00 * g0 + J01 * g1 + J02 * g2)
        u1 = -(J10 * g0 + J11 * g1 + J12 * g2)
        u2 = -(J20 * g0 + J21 * g1 + J22 * g2)
        xn = jnp.where(active, x + u0, x)
        yn = jnp.where(active, y + u1, y)
        zn = jnp.where(active, z + u2, z)

        Jl = sample_J(xn, yn, zn)
        n0 = Jl[0] * xn + Jl[1] * yn + Jl[2] * zn + Jl[3] - tx
        n1 = Jl[4] * xn + Jl[5] * yn + Jl[6] * zn + Jl[7] - ty
        n2 = Jl[8] * xn + Jl[9] * yn + Jl[10] * zn + Jl[11] - tz
        nsq = n0 * n0 + n1 * n1 + n2 * n2

        conv = active & (nsq < cvg_thresh**2)
        dvg = active & ~conv & (nsq > dvg_thresh**2)
        cont = active & ~conv & ~dvg

        in_bounds = in_bounds_of(xn, yn, zn)

        ox_ = jnp.where(conv, xn, ox_)
        oy_ = jnp.where(conv, yn, oy_)
        oz_ = jnp.where(conv, zn, oz_)
        O00 = jnp.where(conv, J00, O00)
        O01 = jnp.where(conv, J01, O01)
        O02 = jnp.where(conv, J02, O02)
        O10 = jnp.where(conv, J10, O10)
        O11 = jnp.where(conv, J11, O11)
        O12 = jnp.where(conv, J12, O12)
        O20 = jnp.where(conv, J20, O20)
        O21 = jnp.where(conv, J21, O21)
        O22 = jnp.where(conv, J22, O22)
        valid = jnp.where(conv, in_bounds, valid)

        # rank-1 'good Broyden' update (`fuse_J_inv_update`,
        # fuse_cuda_kernel_fast.cu:22-56): c = dx^T J^-1; s = c . dg;
        # J^-1 += (dx - J^-1 dg) c / s
        d0, d1, d2 = n0 - g0, n1 - g1, n2 - g2
        c0 = J00 * u0 + J10 * u1 + J20 * u2
        c1 = J01 * u0 + J11 * u1 + J21 * u2
        c2 = J02 * u0 + J12 * u1 + J22 * u2
        sden = c0 * d0 + c1 * d1 + c2 * d2
        r0 = -(J00 * d0 + J01 * d1 + J02 * d2)
        r1 = -(J10 * d0 + J11 * d1 + J12 * d2)
        r2 = -(J20 * d0 + J21 * d1 + J22 * d2)
        inv_s = jnp.where(jnp.abs(sden) > 1e-30, 1.0 / sden, 0.0)
        a0 = (r0 + u0) * inv_s
        a1 = (r1 + u1) * inv_s
        a2 = (r2 + u2) * inv_s
        J00 = jnp.where(cont, J00 + c0 * a0, J00)
        J01 = jnp.where(cont, J01 + c1 * a0, J01)
        J02 = jnp.where(cont, J02 + c2 * a0, J02)
        J10 = jnp.where(cont, J10 + c0 * a1, J10)
        J11 = jnp.where(cont, J11 + c1 * a1, J11)
        J12 = jnp.where(cont, J12 + c2 * a1, J12)
        J20 = jnp.where(cont, J20 + c0 * a2, J20)
        J21 = jnp.where(cont, J21 + c1 * a2, J21)
        J22 = jnp.where(cont, J22 + c2 * a2, J22)

        g0 = jnp.where(cont, n0, g0)
        g1 = jnp.where(cont, n1, g1)
        g2 = jnp.where(cont, n2, g2)
        done = done | conv | dvg
        return (xn, yn, zn, tx, ty, tz, g0, g1, g2,
                J00, J01, J02, J10, J11, J12, J20, J21, J22,
                done, valid, ox_, oy_, oz_,
                O00, O01, O02, O10, O11, O12, O20, O21, O22)

    return body


# Compaction constants for the two-phase search.  Measured on the synthetic
# body (see README "Performance"): active lanes after 4 iterations ~0.10;
# a budget of M/4 leaves 2.6x headroom.  Overflow lanes (beyond budget) are
# treated as diverged.
_PHASE1_ITERS = 4
_COMPACT_DIV = 4
_TWO_PHASE_MIN_M = 65536


def _make_samplers(voxel_J_packed, shape_dhw, offset, scale_kernel):
    """Closures shared by the full search and the seeded polish."""
    ox, oy, oz = offset[0], offset[1], offset[2]
    skx, sky, skz = scale_kernel[0], scale_kernel[1], scale_kernel[2]

    def sample_J(x, y, z):
        """Blended 3x4 transform at canonical (x,y,z): 12-tuple of [M]."""
        return grid_sample_packed(
            voxel_J_packed, shape_dhw, 12,
            skx * (x - ox), sky * (y - oy), skz * (z - oz))

    def in_bounds_of(x, y, z):
        ncx = skx * (x - ox)
        ncy = sky * (y - oy)
        ncz = skz * (z - oz)
        return ((ncx >= -1) & (ncx <= 1) & (ncy >= -1) & (ncy <= 1)
                & (ncz >= -1) & (ncz <= 1))

    return sample_J, in_bounds_of


@partial(jax.jit, static_argnames=("max_iters", "shape_dhw", "two_phase",
                                   "compact_div"))
def broyden_search(
    xd: jax.Array,          # [M, 3] deformed targets (lane-expanded)
    bone_idx: jax.Array,    # [M] int32 initialization bone per lane
    voxel_J_packed: jax.Array,  # [D*H*W, 96] corner-packed (see corner_pack)
    tfs: jax.Array,         # [24, 4, 4]
    offset: jax.Array,      # [3] grid offset (bbox center)
    scale_kernel: jax.Array,  # [3] = 1/scale with z * ratio
    shape_dhw=(32, 128, 128),
    cvg_thresh: float = 1e-5,
    dvg_thresh: float = 1e-1,
    max_iters: int = 10,
    two_phase: bool | None = None,
    compact_div: int = _COMPACT_DIV,
) -> BroydenResult:
    """Broyden inverse-LBS search (`fuse_cuda_kernel_fast.cu:253-419`).

    Two-phase schedule on large batches: after ``_PHASE1_ITERS`` iterations
    over all lanes, still-active lanes (~10%) are compacted to an ``M/4``
    budget and finish the remaining iterations there — gathers cost per
    *row* on TPU, so halving live rows halves the dominant cost.  Results
    are bit-identical to the single-phase loop for every lane that fits the
    budget (overflow lanes are dropped as diverged).
    """
    M = xd.shape[0]
    tx, ty, tz = xd[:, 0], xd[:, 1], xd[:, 2]
    sample_J, in_bounds_of = _make_samplers(voxel_J_packed, shape_dhw,
                                            offset, scale_kernel)

    # init: x = R_bone^T (xd - t_bone); ONE [M]-row gather of the packed
    # [24, 12] bone transforms (12 separate takes cost 12x as much — TPU
    # gathers are priced per row).
    tfs12 = tfs[:, :3, :].reshape(tfs.shape[0], 12)
    Tb_rows = jnp.take(tfs12, bone_idx, axis=0)                    # [M, 12]
    Tb = [Tb_rows[:, i] for i in range(12)]
    dx_, dy_, dz_ = tx - Tb[3], ty - Tb[7], tz - Tb[11]
    # R^T v: rows of R^T are columns of R
    x = Tb[0] * dx_ + Tb[4] * dy_ + Tb[8] * dz_
    y = Tb[1] * dx_ + Tb[5] * dy_ + Tb[9] * dz_
    z = Tb[2] * dx_ + Tb[6] * dy_ + Tb[10] * dz_

    J0 = sample_J(x, y, z)
    # J_inv init = transpose of the rotation block
    Ji = [J0[0], J0[4], J0[8],
          J0[1], J0[5], J0[9],
          J0[2], J0[6], J0[10]]
    g0 = J0[0] * x + J0[1] * y + J0[2] * z + J0[3] - tx
    g1 = J0[4] * x + J0[5] * y + J0[6] * z + J0[7] - ty
    g2 = J0[8] * x + J0[9] * y + J0[10] * z + J0[11] - tz

    zeros = jnp.zeros((M,), xd.dtype)
    state = (x, y, z, tx, ty, tz, g0, g1, g2, *Ji,
             jnp.zeros(M, bool), jnp.zeros(M, bool),          # done, valid
             zeros, zeros, zeros,                             # out x/y/z
             *(zeros,) * 9)                                   # out J^-1

    body = _make_broyden_body(sample_J, in_bounds_of, cvg_thresh, dvg_thresh)

    if two_phase is None:
        two_phase = M >= _TWO_PHASE_MIN_M
    two_phase = two_phase and max_iters > _PHASE1_ITERS
    if not two_phase:
        s = jax.lax.fori_loop(0, max_iters, body, state)
        valid = s[19]
        vf = valid.astype(xd.dtype)
        return BroydenResult(
            x=s[20] * vf, y=s[21] * vf, z=s[22] * vf,
            j_inv=tuple(s[23 + i] * vf for i in range(9)),
            valid=valid, overflow=jnp.zeros((), jnp.int32),
        )

    s = jax.lax.fori_loop(0, _PHASE1_ITERS, body, state)
    done1, valid1 = s[18], s[19]
    out1 = s[20:]                                      # 12 x [M]

    # ---- compact still-active lanes to a fixed budget -----------------
    M2 = max(128, (M // max(1, int(compact_div)) + 127) // 128 * 128)
    active = ~done1
    pos = jnp.cumsum(active.astype(jnp.int32)) - 1     # slot per active lane
    lane_ids = jnp.arange(M, dtype=jnp.int32)
    dest = jnp.where(active & (pos < M2), pos, M2)     # overflow -> dropped
    n_overflow = jnp.sum((active & (pos >= M2)).astype(jnp.int32))
    idx = jnp.full((M2,), M, jnp.int32).at[dest].set(lane_ids, mode="drop")
    slot_live = idx < M
    idx_c = jnp.minimum(idx, M - 1)

    packed_state = jnp.stack(s[0:18], axis=-1)         # [M, 18]
    st2 = jnp.take(packed_state, idx_c, axis=0)        # [M2, 18] one gather
    cols = [st2[:, i] for i in range(18)]
    z2 = jnp.zeros((M2,), xd.dtype)
    state2 = (*cols,
              ~slot_live,                              # dead slots are done
              jnp.zeros(M2, bool),
              z2, z2, z2, *(z2,) * 9)
    s2 = jax.lax.fori_loop(0, max_iters - _PHASE1_ITERS, body, state2)
    valid2 = s2[19] & slot_live
    out2 = s2[20:]

    # ---- scatter phase-2 results back (one packed row scatter) --------
    packed_out2 = jnp.stack(
        [valid2.astype(xd.dtype), *out2], axis=-1)     # [M2, 13]
    back = jnp.zeros((M, 13), xd.dtype).at[idx].set(packed_out2, mode="drop")
    valid = valid1 | (back[:, 0] > 0.5)
    outs = [o1 + back[:, 1 + i] for i, o1 in enumerate(out1)]

    vf = valid.astype(xd.dtype)
    return BroydenResult(
        x=outs[0] * vf, y=outs[1] * vf, z=outs[2] * vf,
        j_inv=tuple(outs[3 + i] * vf for i in range(9)),
        valid=valid, overflow=n_overflow,
    )


@partial(jax.jit, static_argnames=("max_iters", "shape_dhw"))
def broyden_polish(
    xd: jax.Array,          # [M, 3] deformed targets
    sx: jax.Array,          # [M] canonical seed coords
    sy: jax.Array,
    sz: jax.Array,
    seed_ok: jax.Array,     # [M] bool — lanes with no usable seed stay invalid
    voxel_J_packed: jax.Array,
    offset: jax.Array,
    scale_kernel: jax.Array,
    shape_dhw=(32, 128, 128),
    cvg_thresh: float = 1e-5,
    dvg_thresh: float = 1e-1,
    max_iters: int = 4,
) -> BroydenResult:
    """Warm-started Broyden: ONE lane per point, seeded at a known-nearby
    canonical root instead of the 13 bone-anchored initializations.

    Built for the secondary fine pass: fine samples sit within one march
    step of a coarse sample on the same ray whose inverse-skinning root is
    already converged, so a short polish from that root replaces the full
    multi-init search the reference also pays per query
    (`fast_snarf/deformer_torch.py:94-125`).  Same residual, convergence
    and in-bounds semantics as :func:`broyden_search`; lanes that fail to
    converge within ``max_iters`` come back invalid (callers fill
    sdf=1e5, which only drops that sample's contribution).
    """
    M = xd.shape[0]
    tx, ty, tz = xd[:, 0], xd[:, 1], xd[:, 2]
    sample_J, in_bounds_of = _make_samplers(voxel_J_packed, shape_dhw,
                                            offset, scale_kernel)
    J0 = sample_J(sx, sy, sz)
    Ji = [J0[0], J0[4], J0[8],
          J0[1], J0[5], J0[9],
          J0[2], J0[6], J0[10]]
    g0 = J0[0] * sx + J0[1] * sy + J0[2] * sz + J0[3] - tx
    g1 = J0[4] * sx + J0[5] * sy + J0[6] * sz + J0[7] - ty
    g2 = J0[8] * sx + J0[9] * sy + J0[10] * sz + J0[11] - tz

    zeros = jnp.zeros((M,), xd.dtype)
    state = (sx, sy, sz, tx, ty, tz, g0, g1, g2, *Ji,
             ~seed_ok, jnp.zeros(M, bool),                # done, valid
             zeros, zeros, zeros,
             *(zeros,) * 9)
    body = _make_broyden_body(sample_J, in_bounds_of, cvg_thresh, dvg_thresh)
    s = jax.lax.fori_loop(0, max_iters, body, state)
    valid = s[19] & seed_ok
    vf = valid.astype(xd.dtype)
    return BroydenResult(
        x=s[20] * vf, y=s[21] * vf, z=s[22] * vf,
        j_inv=tuple(s[23 + i] * vf for i in range(9)),
        valid=valid, overflow=jnp.zeros((), jnp.int32),
    )


def filter_duplicates_soa(x, y, z, valid, thresh: float = 1e-4):
    """SoA duplicate filter over ``[N, I]`` per-coordinate arrays."""
    d2 = ((x[:, :, None] - x[:, None, :]) ** 2
          + (y[:, :, None] - y[:, None, :]) ** 2
          + (z[:, :, None] - z[:, None, :]) ** 2)        # [N, I, I]
    I = x.shape[1]
    later = (jnp.arange(I)[:, None] < jnp.arange(I)[None, :])
    dup = jnp.any(
        later[None] & valid[:, None, :] & (d2 < thresh * thresh), axis=-1
    )
    return valid & ~dup


@jax.jit
def filter_duplicates(xc: jax.Array, valid: jax.Array,
                      thresh: float = 1e-4) -> jax.Array:
    """Drop converged candidates duplicated by a later one (`filter.cu:25-51`).

    Args:
      xc: ``[N, I, 3]`` candidates; valid: ``[N, I]``.
    Returns the filtered validity mask ``[N, I]``.
    """
    d = xc[:, :, None, :] - xc[:, None, :, :]
    d2 = jnp.sum(d * d, -1)                               # [N, I, I]
    I = xc.shape[1]
    later = (jnp.arange(I)[:, None] < jnp.arange(I)[None, :])
    dup = jnp.any(
        later[None] & valid[:, None, :] & (d2 < thresh * thresh), axis=-1
    )
    return valid & ~dup


def forward_skinning_soa(xc_x, xc_y, xc_z, weights, tfs):
    """LBS in SoA form: ``[M]`` coords + ``[M, 24]`` weights.

    Returns ``(xd 3-tuple of [M], rot 9-tuple of [M])`` — the blended
    transform's rotation maps canonical normals to observation space
    (`deformer_torch.py:213-227`).
    """
    # blended transform entries: w [M,24] @ tfs_component [24] -> [M]
    t = [weights @ tfs[:, a, b] for a in range(3) for b in range(4)]
    xd0 = t[0] * xc_x + t[1] * xc_y + t[2] * xc_z + t[3]
    xd1 = t[4] * xc_x + t[5] * xc_y + t[6] * xc_z + t[7]
    xd2 = t[8] * xc_x + t[9] * xc_y + t[10] * xc_z + t[11]
    rot = (t[0], t[1], t[2], t[4], t[5], t[6], t[8], t[9], t[10])
    return (xd0, xd1, xd2), rot


def forward_skinning(xc: jax.Array, weights: jax.Array, tfs: jax.Array):
    """AoS wrapper: returns ``(xd [M,3], fwd_rot [M,3,3])``."""
    (x0, x1, x2), rot = forward_skinning_soa(
        xc[:, 0], xc[:, 1], xc[:, 2], weights, tfs)
    xd = jnp.stack([x0, x1, x2], -1)
    M = xc.shape[0]
    fwd = jnp.stack(rot, -1).reshape(M, 3, 3)
    return xd, fwd
