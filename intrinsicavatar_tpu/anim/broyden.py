"""Broyden inverse-LBS root finding + candidate filtering + forward skinning.

TPU-native equivalent of the Fast-SNARF CUDA kernels
(taconite/IntrinsicAvatar):

  * :func:`broyden_search` — `fuse_cuda_kernel_fast.cu:253-419`
    (``broyden_kernel``): per (point x bone-init) lane, initialize the
    canonical guess with the bone's inverse rigid transform, then run <=10
    Broyden iterations on ``g(x) = J_vox(x) @ [x;1] - x_target`` where
    ``J_vox`` is a trilinear sample of the baked fwd-skinning transform voxel;
    rank-1 "good Broyden" updates of ``J^-1``; convergence |g|<1e-5,
    divergence |g|>1e-1; a root is valid only if its normalized grid coords
    lie in [-1,1].
  * :func:`filter_duplicates` — `filter.cu:10-54`: among converged candidates
    of a point, drop any whose root is within 1e-4 of a *later* candidate.
  * :func:`forward_skinning` — `deformer_torch.py:213-227` (``skinning_mask``).

The CUDA one-thread-per-lane loop becomes a ``lax.fori_loop`` over ``[M]``
lanes with done/valid masks — every lane is pure 3x3 algebra plus an 8-corner
gather, which XLA vectorizes across the lane axis.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Bone indices used as Broyden initializations (`deformer_torch.py:27`).
INIT_BONES = np.array([0, 1, 2, 4, 5, 10, 11, 12, 15, 16, 17, 18, 19],
                      dtype=np.int32)


def grid_sample_3d(vox: jax.Array, coords: jax.Array,
                   padding: str = "zeros") -> jax.Array:
    """Trilinear sampling of ``vox [C, D, H, W]`` at ``coords [N, 3]``.

    ``coords`` are (x, y, z) in [-1, 1] with align_corners=True semantics
    (matching both the inlined sampler of the Broyden kernel — zeros padding,
    `fuse_cuda_kernel_fast.cu:111-248` — and torch ``grid_sample`` with
    border padding used by ``query_weights``, `deformer_torch.py:199-211`).

    Returns ``[N, C]``.
    """
    C, D, H, W = vox.shape
    sizes = jnp.asarray([W, H, D], coords.dtype)
    # unnormalize: [-1,1] -> [0, size-1]
    i = (coords + 1.0) / 2.0 * (sizes - 1.0)
    if padding == "border":
        i = jnp.clip(i, 0.0, sizes - 1.0)
    p0 = jnp.floor(i)
    frac = i - p0
    p0 = p0.astype(jnp.int32)

    out = jnp.zeros((coords.shape[0], C), vox.dtype)
    vflat = vox.reshape(C, -1)
    size_i = jnp.asarray([W, H, D], jnp.int32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                cp = p0 + jnp.asarray([dx, dy, dz], jnp.int32)
                w = (
                    (frac[:, 0] if dx else 1.0 - frac[:, 0])
                    * (frac[:, 1] if dy else 1.0 - frac[:, 1])
                    * (frac[:, 2] if dz else 1.0 - frac[:, 2])
                )
                if padding == "border":
                    cpc = jnp.clip(cp, 0, size_i - 1)
                    ok = jnp.ones_like(w, dtype=bool)
                else:
                    ok = jnp.all((cp >= 0) & (cp < size_i), axis=-1)
                    cpc = jnp.clip(cp, 0, size_i - 1)
                flat_idx = (cpc[:, 2] * H + cpc[:, 1]) * W + cpc[:, 0]
                vals = vflat[:, flat_idx].T                  # [N, C]
                out = out + jnp.where(ok[:, None], w[:, None] * vals, 0.0)
    return out


def _broyden_jinv_update(J_inv, dx, dg):
    """Rank-1 'good Broyden' update (``fuse_J_inv_update``,
    `fuse_cuda_kernel_fast.cu:22-56`): J^-1 += (dx - J^-1 dg) (dx^T J^-1) / (dx^T J^-1 dg)."""
    c = jnp.einsum("...ji,...j->...i", J_inv, dx)       # dx^T J^-1 (row vec)
    s = jnp.einsum("...i,...i->...", c, dg)[..., None, None]
    r = -jnp.einsum("...ij,...j->...i", J_inv, dg)      # -J^-1 dg
    outer = (r + dx)[..., :, None] * c[..., None, :]
    return J_inv + outer / s


class BroydenResult(NamedTuple):
    xc: jax.Array      # [M, 3] converged canonical points (0 where invalid)
    j_inv: jax.Array   # [M, 3, 3] J^-1 at convergence (pre-final-update)
    valid: jax.Array   # [M] bool


@partial(jax.jit, static_argnames=("max_iters",))
def broyden_search(
    xd: jax.Array,          # [M, 3] deformed targets (lane-expanded)
    bone_idx: jax.Array,    # [M] int32 initialization bone per lane
    voxel_J: jax.Array,     # [12, D, H, W]
    tfs: jax.Array,         # [24, 4, 4]
    offset: jax.Array,      # [3] grid offset (bbox center)
    scale_kernel: jax.Array,  # [3] = 1/scale with z * ratio
    cvg_thresh: float = 1e-5,
    dvg_thresh: float = 1e-1,
    max_iters: int = 10,
) -> BroydenResult:
    M = xd.shape[0]
    dtype = xd.dtype

    def norm_coords(x):
        return scale_kernel[None, :] * (x - offset[None, :])

    def sample_J(x):
        """Blended 3x4 transform at canonical x: [M, 3, 4]."""
        return grid_sample_3d(voxel_J, norm_coords(x)).reshape(M, 3, 4)

    def g_of(J_local, x):
        return (jnp.einsum("mab,mb->ma", J_local[:, :, :3], x)
                + J_local[:, :, 3] - xd)

    # init: x = R_bone^T (xd - t_bone)
    Tb = tfs[bone_idx]                                   # [M,4,4]
    x0 = jnp.einsum("mba,mb->ma", Tb[:, :3, :3], xd - Tb[:, :3, 3])
    J0 = sample_J(x0)
    J_inv0 = jnp.swapaxes(J0[:, :, :3], -1, -2)          # transpose of rotation
    g0 = g_of(J0, x0)

    state = dict(
        x=x0, gx=g0, J_inv=J_inv0,
        done=jnp.zeros(M, bool), valid=jnp.zeros(M, bool),
        out_x=jnp.zeros_like(x0), out_J=jnp.zeros_like(J_inv0),
    )

    def body(_, s):
        active = ~s["done"]
        u = -jnp.einsum("mab,mb->ma", s["J_inv"], s["gx"])
        x_new = jnp.where(active[:, None], s["x"] + u, s["x"])
        Jl = sample_J(x_new)
        g_new = g_of(Jl, x_new)
        n2 = jnp.sum(g_new * g_new, -1)

        conv = active & (n2 < cvg_thresh**2)
        dvg = active & ~conv & (n2 > dvg_thresh**2)
        cont = active & ~conv & ~dvg

        nc = norm_coords(x_new)
        in_bounds = jnp.all((nc >= -1.0) & (nc <= 1.0), -1)

        out_x = jnp.where(conv[:, None], x_new, s["out_x"])
        out_J = jnp.where(conv[:, None, None], s["J_inv"], s["out_J"])
        valid = jnp.where(conv, in_bounds, s["valid"])

        J_upd = _broyden_jinv_update(s["J_inv"], u, g_new - s["gx"])
        J_inv = jnp.where(cont[:, None, None], J_upd, s["J_inv"])
        gx = jnp.where(cont[:, None], g_new, s["gx"])
        done = s["done"] | conv | dvg
        return dict(x=x_new, gx=gx, J_inv=J_inv, done=done, valid=valid,
                    out_x=out_x, out_J=out_J)

    s = jax.lax.fori_loop(0, max_iters, body, state)
    # Lanes that never converged (done by divergence or iteration cap) are
    # invalid; their outputs stay zero like the CUDA pre-zeroed buffers.
    valid = s["valid"]
    return BroydenResult(
        xc=jnp.where(valid[:, None], s["out_x"], 0.0),
        j_inv=jnp.where(valid[:, None, None], s["out_J"], 0.0),
        valid=valid,
    )


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


def forward_skinning(xc: jax.Array, weights: jax.Array, tfs: jax.Array):
    """LBS: canonical points + blend weights -> deformed points.

    Returns ``(xd [M,3], fwd_rot [M,3,3])`` — the blended transform's
    rotation block is what maps canonical normals to observation space when
    ``use_j_inv`` is off (`deformer_torch.py:213-227`).
    """
    w_tf = jnp.einsum("mj,jab->mab", weights, tfs)
    xd = jnp.einsum("mab,mb->ma", w_tf[:, :3, :3], xc) + w_tf[:, :3, 3]
    return xd, w_tf[:, :3, :3]
