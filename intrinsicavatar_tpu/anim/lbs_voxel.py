"""LBS weight voxel: construction, normalization, per-frame transform baking.

TPU-native equivalents of the Fast-SNARF explicit representation
(taconite/IntrinsicAvatar):

  * weight voxel init = KNN(K=30) inverse-distance blend of SMPL skinning
    weights + 30 Laplacian smoothing iterations
    (`models/deformers/fast_snarf/deformer_torch.py:234-253`),
  * the anisotropic grid normalization (z axis at 1/4 resolution,
    `deformer_torch.py:147-180` ``switch_to_explicit``),
  * per-frame baking of the blended fwd-skinning transform voxel ``voxel_J``
    and skinned position voxel ``voxel_d`` — the CUDA ``precompute`` kernel
    (`cuda/precompute/precompute.cu:24-103`) becomes one einsum.

Grid layout: ``[C, D, H, W]`` with D = resolution//4 (z), H = W = resolution
(y, x), matching the reference exactly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from intrinsicavatar_tpu.ops.knn import knn_points


@dataclasses.dataclass(frozen=True)
class VoxelSpec:
    """Static normalization of the canonical LBS grid.

    ``normalize(x) = ((x - offset) / scale) * (1, 1, ratio)`` maps canonical
    points into the grid's [-1,1]^3 coordinate frame.
    """

    resolution: int           # W == H; D = resolution // 4
    offset: np.ndarray        # [3] bbox center
    scale: float              # scalar half-extent * global_scale
    global_scale: float = 1.2

    @property
    def ratio(self) -> float:
        return float(self.resolution / (self.resolution // 4))

    @property
    def shape_dhw(self):
        return (self.resolution // 4, self.resolution, self.resolution)

    @property
    def scale_kernel(self) -> np.ndarray:
        """Per-axis multiplier used by the Broyden kernel: 1/scale, z*ratio."""
        s = np.full(3, 1.0 / self.scale, np.float32)
        s[2] *= self.ratio
        return s

    @property
    def bbox(self) -> np.ndarray:
        """Axis-aligned bbox of the grid in canonical space ``[2,3]``."""
        corner = np.full(3, self.scale, np.float32)
        corner[2] /= self.ratio
        return np.stack([self.offset - corner, self.offset + corner])

    def normalize(self, x):
        out = (x - jnp.asarray(self.offset, x.dtype)) / self.scale
        return out * jnp.asarray([1.0, 1.0, self.ratio], x.dtype)

    def denormalize(self, x):
        out = x / jnp.asarray([1.0, 1.0, self.ratio], x.dtype)
        return out * self.scale + jnp.asarray(self.offset, x.dtype)


def make_voxel_spec(smpl_verts: np.ndarray, resolution: int = 128,
                    global_scale: float = 1.2) -> VoxelSpec:
    """Grid frame around the canonical SMPL body (`deformer_torch.py:155-160`)."""
    v = np.asarray(smpl_verts).reshape(-1, 3)
    mn, mx = v.min(0), v.max(0)
    offset = (mn + mx) / 2.0
    scale = float((mx - mn).max() / 2.0 * global_scale)
    return VoxelSpec(resolution=resolution, offset=offset.astype(np.float32),
                     scale=scale, global_scale=global_scale)


def grid_points(spec: VoxelSpec) -> jax.Array:
    """Canonical-space positions of all voxel centers, ``[D*H*W, 3]``.

    Built exactly as the reference: linspace(-1,1) per axis in normalized
    coords, then denormalized (`deformer_torch.py:147-153,182`).
    """
    d, h, w = spec.shape_dhw
    x = jnp.linspace(-1.0, 1.0, w)
    y = jnp.linspace(-1.0, 1.0, h)
    z = jnp.linspace(-1.0, 1.0, d)
    zz, yy, xx = jnp.meshgrid(z, y, x, indexing="ij")
    norm = jnp.stack([xx, yy, zz], -1).reshape(-1, 3)
    return spec.denormalize(norm)


def make_weight_voxel(smpl_verts: jax.Array, smpl_weights: jax.Array,
                      spec: VoxelSpec, k: int = 30,
                      smooth_iters: int = 30) -> jax.Array:
    """Build the ``[24, D, H, W]`` LBS weight voxel.

    Matches ``query_weights_smpl`` (`deformer_torch.py:234-253`): KNN
    inverse-distance blend (dists clamped to [1e-4, 1]) followed by 30
    interior Laplacian smoothing steps with 0.7 blending and per-voxel
    renormalization.
    """
    pts = grid_points(spec)
    d2, idx = knn_points(pts, smpl_verts, k)
    dist = jnp.clip(jnp.sqrt(d2), 1e-4, 1.0)
    ws = 1.0 / dist
    ws = ws / jnp.sum(ws, -1, keepdims=True)
    w = jnp.einsum("nk,nkj->nj", ws, smpl_weights[idx])     # [N,24]

    d, h, wd = spec.shape_dhw
    vox = w.T.reshape(24, d, h, wd)

    def smooth(_, v):
        mean = (
            v[:, 2:, 1:-1, 1:-1] + v[:, :-2, 1:-1, 1:-1]
            + v[:, 1:-1, 2:, 1:-1] + v[:, 1:-1, :-2, 1:-1]
            + v[:, 1:-1, 1:-1, 2:] + v[:, 1:-1, 1:-1, :-2]
        ) / 6.0
        interior = (v[:, 1:-1, 1:-1, 1:-1] - mean) * 0.7 + mean
        v = v.at[:, 1:-1, 1:-1, 1:-1].set(interior)
        return v / jnp.sum(v, 0, keepdims=True)

    return jax.lax.fori_loop(0, smooth_iters, smooth, vox)


def precompute_transform_voxels(weight_voxel: jax.Array, tfs: jax.Array,
                                spec: VoxelSpec):
    """Bake per-frame transform voxels from bone transforms.

    The CUDA precompute kernel (`precompute.cu:24-103`) as two einsums:

      voxel_J [12, D, H, W] — LBS-blended 3x4 transform per voxel,
      voxel_d [3, D, H, W]  — forward-skinned position of each voxel center.

    Args:
      weight_voxel: ``[24, D, H, W]``.
      tfs: ``[24, 4, 4]`` canonical->deformed bone transforms.
    """
    d, h, w = spec.shape_dhw
    J = jnp.einsum("jdhw,jab->abdhw", weight_voxel,
                   tfs[:, :3, :4])                     # [3,4,D,H,W]
    pts = grid_points(spec).T.reshape(3, d, h, w)
    voxel_d = jnp.einsum("abdhw,bdhw->adhw", J[:, :3], pts) + J[:, 3]
    voxel_J = J.reshape(12, d, h, w)
    return voxel_d, voxel_J
