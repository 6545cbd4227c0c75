"""Multi-level hash-grid encoding (Instant-NGP style) in pure JAX.

TPU-native replacement for tiny-cuda-nn's ``HashGrid`` encoding
(`models/network_utils.py:58-100` and
`configs/geometry/progressive_hash_grid.yaml` in taconite/IntrinsicAvatar:
16 levels x 2 features, 2^19 table, base resolution 16, growth 1.4473,
linear interpolation).

The encode is a batched gather (8 corners x L levels) + trilinear blend —
expressed so XLA emits one fused gather from a single ``[L*T, F]`` table.
A fused Pallas kernel (gather + MLP) is the planned fast path; this module
is the reference implementation and the drop-in used under ``jax.grad``.

Progressive level masking lives in ``ops.encoding.hashgrid_level_mask``.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

# tcnn's spatial hash primes (instant-ngp, Mueller et al. 2022)
_PRIMES = (1, 2654435761, 805459861)


@dataclasses.dataclass(frozen=True)
class HashGridSpec:
    """Static geometry of a multi-level hash grid."""

    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 1.447269237440378
    include_xyz: bool = False
    xyz_scale: float = 2.0
    xyz_offset: float = -1.0

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def scales(self) -> np.ndarray:
        # tcnn grid_scale: 2^(l * log2(growth)) * base - 1
        l = np.arange(self.n_levels)
        return np.exp2(l * np.log2(self.per_level_scale)) * self.base_resolution - 1.0

    @property
    def resolutions(self) -> np.ndarray:
        return np.ceil(self.scales).astype(np.int32) + 1

    @property
    def dense_levels(self) -> np.ndarray:
        """Levels small enough to index densely instead of hashing."""
        return (self.resolutions.astype(np.int32) ** 3) <= self.table_size

    @property
    def n_output_dims(self) -> int:
        d = self.n_levels * self.n_features_per_level
        if self.include_xyz:
            d += 3
        return d


def init_hashgrid(key: jax.Array, spec: HashGridSpec,
                  dtype=jnp.float32) -> jax.Array:
    """Hash table parameters ``[n_levels, table_size, F]``, U(-1e-4, 1e-4)."""
    return jax.random.uniform(
        key,
        (spec.n_levels, spec.table_size, spec.n_features_per_level),
        dtype=dtype, minval=-1e-4, maxval=1e-4,
    )


def _corner_offsets() -> np.ndarray:
    g = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1], indexing="ij"), -1)
    return g.reshape(8, 3)  # [8,3]


def hashgrid_encode(
    table: jax.Array,
    x: jax.Array,
    spec: HashGridSpec,
    level_mask: jax.Array | None = None,
) -> jax.Array:
    """Encode points ``x in [0,1]^3`` -> ``[N, n_output_dims]`` features.

    Matches tcnn HashGrid math: per level ``pos = x*scale + 0.5``,
    trilinear blend of 8 corner features; dense stride indexing when the
    level's grid fits in the table, otherwise the xor-prime spatial hash.
    ``level_mask`` (``[L*F]``) implements ProgressiveBandHashGrid masking.
    ``include_xyz`` prepends ``x*xyz_scale + xyz_offset`` (the reference's
    CompositeEncoding, `models/network_utils.py:156-176`).
    """
    N = x.shape[0]
    L, T, F = table.shape
    scales = jnp.asarray(spec.scales, x.dtype)            # [L]
    res = jnp.asarray(spec.resolutions, jnp.int32)        # [L]
    dense = jnp.asarray(spec.dense_levels)                # [L] bool

    pos = x[:, None, :] * scales[None, :, None] + 0.5     # [N,L,3]
    p0 = jnp.floor(pos)
    w = pos - p0                                          # [N,L,3]
    p0 = p0.astype(jnp.int32)

    offs = jnp.asarray(_corner_offsets(), jnp.int32)      # [8,3]
    cp = p0[:, :, None, :] + offs[None, None]             # [N,L,8,3]
    cp = jnp.clip(cp, 0, (res - 1)[None, :, None, None])

    # dense stride index
    dense_idx = cp[..., 0] + cp[..., 1] * res[None, :, None] \
        + cp[..., 2] * (res * res)[None, :, None]
    # xor-prime hash index
    cpu = cp.astype(jnp.uint32)
    h = (cpu[..., 0] * np.uint32(_PRIMES[0])
         ^ cpu[..., 1] * np.uint32(_PRIMES[1])
         ^ cpu[..., 2] * np.uint32(_PRIMES[2]))
    hash_idx = (h & np.uint32(T - 1)).astype(jnp.int32)

    idx = jnp.where(dense[None, :, None], dense_idx % T, hash_idx)  # [N,L,8]
    level_base = (jnp.arange(L, dtype=jnp.int32) * T)[None, :, None]
    flat = (idx + level_base).reshape(-1)

    feats = table.reshape(L * T, F)[flat].reshape(N, L, 8, F)

    # trilinear weights: prod over axes of (1-w) or w per corner bit
    cw = jnp.where(offs[None, None].astype(bool), w[:, :, None, :],
                   1.0 - w[:, :, None, :])                # [N,L,8,3]
    cw = cw[..., 0] * cw[..., 1] * cw[..., 2]             # [N,L,8]

    out = jnp.einsum("nlcf,nlc->nlf", feats, cw).reshape(N, L * F)
    if level_mask is not None:
        out = out * level_mask[None, :]
    if spec.include_xyz:
        out = jnp.concatenate([x * spec.xyz_scale + spec.xyz_offset, out], -1)
    return out
