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

    # TPU layout notes: (a) all per-corner work is kept in [N, L]-shaped
    # (or flat [N*L*F]) arrays — never [N, L, 8, F] — because minor dims of
    # 2/3/8 pad to 128 lanes on TPU (observed 16-64x HBM expansion);
    # (b) x may carry gradients, so components come from one-hot
    # contractions, not slices (slice-backward pads SIGILL the TPU fusion
    # pass — see ops.math.take_channel).
    from intrinsicavatar_tpu.ops.math import vec3_components
    xx, xy, xz = vec3_components(x)
    px = xx[:, None] * scales[None, :] + 0.5              # [N,L]
    py = xy[:, None] * scales[None, :] + 0.5
    pz = xz[:, None] * scales[None, :] + 0.5
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    z0 = jnp.floor(pz)
    fx, fy, fz = px - x0, py - y0, pz - z0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    z0 = z0.astype(jnp.int32)

    level_base = (jnp.arange(L, dtype=jnp.int32) * T)[None, :]
    table_flat = table.reshape(L * T * F)
    farange = jnp.arange(F, dtype=jnp.int32)

    out = jnp.zeros((N, L * F), x.dtype)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                cx = jnp.clip(x0 + dx, 0, res - 1)
                cy = jnp.clip(y0 + dy, 0, res - 1)
                cz = jnp.clip(z0 + dz, 0, res - 1)
                dense_idx = cx + cy * res + cz * res * res
                h = (cx.astype(jnp.uint32) * np.uint32(_PRIMES[0])
                     ^ cy.astype(jnp.uint32) * np.uint32(_PRIMES[1])
                     ^ cz.astype(jnp.uint32) * np.uint32(_PRIMES[2]))
                hash_idx = (h & np.uint32(T - 1)).astype(jnp.int32)
                idx = jnp.where(dense[None, :], dense_idx % T, hash_idx)
                w = ((fx if dx else 1.0 - fx)
                     * (fy if dy else 1.0 - fy)
                     * (fz if dz else 1.0 - fz))          # [N, L]
                # flat gather of all F features, laid out [N, L*F] directly
                flat = (jnp.repeat((idx + level_base) * F, F, axis=1)
                        + jnp.tile(farange, L)[None, :])
                feats = jnp.take(table_flat, flat.reshape(-1),
                                 axis=0).reshape(N, L * F)
                out = out + feats * jnp.repeat(w, F, axis=1)

    if level_mask is not None:
        out = out * level_mask[None, :]
    if spec.include_xyz:
        out = jnp.concatenate([x * spec.xyz_scale + spec.xyz_offset, out], -1)
    return out


def hashgrid_encode_vjp_x(
    table: jax.Array,
    x: jax.Array,
    spec: HashGridSpec,
    g: jax.Array,
    level_mask: jax.Array | None = None,
) -> jax.Array:
    """Closed-form ``(dEnc/dx)^T g`` — the encode's input pullback without
    autodiff.

    The trilinear weight of corner ``(dx,dy,dz)`` is ``wx*wy*wz`` with
    ``wx = fx`` or ``1-fx``; its x-derivative is ``(+-scale_l) * wy * wz``.
    Contracted on the fly with the cotangent ``g [N, n_output_dims]``
    (ordered ``[xyz?, L*F]`` like :func:`hashgrid_encode`).

    Exists so the SDF point gradient is an explicit first-order graph: the
    XLA:TPU fusion pass SIGILLs when jax's vjp-of-encode fuses with the MLP
    backward (see fields/geometry.py).
    """
    N = x.shape[0]
    L, T, F = table.shape
    scales = jnp.asarray(spec.scales, x.dtype)
    res = jnp.asarray(spec.resolutions, jnp.int32)
    dense = jnp.asarray(spec.dense_levels)

    if spec.include_xyz:
        from intrinsicavatar_tpu.ops.math import split_channels
        g_xyz, g = split_channels(g, [3, L * F])
    if level_mask is not None:
        g = g * level_mask[None, :]

    from intrinsicavatar_tpu.ops.math import vec3_components
    xx, xy, xz = vec3_components(x)
    px = xx[:, None] * scales[None, :] + 0.5
    py = xy[:, None] * scales[None, :] + 0.5
    pz = xz[:, None] * scales[None, :] + 0.5
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    z0 = jnp.floor(pz)
    fx, fy, fz = px - x0, py - y0, pz - z0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    z0 = z0.astype(jnp.int32)

    level_base = (jnp.arange(L, dtype=jnp.int32) * T)[None, :]
    table_flat = table.reshape(L * T * F)
    farange = jnp.arange(F, dtype=jnp.int32)

    gx = jnp.zeros((N, L), x.dtype)
    gy = jnp.zeros((N, L), x.dtype)
    gz = jnp.zeros((N, L), x.dtype)
    for dx in (0, 1):
        wx = fx if dx else 1.0 - fx
        sx = 1.0 if dx else -1.0
        for dy in (0, 1):
            wy = fy if dy else 1.0 - fy
            sy = 1.0 if dy else -1.0
            for dz in (0, 1):
                wz = fz if dz else 1.0 - fz
                sz = 1.0 if dz else -1.0
                cx = jnp.clip(x0 + dx, 0, res - 1)
                cy = jnp.clip(y0 + dy, 0, res - 1)
                cz = jnp.clip(z0 + dz, 0, res - 1)
                dense_idx = cx + cy * res + cz * res * res
                h = (cx.astype(jnp.uint32) * np.uint32(_PRIMES[0])
                     ^ cy.astype(jnp.uint32) * np.uint32(_PRIMES[1])
                     ^ cz.astype(jnp.uint32) * np.uint32(_PRIMES[2]))
                hash_idx = (h & np.uint32(T - 1)).astype(jnp.int32)
                idx = jnp.where(dense[None, :], dense_idx % T, hash_idx)
                flat = (jnp.repeat((idx + level_base) * F, F, axis=1)
                        + jnp.tile(farange, L)[None, :])
                feats = jnp.take(table_flat, flat.reshape(-1),
                                 axis=0).reshape(N, L * F)
                # per-level contraction of cotangent with corner features
                fg = (feats * g).reshape(N, L, F).sum(-1)     # [N, L]
                gx = gx + fg * (sx * wy * wz)
                gy = gy + fg * (wx * sy * wz)
                gz = gz + fg * (wx * wy * sz)

    # chain the input scaling: d pos/d x = scale_l (per level)
    out = jnp.stack([
        jnp.sum(gx * scales[None, :], -1),
        jnp.sum(gy * scales[None, :], -1),
        jnp.sum(gz * scales[None, :], -1),
    ], axis=-1)
    if spec.include_xyz:
        out = out + g_xyz * spec.xyz_scale
    return out
