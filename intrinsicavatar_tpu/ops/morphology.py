"""3D morphology: max pooling and connected components on voxel grids.

Equivalents of the reference's occupancy-grid post-processing
(`models/utils.py:152-163` ``max_connected_component`` from InstantAvatar and
``F.max_pool3d`` dilation in `models/occ_grid/temporal_occ_grid.py:394-411`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def max_pool3d(x: jax.Array, kernel: int = 3) -> jax.Array:
    """3x3x3 (same-padded) max pool over a ``[D, H, W]`` grid."""
    pad = kernel // 2
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else 0,
        jax.lax.max,
        window_dimensions=(kernel, kernel, kernel),
        window_strides=(1, 1, 1),
        padding=[(pad, pad)] * 3,
    )


@partial(jax.jit, static_argnames=("iters",))
def max_connected_component(grid: jax.Array, iters: int | None = None):
    """Label connected components by iterated max-propagation, then keep the
    largest.

    Matches the reference (`models/utils.py:152-163` + usage at
    `temporal_occ_grid.py:407-411`): seed each occupied voxel with a unique
    id, propagate the max through 3^3 neighborhoods ``3*W`` times, then keep
    the component whose label is the *mode* among occupied voxels.

    Args:
      grid: ``[D, H, W]`` bool occupancy.
    Returns:
      ``[D, H, W]`` bool: the largest connected component.
    """
    D, H, W = grid.shape
    if iters is None:
        iters = 3 * W
    comp = (jnp.arange(grid.size, dtype=jnp.float32) + 1.0).reshape(grid.shape)
    comp = jnp.where(grid, comp, 0.0)

    def body(_, c):
        return jnp.where(grid, max_pool3d(c), 0.0)

    comp = jax.lax.fori_loop(0, iters, body, comp)

    # mode of labels among occupied voxels == largest component
    labels = comp.reshape(-1).astype(jnp.int32)
    occ = grid.reshape(-1)
    counts = jnp.zeros((grid.size + 1,), jnp.int32).at[
        jnp.where(occ, labels, 0)
    ].add(1)
    counts = counts.at[0].set(0)
    mode = jnp.argmax(counts).astype(jnp.int32)
    return (comp == mode.astype(comp.dtype)).reshape(grid.shape) & grid
