"""intrinsicavatar_tpu — a TPU-native (JAX/XLA/Pallas) inverse-rendering framework.

A from-scratch rebuild of the capabilities of IntrinsicAvatar (CVPR 2024,
reference implementation `taconite/IntrinsicAvatar`): physically based inverse
rendering of dynamic humans from monocular video via explicit volumetric ray
tracing of an articulated canonical neural SDF.

Design stance (TPU-first, not a port):
  * All sample streams are rectangular ``[n_rays, S_max]`` tensors with boolean
    validity masks — no ragged packed layouts, no pack/unpack kernels.
  * Ray marching, importance resampling, inverse-LBS root finding and
    path-traced shading are jit-compiled end to end with static shapes.
  * Hot inner ops (hash-grid encoding, fused field queries) have Pallas TPU
    kernels with pure-jnp reference implementations used for testing.
  * Multi-chip scaling shards the ray/sample axis over a
    ``jax.sharding.Mesh`` with replicated field parameters (data parallel over
    rays; `psum` for gradients).

Package layout:
  ops/       pure-jnp + Pallas core math (volume rendering scans, CDF
             resampling, grid traversal, encodings, hash grids, KNN, morphology)
  nets/      MLP zoo (sphere-init SDF MLP, conditional MLP, Lipschitz MLP)
  fields/    canonical neural fields (SDF geometry, radiance, density, material)
  anim/      articulation (SMPL body model, LBS voxels, Broyden inverse
             skinning, rigid/non-rigid deformers, pose encoders/corrections)
  pbr/       physically based rendering (environment lights, BRDFs/phase
             functions, volume-interaction sampling)
  render/    the composed volumetric path tracer + occupancy grids
  train/     losses, schedules, optimizer factory, the training system
  data/      dataset loaders, ray generation, pixel samplers
  parallel/  device-mesh sharding of the train/render step
  utils/     config system, checkpointing, image/mesh IO, metrics
"""

__version__ = "0.1.0"

from intrinsicavatar_tpu.registry import make, register  # noqa: F401
