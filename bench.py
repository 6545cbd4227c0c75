"""Benchmark: training-step ray throughput on the flagship model.

Runs the full jitted training step (radiance + 2-round importance sampling,
the regime that dominates the reference's 25k-step schedule before the PBR
kick-in) at reference scale — 4096 rays x 128 samples/ray, 64^3 occupancy
grid, Broyden inverse skinning — on whatever accelerator JAX provides, and
prints ONE JSON line:

    {"metric": "train_rays_per_sec", "value": N, "unit": "rays/s",
     "vs_baseline": null}

The reference publishes no throughput numbers (BASELINE.md): vs_baseline is
null until a measured RTX-3090 figure exists.
"""

import json
import sys
import time

import numpy as np


def main():
    import os
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(
                              os.path.abspath(__file__)), ".jax_cache"))
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    import jax.numpy as jnp

    from intrinsicavatar_tpu.train.system import IntrinsicAvatarSystem
    from intrinsicavatar_tpu.utils.default_config import default_config
    from intrinsicavatar_tpu.utils.config import merge

    n_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    bench_step = 5000  # radiance + importance regime

    cfg = default_config()
    # bench-only shrink: the synthetic body needs no 128^3 skinning voxel
    cfg = merge(cfg, {"model": {"deformer": {"rigid_deformer": {
        "deformer_config": {"resolution": 64}}}}})
    # 4096-ray backward exceeds 16GB v5e HBM monolithically; two averaged
    # 2048-ray microbatches per optimizer step fit with headroom
    if n_rays >= 4096:
        cfg.trainer.grad_accum = 2
    system = IntrinsicAvatarSystem(cfg)
    state = system.setup(np.zeros(10), jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    target = np.array([0.0, 0.3, 2.0]) + rng.normal(scale=0.12,
                                                    size=(n_rays, 3))
    rays_o = np.zeros((n_rays, 3), np.float32)
    rays_d = (target / np.linalg.norm(target, axis=-1, keepdims=True)
              ).astype(np.float32)
    batch = {
        "rays": jnp.asarray(np.concatenate(
            [rays_o, rays_d, np.full((n_rays, 1), 1.0, np.float32),
             np.full((n_rays, 1), 3.0, np.float32)], -1)),
        "rgb": jnp.asarray(rng.uniform(size=(n_rays, 3)).astype(np.float32)),
        "alpha": jnp.ones((n_rays,)),
        "index": jnp.asarray([0]),
        "betas": jnp.zeros(10),
        "body_pose": jnp.zeros(69),
        "global_orient": jnp.zeros(3),
        "transl": jnp.asarray([0.0, 0.3, 2.0]),
    }

    state = state._replace(step=jnp.asarray(bench_step, jnp.int32))
    flags = system.flags_for_step(bench_step)

    # warmup / compile (forcing a real device sync through the tunnel)
    for _ in range(2):
        state, losses = system.train_step(state, batch, 0.0, flags)
    float(losses["total"])

    n_iters = 5
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, losses = system.train_step(state, batch, 0.0, flags)
    float(losses["total"])
    dt = time.perf_counter() - t0

    rays_per_sec = n_rays * n_iters / dt
    print(json.dumps({
        "metric": "train_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception:
        # fall back to half the ray batch (e.g. HBM headroom on small chips)
        import traceback
        traceback.print_exc()
        sys.argv = [sys.argv[0], "2048"]
        main()
