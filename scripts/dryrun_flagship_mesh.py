"""AOT-compile the FLAGSHIP-size sharded training step over a device mesh.

The driver's ``dryrun_multichip`` executes one tiny-config step on an
8-device virtual mesh; this script closes the remaining gap (VERDICT r3
"weak 6"): the flagship regime — default_config, 4096 rays x 128 samples,
512-spp physically-based secondary scattering, grad-accum microbatching —
has to *compile* over the mesh too, or a sharding-layout surprise at real
shapes stays invisible until an 8-chip pod run.

``jax.jit(...).lower(...).compile()`` runs the full XLA pipeline
(sharding propagation, collective insertion, layout assignment, memory
planning) without executing, so it is tractable on the CPU backend at
flagship shapes.  Prints the compiler's memory analysis per device.

Usage::

    python scripts/dryrun_flagship_mesh.py [n_devices] [n_rays]
"""

import os
import sys

N_DEV = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N_RAYS = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={N_DEV}")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from __graft_entry__ import _make_batch  # noqa: E402
from intrinsicavatar_tpu.train.system import IntrinsicAvatarSystem  # noqa: E402
from intrinsicavatar_tpu.utils.default_config import default_config  # noqa: E402
from intrinsicavatar_tpu.utils.config import merge  # noqa: E402
from intrinsicavatar_tpu.parallel.sharding import (  # noqa: E402
    make_mesh, batch_shardings, replicated,
)


def main():
    devices = jax.devices("cpu")[:N_DEV]
    assert len(devices) == N_DEV, devices
    cfg = default_config()
    # the bench-regime shrink (synthetic body needs no 128^3 skinning voxel)
    cfg = merge(cfg, {"model": {"deformer": {"rigid_deformer": {
        "deformer_config": {"resolution": 64}}}}})
    cfg.trainer.grad_accum = 4
    system = IntrinsicAvatarSystem(cfg)
    state = system.setup(np.zeros(10), jax.random.PRNGKey(0))
    batch = _make_batch(N_RAYS)

    mesh = make_mesh(devices)
    step_flags = system.flags_for_step(15000)   # phys + importance regime
    assert step_flags.enable_phys

    def step_fn(state, batch, t_idx):
        return system.train_step_impl(state, batch, t_idx, step_flags)

    jitted = jax.jit(step_fn, in_shardings=(
        replicated(mesh, state), batch_shardings(mesh, batch),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())))
    lowered = jitted.lower(state, batch, 0.0)
    compiled = lowered.compile()
    try:
        ma = compiled.memory_analysis()
        print(f"flagship mesh compile ok: {N_DEV} devices, {N_RAYS} rays, "
              f"512 spp, grad_accum {cfg.trainer.grad_accum}")
        print(f"  per-device: args {ma.argument_size_in_bytes / 2**20:.0f} "
              f"MiB, output {ma.output_size_in_bytes / 2**20:.0f} MiB, "
              f"temp {ma.temp_size_in_bytes / 2**20:.0f} MiB, "
              f"peak total ~{(ma.argument_size_in_bytes + ma.output_size_in_bytes + ma.temp_size_in_bytes) / 2**30:.2f} GiB")
    except Exception as e:  # memory_analysis is backend-best-effort
        print(f"flagship mesh compile ok ({N_DEV} devices, {N_RAYS} rays); "
              f"memory analysis unavailable: {e}")


if __name__ == "__main__":
    main()
