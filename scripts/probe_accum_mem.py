"""Compile-only memory probe for the fused grad-accum step.

Lowers and compiles the exact bench radiance-regime step (4096 rays,
grad_accum 2 -> 2048-ray microbatch) WITHOUT running it, and prints the
XLA memory analysis.  Exists because the round-5 ``lax.scan`` form of
the accum loop OOMed at compile (18.19 G vs 15.75 G HBM, ~15 G of it
tiled-layout padding on ``[N, 2]`` temps inside the while body); the
unrolled form must show the regression gone before bench re-runs.

Usage: python scripts/probe_accum_mem.py [n_rays] [grad_accum] [step]
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import build_system, make_batch  # noqa: E402


def main():
    n_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    accum = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    step = int(sys.argv[3]) if len(sys.argv) > 3 else 5000
    system, state = build_system(grad_accum=accum)
    batch = make_batch(n_rays)
    state = state._replace(step=jnp.asarray(step, jnp.int32))
    flags = system.flags_for_step(step)
    intervals, _, seed_grid = system.sample_step(state, batch, 0.0, flags)

    low = system._train_step_accum.lower(state, batch, 0.0, flags,
                                         intervals, accum, seed_grid)
    comp = low.compile()
    ma = comp.memory_analysis()
    print("argument", getattr(ma, "argument_size_in_bytes", None))
    print("output  ", getattr(ma, "output_size_in_bytes", None))
    print("temp    ", getattr(ma, "temp_size_in_bytes", None))
    print("peak GiB",
          (ma.argument_size_in_bytes + ma.temp_size_in_bytes) / 2**30)


if __name__ == "__main__":
    main()
