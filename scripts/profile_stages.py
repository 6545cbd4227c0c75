"""Stage-attribution profiler for the bench regimes.

One measurement per process (HBM stays clean between variants):

    python scripts/profile_stages.py phys                 # full step, bench regime
    python scripts/profile_stages.py phys --no-phys       # radiance path at the same step
    python scripts/profile_stages.py phys --forward-only  # loss eval, no backward
    python scripts/profile_stages.py phys --spp 128
    python scripts/profile_stages.py phys --max-occ 4
    python scripts/profile_stages.py phys --coarse-f32
    python scripts/profile_stages.py phys --no-importance
    python scripts/profile_stages.py relight --chunk 1024
    python scripts/profile_stages.py radiance

Prints one JSON line: {"variant": ..., "ms_per_step": ..., "rays_per_sec": ...}.
Differences between variants attribute wall time to stages the way the
reference attributes CUDA time with torch.profiler (SURVEY.md §5 tracing).
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import _setup_jax, make_batch, build_system  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("what", choices=["phys", "radiance", "relight"])
    ap.add_argument("--n-rays", type=int, default=4096)
    ap.add_argument("--spp", type=int, default=None)
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--grad-accum", type=int, default=None)
    ap.add_argument("--no-phys", action="store_true")
    ap.add_argument("--forward-only", action="store_true")
    ap.add_argument("--no-importance", action="store_true")
    ap.add_argument("--coarse-f32", action="store_true")
    ap.add_argument("--fine-bf16", action="store_true")
    ap.add_argument("--max-occ", type=int, default=None)
    ap.add_argument("--sec-samples", type=int, default=None)
    ap.add_argument("--concentrate", type=int, default=None)
    ap.add_argument("--adaptive", action="store_true")
    ap.add_argument("--no-seed", action="store_true",
                    help="disable the seeded secondary fine-pass polish")
    ap.add_argument("--seed-iters", type=int, default=None)
    ap.add_argument("--primary-f32", action="store_true",
                    help="primary shading pass in float32 (default bf16)")
    ap.add_argument("--no-resample-light", action="store_true",
                    help="sample-once light directions at eval")
    ap.add_argument("--no-seed-grid", action="store_true",
                    help="disable the per-frame baked correspondence grid "
                         "(eval regimes fall back to the full search)")
    ap.add_argument("--seed-grid-res", type=int, default=None)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--set", action="append", default=[], metavar="K=V",
                    help="generic dotted model-config override, e.g. "
                         "--set seed_grid_polish_iters=3 (keys are relative "
                         "to model.*; values parsed as JSON when possible)")
    args = ap.parse_args()

    jax = _setup_jax()
    import jax.numpy as jnp

    extra = {"model": {}}
    if args.spp is not None:
        extra["model"]["samples_per_pixel"] = args.spp
    if args.no_importance:
        extra["model"]["secondary_importance_sample"] = False
    if args.coarse_f32:
        extra["model"]["secondary_coarse_dtype"] = "float32"
    if args.fine_bf16:
        extra["model"]["secondary_fine_dtype"] = "bfloat16"
    if args.max_occ is not None:
        extra["model"]["secondary_max_valid_samples"] = args.max_occ
    if args.sec_samples is not None:
        extra["model"]["num_samples_per_secondary_ray"] = args.sec_samples
    if args.concentrate is not None:
        extra["model"]["march_concentrate"] = args.concentrate
    if args.adaptive:
        extra["model"]["adaptive_query_compaction"] = True
    if args.no_seed:
        extra["model"]["secondary_seed_fine"] = False
    if args.seed_iters is not None:
        extra["model"]["deformer"] = {"rigid_deformer": {"deformer_config": {
            "seed_polish_iters": args.seed_iters}}}
    if args.primary_f32:
        extra["model"]["primary_dtype"] = "float32"
    if args.no_resample_light:
        extra["model"]["resample_light"] = False
    if args.no_seed_grid:
        extra["model"]["eval_seed_grid"] = False
    if args.seed_grid_res is not None:
        extra["model"]["seed_grid_resolution"] = args.seed_grid_res
    for kv in args.set:
        k, _, v = kv.partition("=")
        try:
            v = json.loads(v)
        except ValueError:
            pass
        node = extra["model"]
        parts = k.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v

    label = " ".join(sys.argv[1:])

    if args.what == "relight":
        from intrinsicavatar_tpu.train.evaluate import render_frame
        rng = np.random.default_rng(1)
        extra["model"].setdefault("samples_per_pixel", 1024)
        extra["model"]["light"] = {
            "name": "envlight-tensor", "envlight_config": {"base_res": 64}}
        system, state = build_system(extra=extra)
        flags = system.flags_for_step(25000, training=False)._replace(
            render_mode="light")
        batch = make_batch(args.chunk, rng=rng)
        batch["hdri"] = jnp.asarray(
            rng.uniform(0.0, 2.0, size=(64, 128, 3)).astype(np.float32))
        spp = extra["model"]["samples_per_pixel"]
        out = render_frame(system, state.params, batch, 25000,
                           jax.random.PRNGKey(0), flags,
                           ray_chunk=args.chunk)
        float(np.sum(out["comp_rgb_phys_full"]))
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = render_frame(system, state.params, batch, 25000,
                               jax.random.PRNGKey(1 + i), flags,
                               ray_chunk=args.chunk)
        float(np.sum(out["comp_rgb_phys_full"]))
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({
            "variant": label, "ms": round(dt * 1e3, 1),
            "spp_px_per_sec": round(args.chunk * spp / dt, 1)}), flush=True)
        return

    step = 15000 if args.what == "phys" else 5000
    ga = args.grad_accum or (
        (4 if args.n_rays >= 4096 else 2) if args.what == "phys"
        else (2 if args.n_rays >= 4096 else 1))
    system, state = build_system(extra=extra, grad_accum=ga)
    batch = make_batch(args.n_rays)
    state = state._replace(step=jnp.asarray(step, jnp.int32))
    flags = system.flags_for_step(step)
    if args.no_phys:
        flags = flags._replace(enable_phys=False)

    if args.forward_only:
        # loss-only closure: the train_step body minus backward+update
        # (mirrors train_step_impl's loss_fn, same sample_step split)
        import functools

        @functools.partial(jax.jit, static_argnums=(3,))
        def loss_only(state, batch, intervals, flags):
            rng, k_bg, k_fwd = jax.random.split(state.rng, 3)
            bg = jax.random.uniform(k_bg, (3,))
            frame, cond = system.model.prepare(
                state.params, system.statics, batch, state.step)
            out = system.model.forward(
                state.params, system.statics, frame, cond, state.occ,
                batch["rays"], k_fwd, state.step, flags, t_idx=0.0,
                background_color=bg, intervals=intervals)
            loss, _ = system.compute_losses(state.params, out, batch,
                                            state.step, flags)
            return loss

        iv, _, _ = system.sample_step(state, batch, 0.0, flags)
        v = loss_only(state, batch, iv, flags)
        float(v)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            iv, _, _ = system.sample_step(state, batch, 0.0, flags)
            v = loss_only(state, batch, iv, flags)
        float(v)
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({
            "variant": label, "ms_per_step": round(dt * 1e3, 1),
            "rays_per_sec": round(args.n_rays / dt, 1)}), flush=True)
        return

    for _ in range(2):
        state, losses = system.train_step(state, batch, 0.0, flags)
    float(losses["total"])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, losses = system.train_step(state, batch, 0.0, flags)
    float(losses["total"])
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({
        "variant": label, "ms_per_step": round(dt * 1e3, 1),
        "rays_per_sec": round(args.n_rays / dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
