"""CLI launcher: train / validate / test / predict.

Equivalent of `launch.py` (taconite/IntrinsicAvatar) without Lightning/Hydra:

    python -m intrinsicavatar_tpu.launch --config configs/peoplesnapshot.yaml \
        --mode train dataset.subject=male-3-casual trainer.max_steps=25000

Dotlist overrides apply after the YAML; ``--mode test`` restores the latest
checkpoint with occupancy grids and pose corrections dropped
(`launch.py:111-125` in the reference).  Experiment outputs land in
``exp/<name>/<tag>/{ckpt,save,config}``.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def build_dataset(cfg, split, mode, rng=None):
    from intrinsicavatar_tpu import data as data_mod

    name = cfg.dataset.get("name", "synthetic")
    return data_mod.make(name, cfg.dataset, split=split, mode=mode, rng=rng)


def _snapshot_code(run_dir):
    """Copy the tracked source tree into <run_dir>/code for reproducibility
    (role of CodeSnapshotCallback, `utils/callbacks.py:52-77` in the
    reference). Silently skipped outside a git checkout."""
    import shutil
    import subprocess

    try:
        root = subprocess.run(["git", "rev-parse", "--show-toplevel"],
                              capture_output=True, text=True,
                              check=True).stdout.strip()
        files = subprocess.run(["git", "ls-files"], cwd=root,
                               capture_output=True, text=True,
                               check=True).stdout.splitlines()
    except (subprocess.CalledProcessError, FileNotFoundError):
        return
    dst_root = os.path.join(run_dir, "code")
    for rel in files:
        src = os.path.join(root, rel)
        if not os.path.isfile(src):
            continue
        dst = os.path.join(dst_root, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copy2(src, dst)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None)
    parser.add_argument("--mode", default="train",
                        choices=["train", "validate", "test", "predict"])
    parser.add_argument("--resume", default=None)
    parser.add_argument("--exp-dir", default="exp")
    parser.add_argument("--platform", default=None,
                        help="JAX platform override (e.g. cpu); the sandbox "
                             "pins JAX_PLATFORMS at boot, so the env var "
                             "alone does not work")
    parser.add_argument("--mesh", type=int, default=None,
                        help="train ray-sharded over this many devices "
                             "(default: all devices when more than one; "
                             "0 disables). Replaces the reference's DDP "
                             "wiring (launch.py:91-98)")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # persistent compilation cache: milestone recompiles (occ re-init,
    # phys kick-in) and restarted runs reuse prior executables
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    from intrinsicavatar_tpu.utils.config import (
        load_yaml, merge, resolve, apply_dotlist,
    )
    from intrinsicavatar_tpu.utils.default_config import default_config
    from intrinsicavatar_tpu.train.system import IntrinsicAvatarSystem
    from intrinsicavatar_tpu.utils import checkpoint as ckpt

    cfg = default_config()
    if args.config:
        cfg = merge(cfg, load_yaml(args.config))
    if args.overrides:
        cfg = apply_dotlist(cfg, args.overrides)
    cfg = resolve(cfg)

    seed = cfg.get("seed", 42)
    key = jax.random.PRNGKey(seed)
    np.random.seed(seed)

    name = cfg.get("name", "intrinsic-avatar")
    run_dir = os.path.join(args.exp_dir, name, time.strftime("%Y%m%d-%H%M%S"))
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2, default=str)
    _snapshot_code(run_dir)

    system = IntrinsicAvatarSystem(cfg)
    dataset = build_dataset(cfg, "train", "train",
                            rng=np.random.default_rng(seed))
    state = system.setup(dataset.betas, key, n_frames=len(dataset))

    if args.mode == "train":
        n_dev = len(jax.devices())
        n_mesh = args.mesh if args.mesh is not None else \
            (n_dev if n_dev > 1 else 0)
        if n_mesh and n_mesh > 1:
            from intrinsicavatar_tpu.parallel.sharding import make_mesh
            if n_mesh > n_dev:
                print(f"--mesh {n_mesh} > {n_dev} available devices; "
                      f"using {n_dev}", flush=True)
                n_mesh = n_dev
            system.use_mesh(make_mesh(jax.devices()[:n_mesh]))
            print(f"training ray-sharded over {n_mesh} devices", flush=True)

    if args.resume:
        restored = ckpt.restore_checkpoint(args.resume, state._asdict())
        if args.mode == "test":
            restored = ckpt.filter_for_test(restored)
            cur = state._asdict()
            cur["params"].update(restored.get("params", {}))
            for k in ("step",):
                cur[k] = restored.get(k, cur[k])
            state = type(state)(**cur)
        else:
            state = type(state)(**restored)

    if args.mode == "train":
        max_steps = cfg.trainer.get("max_steps", 25000)
        log_every = cfg.trainer.get("log_every_n_steps", 100)
        val_every = cfg.trainer.get("check_val_every_n_steps", 2000)
        ckpt_every = cfg.trainer.get("ckpt_every_n_steps", 0)
        from intrinsicavatar_tpu.utils.logging import MetricLogger
        logger = MetricLogger(run_dir, use_wandb=cfg.get("use_wandb", False),
                              config=cfg)

        def log(step, losses):
            msg = " ".join(f"{k}={float(v):.4f}" for k, v in
                           sorted(losses.items()) if np.ndim(v) == 0)
            print(f"[{step}] {msg}", flush=True)

        def all_frames():
            import jax.numpy as jnp
            return [
                {k: jnp.asarray(v) for k, v in dataset.pose_batch(i).items()}
                for i in range(len(dataset))
            ]

        # in-training validation every N steps (the reference validates
        # every 2000 steps with metrics + image dumps,
        # `systems/intrinsic_avatar.py:317-545`)
        val_fn = None
        try:
            val_ds = build_dataset(cfg, "val", "val")
        except Exception:
            val_ds = None
        if val_ds is not None and val_every > 0:
            from intrinsicavatar_tpu.train import evaluate as EV
            import jax.numpy as jnp
            val_dir = os.path.join(run_dir, "val")
            os.makedirs(val_dir, exist_ok=True)

            def val_fn(state, step):
                flags = system.flags_for_step(step, training=False)
                agg = {}
                n = min(len(val_ds), 2)
                for i in range(n):
                    b_np = val_ds[i]
                    b = {k: jnp.asarray(v) for k, v in b_np.items()
                         if k != "t_idx"}
                    out = EV.render_frame(
                        system, state.params, b, step,
                        jax.random.PRNGKey(step + i), flags,
                        ray_chunk=cfg.model.get("ray_chunk", 4096))
                    m = EV.frame_metrics(out, b_np,
                                         getattr(val_ds, "img_wh", None))
                    # surface eval-render budget overflows ("no silent
                    # caps" applies to validation renders too)
                    for k, v in out.get("counters", {}).items():
                        if k.startswith("ovf_") and v:
                            m[k] = m.get(k, 0) + int(v)
                    for k, v in m.items():
                        agg.setdefault(k, []).append(v)
                    if getattr(val_ds, "img_wh", None):
                        EV.dump_frame_images(val_dir, f"it{step}_f{i}", out,
                                             b_np, val_ds.img_wh)
                        W_, H_ = val_ds.img_wh
                        logger.log_image(
                            step, f"val/rgb_f{i}",
                            out["comp_rgb_full"].reshape(H_, W_, 3))
                mean = {k: float(np.mean(v)) for k, v in agg.items()
                        if v and v[0] is not None}
                print(f"[val @ {step}] " + " ".join(
                    f"{k}={v:.3f}" for k, v in sorted(mean.items())),
                    flush=True)
                return mean

        def ckpt_fn(state, step):
            ckpt.save_checkpoint(
                os.path.join(run_dir, "ckpt", f"step{step}"), state)

        state, _ = system.fit(dataset.train_iter(), state, max_steps,
                              log_every=log_every, callback=log,
                              all_frames_fn=all_frames, logger=logger,
                              val_fn=val_fn, val_every=val_every,
                              betas=dataset.betas, ckpt_fn=ckpt_fn,
                              ckpt_every=ckpt_every,
                              deadline_ts=float(
                                  cfg.trainer.get("deadline_ts", 0.0)))
        ckpt.save_checkpoint(os.path.join(run_dir, "ckpt", "final"), state)
        print("saved checkpoint to", os.path.join(run_dir, "ckpt", "final"))

    elif args.mode in ("validate", "test", "predict"):
        from intrinsicavatar_tpu.train.evaluate import (
            render_frame, frame_metrics, dump_frame_images,
            export_canonical_mesh, dump_envmap, fit_albedo_ratio,
        )
        import jax.numpy as jnp

        split = "val" if args.mode == "validate" else "test"
        ds_mode = "predict" if args.mode == "predict" else \
            ("val" if split == "val" else split)
        eval_ds = build_dataset(cfg, split, ds_mode)
        step = int(state.step) if int(state.step) > 0 else 25000
        flags = system.flags_for_step(step, training=False)
        all_metrics = []
        for i in range(len(eval_ds)):
            batch_np = eval_ds[i]
            batch = {k: jnp.asarray(v) for k, v in batch_np.items()
                     if k != "t_idx"}
            # relighting protocol: albedo-only pre-pass -> one alignment
            # ratio per frame, used by the full render
            # (`systems/intrinsic_avatar.py:598-611`); the per-frame
            # deformed-space occupancy grid is built once and shared
            ratio = None
            occ = frm = cnd = sgrid = None
            if (args.mode == "test" and flags.enable_phys
                    and "albedo" in batch_np):
                from intrinsicavatar_tpu.train.evaluate import (
                    build_seed_grid, build_test_occ_grid)
                occ, frm, cnd = build_test_occ_grid(
                    system, state.params, batch, step,
                    jax.random.PRNGKey(2000 + i))
                sgrid = build_seed_grid(system, state.params, frm, cnd,
                                        step)
                ratio = fit_albedo_ratio(
                    system, state.params, batch, step,
                    jax.random.PRNGKey(1000 + i), flags,
                    ray_chunk=cfg.model.get("ray_chunk", 4096),
                    occ=occ, frame=frm, cond=cnd, seed_grid=sgrid)
            out = render_frame(system, state.params, batch, step,
                               jax.random.PRNGKey(i), flags,
                               ray_chunk=cfg.model.get("ray_chunk", 4096),
                               occ=occ, frame=frm, cond=cnd,
                               albedo_align_ratio=ratio, seed_grid=sgrid)
            ovf = {k: int(v) for k, v in out.get("counters", {}).items()
                   if k.startswith("ovf_") and v}
            if ovf:
                print(f"frame {i}: budget overflow {ovf} — raise the "
                      "query_compaction fractions for exact renders",
                      flush=True)
            if "rgb" in batch_np:
                m = frame_metrics(out, batch_np, getattr(eval_ds, "img_wh",
                                                         None),
                                  albedo_prealigned=ratio is not None)
                all_metrics.append(m)
                print(f"frame {i}: " + " ".join(
                    f"{k}={v:.3f}" for k, v in m.items()
                    if np.ndim(v) == 0))
            if getattr(eval_ds, "img_wh", None):
                dump_frame_images(os.path.join(run_dir, "save"),
                                  f"{split}_{i:04d}", out, batch_np,
                                  eval_ds.img_wh)
        if all_metrics:
            agg = {k: float(np.mean([m[k] for m in all_metrics]))
                   for k in all_metrics[0] if np.ndim(all_metrics[0][k]) == 0}
            print("mean:", json.dumps(agg))
            with open(os.path.join(run_dir, "metrics.json"), "w") as f:
                json.dump(agg, f, indent=2)
        if args.mode == "test":
            export_canonical_mesh(system, state.params, step,
                                  os.path.join(run_dir, "save", "mesh.obj"))
            dump_envmap(system, state.params,
                        os.path.join(run_dir, "save", "envmap.exr"))


if __name__ == "__main__":
    main()
