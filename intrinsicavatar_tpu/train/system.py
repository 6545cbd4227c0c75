"""The training system: loss assembly, jitted train step, occupancy cadence.

Equivalent of ``IntrinsicAvatarSystem`` (`systems/intrinsic_avatar.py:19-301`
+ `systems/base.py` in taconite/IntrinsicAvatar) without Lightning: a
functional :class:`TrainState`, a jit-compiled :func:`train_step` (one per
static flag combination — the phys/importance kick-ins recompile once each),
the occupancy-grid EMA update every ``n=20`` steps, and the per-frame grid
re-init at the milestone steps.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from intrinsicavatar_tpu.ops.math import (
    linear_to_srgb, luma, max_value, gaussian_histogram,
)
from intrinsicavatar_tpu.registry import register
from intrinsicavatar_tpu.render.renderer import IntrinsicAvatar, RenderFlags
from intrinsicavatar_tpu.render.occupancy import (
    OccGridState, make_occ_grid, update_occ_grid, level_of,
    compute_test_occ_grid,
)
from intrinsicavatar_tpu.train.schedules import C, C_static
from intrinsicavatar_tpu.train.optim import make_optimizer


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    occ: OccGridState
    step: jax.Array
    rng: jax.Array


def _masked_mean(x, mask):
    """Mean of x over rows selected by mask (matching ``x[mask].mean()``)."""
    if x.ndim > mask.ndim:
        mask = mask[..., None]
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m * jnp.ones_like(x)), 1.0)


def binary_cross_entropy(pred, target):
    """Numerically-stable BCE (`systems/criterions.py:229`)."""
    return -jnp.mean(target * jnp.log(pred) + (1.0 - target)
                     * jnp.log(1.0 - pred))


@register("intrinsic-avatar-system")
class IntrinsicAvatarSystem:
    """Owns the model, optimizer and loss assembly."""

    def __init__(self, config):
        self.config = config
        self.model = IntrinsicAvatar(config.model)
        self.loss_cfg = config.system.loss
        self.reinit_occ_steps = list(
            config.system.get("reinit_occupancy_grid_steps", [8000]))
        # optimizer / SMPL-shape re-init milestones
        # (`systems/base.py:120-135`; both default-off in the reference)
        self.reinit_optimizer_steps = [
            s for s in config.system.get("reinit_optimizer_steps", [])
            if s >= 0]
        self.reinit_shape_every = int(
            config.system.get("reinit_shape_every_n_steps", -1))
        self.occ_update_every = config.system.get("occ_update_every", 20)
        self.statics = None
        self.tx = None
        # overflow-feedback budget escalation (RenderFlags.budget_boost):
        # bumped by fit() when a logged ovf_* counter is nonzero; each
        # level adds +1/16 headroom to every fractional query budget at
        # the cost of one recompile
        # budget_boost_init seeds the level on resume (the boost is host
        # state, not part of the checkpoint tree: a restarted run would
        # otherwise re-learn it through the same expensive recompiles)
        self._budget_boost = int(config.system.get("budget_boost_init", 0))
        self._budget_boost_max = int(
            config.system.get("budget_boost_max", 6))
        # occupancy-adaptive primary shading budget (opt-in): track the
        # measured valid-sample fraction and publish a bucketed fraction
        # (16ths, hysteresis >= 2/16) through RenderFlags.budget_frac_n16
        self._adaptive_budget = bool(
            config.model.get("adaptive_query_compaction", False))
        self._valid_frac_ema = None
        self._budget_frac_n16 = 0
        # optional device mesh: when set (launch --mesh / multi-device
        # autodetect), train_step shards the ray batch over it with
        # replicated params (`parallel/sharding.py`) — the TPU-native
        # replacement for the reference's Lightning DDP (`launch.py:91-98`)
        self.mesh = None
        self._sharded_steps = {}

    # ------------------------------------------------------------ setup

    def setup(self, betas, key, n_frames: int = 1):
        self.statics = self.model.initialize(betas)
        params = self.model.init(key)
        self.tx = make_optimizer(
            params, self.config.system.optimizer,
            self.config.system.get("scheduler", {}),
            self.config.system.get("warmup_steps", 1000))
        opt_state = self.tx.init(params)
        occ = make_occ_grid(
            np.asarray(self.config.model.scene_aabb, np.float32)[None],
            resolution=self.config.model.get("occ_resolution", 64))
        return TrainState(params=params, opt_state=opt_state, occ=occ,
                          step=jnp.zeros((), jnp.int32),
                          rng=jax.random.fold_in(key, 1))

    # ------------------------------------------------------------ flags

    def flags_for_step(self, step: int, training=True) -> RenderFlags:
        mcfg = self.config.model
        return RenderFlags(
            training=training,
            enable_phys=step >= mcfg.get("phys_kick_in_step", 10000),
            importance_sample=step > mcfg.get(
                "importance_sample_kick_in_step", 1000),
            randomized=training and mcfg.get("randomized", True),
            with_curvature_loss=C_static(
                self.loss_cfg.lambda_curvature, step) > 0,
            jitter_materials=C_static(
                self.loss_cfg.lambda_albedo_smoothness, step) > 0,
            render_mode=mcfg.get("render_mode", "uniform_light"),
            # full query budgets while the occupancy grid is still mostly-on
            # (fractional compaction would drop the far samples of every
            # ray during the first few hundred steps)
            full_budget=training and step < mcfg.get(
                "compaction_warmup_steps", 512),
            budget_boost=self._budget_boost,
            budget_frac_n16=self._budget_frac_n16,
        )

    def _update_adaptive_budget(self, valid, total) -> None:
        """Feed one measured (valid, total) sample-count pair into the
        adaptive-budget controller.  The EMA of the valid fraction picks
        a bucket of ceil(1.25 * ema * 16)/16; the published bucket only
        moves on a >= 2/16 difference (hysteresis: each move recompiles).
        The overflow escalator still adds headroom on top, so an
        under-estimate degrades to one recompile, not a silent bias."""
        if not self._adaptive_budget or not total:
            return
        frac = float(valid) / float(total)
        self._valid_frac_ema = frac if self._valid_frac_ema is None else \
            0.8 * self._valid_frac_ema + 0.2 * frac
        cand = int(np.clip(np.ceil(self._valid_frac_ema * 1.25 * 16.0),
                           2, 16))
        cur = self._budget_frac_n16
        if cur == 0 or abs(cand - cur) >= 2 or cand > cur:
            if cand != cur:
                self._budget_frac_n16 = cand

    # ------------------------------------------------------------ losses

    def compute_losses(self, params, out, batch, step, flags: RenderFlags):
        """Mirror of `systems/intrinsic_avatar.py:160-301` (masked,
        rectangular)."""
        L = self.loss_cfg
        losses = {}
        loss = 0.0
        valid = out["rays_valid"][..., 0]
        pbr_only = self.config.system.get("pbr_loss_only", False) \
            and flags.enable_phys

        if not pbr_only:
            diff = out["comp_rgb_full"] - batch["rgb"]
            losses["rgb_mse"] = _masked_mean(diff**2, valid)
            losses["rgb_l1"] = _masked_mean(jnp.abs(diff), valid)
            loss += losses["rgb_mse"] * C(L.lambda_rgb_mse, step)
            loss += losses["rgb_l1"] * C(L.lambda_rgb_l1, step)

        if flags.enable_phys and self.config.model.get("learn_material", True):
            vphys = out["rays_valid_phys_full"][..., 0]
            target = batch.get("rgb_wo_mask", batch["rgb"]) \
                if self.model.add_emitter else batch["rgb"]
            dphys = out["comp_rgb_phys_full"] - target
            if self.model.add_emitter:
                losses["rgb_phys_mse"] = jnp.mean(dphys**2)
                losses["rgb_phys_l1"] = jnp.mean(jnp.abs(dphys))
            else:
                losses["rgb_phys_mse"] = _masked_mean(dphys**2, vphys)
                losses["rgb_phys_l1"] = _masked_mean(jnp.abs(dphys), vphys)
            loss += losses["rgb_phys_mse"] * C(L.lambda_rgb_phys_mse, step)
            loss += losses["rgb_phys_l1"] * C(L.lambda_rgb_phys_l1, step)

            demod = jnp.abs(luma(out["comp_demod_phys_full"])
                            - max_value(batch["rgb"]))
            losses["rgb_demodulated"] = _masked_mean(demod, vphys)
            loss += losses["rgb_demodulated"] * C(
                L.lambda_rgb_demodulated, step)

            if C_static(L.lambda_albedo, step) > 0 and "albedo" in batch:
                la = jnp.abs(out["comp_albedo_full"] - batch["albedo"])
                losses["albedo"] = _masked_mean(la, vphys)
                loss += losses["albedo"] * C(L.lambda_albedo, step)

        # Eikonal over all marching samples (deformer-invalid samples carry
        # the default unit gradient and contribute 0, as in the reference)
        smask = out["sample_mask"]
        grad_norm = jnp.linalg.norm(
            out["sdf_grad_samples"].reshape(*smask.shape, 3), axis=-1)
        losses["eikonal"] = _masked_mean((grad_norm - 1.0) ** 2, smask)
        loss += losses["eikonal"] * C(L.lambda_eikonal, step)

        opacity = jnp.clip(out["opacity"].reshape(-1), 1e-3, 1.0 - 1e-3)
        if "alpha" in batch:
            alpha = batch["alpha"].astype(opacity.dtype)
            losses["mask_mse"] = jnp.mean((opacity - alpha) ** 2)
            losses["mask_bce"] = binary_cross_entropy(opacity, alpha)
            loss += losses["mask_mse"] * C(L.lambda_mask_mse, step)
            loss += losses["mask_bce"] * C(L.lambda_mask_bce, step)

        losses["opaque"] = binary_cross_entropy(opacity, opacity)
        loss += losses["opaque"] * C(L.lambda_opaque, step)

        sdf = out["sdf_samples"].reshape(smask.shape)
        losses["sparsity"] = _masked_mean(
            jnp.exp(-L.get("sparsity_scale", 1.0) * jnp.abs(sdf)), smask)
        loss += losses["sparsity"] * C(L.lambda_sparsity, step)

        if flags.with_curvature_loss:
            # curvature proxy on the renderer's (subsampled) lane set —
            # an unbiased estimator of the reference's per-sample mean
            lap = jnp.abs(out["sdf_laplace_samples"])
            losses["curvature"] = _masked_mean(lap, out["laplace_mask"])
            loss += losses["curvature"] * C(L.lambda_curvature, step)

        dist_spec = L.get("lambda_distortion", 0.0)
        if isinstance(dist_spec, (int, float)):
            dist_on = float(dist_spec) != 0.0
        else:
            vals = list(dist_spec)
            vals = vals[0:2] if len(vals) == 3 else vals[1:3]
            dist_on = any(float(v) != 0.0 for v in vals)
        if dist_on:
            from intrinsicavatar_tpu.ops.volrend import distortion_loss
            mids = out["points"]
            half = out["intervals"] / 2.0
            losses["distortion"] = distortion_loss(
                out["weights"], mids - half, mids + half, smask)
            loss += losses["distortion"] * C(L.lambda_distortion, step)

        # model regularizations (`models/*/regularizations`)
        losses["lipshitz_bound"] = self.model.material.lipschitz_bound(
            params["material"])
        loss += losses["lipshitz_bound"] * C(L.lambda_lipshitz_bound, step)

        if flags.enable_phys:
            losses["normal_orientation"] = jnp.mean(
                out["normals_orientation_loss_map"])
            losses["albedo_smoothness"] = jnp.mean(
                out["albedo_smoothness_loss_map"])
            losses["roughness_smoothness"] = jnp.mean(
                out["roughness_smoothness_loss_map"])
            losses["metallic_smoothness"] = jnp.mean(
                out["metallic_smoothness_loss_map"])
            loss += losses["normal_orientation"] * C(
                L.lambda_normal_orientation, step)
            loss += losses["albedo_smoothness"] * C(
                L.lambda_albedo_smoothness, step)
            loss += losses["roughness_smoothness"] * C(
                L.lambda_roughness_smoothness, step)
            loss += losses["metallic_smoothness"] * C(
                L.lambda_metallic_smoothness, step)

            if C_static(L.lambda_albedo_entropy, step) > 0:
                vphys = out["rays_valid_phys_full"][..., 0]
                alb = jnp.log(out["comp_albedo_full"] + 1e-6)
                ent = 0.0
                for i in range(3):
                    ch = jnp.where(vphys, alb[..., i], 0.0)
                    mean = jnp.sum(ch) / jnp.maximum(jnp.sum(vphys), 1)
                    var = jnp.sum(jnp.where(vphys, (alb[..., i] - mean) ** 2,
                                            0.0)) / jnp.maximum(
                        jnp.sum(vphys), 1)
                    h = gaussian_histogram(ch, 15, 0.0, 1.0,
                                           jnp.maximum(var, 1e-4))
                    h = h / jnp.maximum(h.sum(), 1e-6) + 1e-6
                    ent += jnp.sum(-h * jnp.log(h))
                losses["albedo_entropy"] = ent
                loss += ent * C(L.lambda_albedo_entropy, step)

            if out["comp_metallic_full"].shape[-1] == 3:
                vphys = out["rays_valid_phys_full"][..., 0]
                from intrinsicavatar_tpu.ops.math import luminance
                ec = jax.nn.relu(
                    luminance(out["comp_albedo_full"])
                    + luminance(out["comp_metallic_full"]) - 1.0)
                losses["energy_conservation"] = _masked_mean(ec, vphys)
                loss += losses["energy_conservation"] * C(
                    L.lambda_energy_conservation, step)

        # static-budget overflow counters (no silent caps): pass through so
        # they land in the logged scalars / metrics.jsonl
        for k, v in out.get("counters", {}).items():
            losses[k] = v
        # schedule state (Laplace beta) logged alongside losses so milestone
        # behavior (beta anneal, phys kick-in) is auditable from the JSONL
        if "beta" in out:
            losses["beta"] = jnp.asarray(out["beta"])

        losses["total"] = loss
        return loss, losses

    # ------------------------------------------------------------ steps

    def train_step_impl(self, state: TrainState, batch, t_idx,
                        flags: RenderFlags, intervals=None, seed_grid=None):
        """One optimization step (pure, unjitted body).  ``batch`` carries
        rays + SMPL params + targets; ``flags`` is static.  Wrapped by the
        single-chip ``train_step`` jit and by
        ``parallel.sharding.make_sharded_train_step`` for device meshes.

        ``intervals`` (from :meth:`sample_step`) skips the gradient-free
        marching/importance stages inside the differentiated region, halving
        the compile unit (the TPU fusion pass struggles on the monolithic
        graph)."""
        rng, k_bg, k_fwd = jax.random.split(state.rng, 3)
        step = state.step

        bg_mode = self.config.model.get("background_color", "random")
        if bg_mode == "white":
            bg = jnp.ones(3)
        elif bg_mode == "black":
            bg = jnp.zeros(3)
        else:
            bg = jax.random.uniform(k_bg, (3,))

        # composite gt rgb over the background (`systems/intrinsic_avatar.py:138-144`)
        fg = batch["alpha"][..., None]
        rgb = batch["rgb"] * fg + linear_to_srgb(bg)[None, :] * (1.0 - fg)
        batch = {**batch, "rgb_wo_mask": batch["rgb"], "rgb": rgb}

        def loss_fn(params):
            frame, cond = self.model.prepare(params, self.statics, batch,
                                             step)
            out = self.model.forward(
                params, self.statics, frame, cond, state.occ, batch["rays"],
                k_fwd, step, flags, t_idx=t_idx, background_color=bg,
                intervals=intervals, seed_grid=seed_grid)
            loss, losses = self.compute_losses(params, out, batch, step,
                                               flags)
            return loss, (losses, out)

        (loss, (losses, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               occ=state.occ, step=step + 1, rng=rng)
        return new_state, losses

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def sample_step(self, state: TrainState, batch, t_idx,
                    flags: RenderFlags):
        """Gradient-free marching + importance rounds as its own jit.

        Runs under its own ``diag.collect`` scope so the budget-overflow
        counters recorded by the coarse/importance field queries
        (``ovf_query``) are not silently dropped by the two-jit split;
        :meth:`train_step` folds them into the loss scalars.

        With ``train_seed_grid`` on (phys regime), the per-STEP
        correspondence bake happens here — once per optimizer step,
        shared by every grad-accum microbatch — and is returned as the
        third output for :meth:`train_step` to thread into the shading
        stage's secondary march."""
        from intrinsicavatar_tpu.utils import diag
        _, _, k_fwd = jax.random.split(state.rng, 3)
        k_strat = jax.random.split(k_fwd, 4)[0]
        frame, cond = self.model.prepare(state.params, self.statics, batch,
                                         state.step)
        seed_grid = None
        if self.model.use_train_seed_grid(flags):
            seed_grid = self.model.bake_train_seed_grid(
                state.params, self.statics, frame, cond, state.step)
        with diag.collect() as counters:
            iv = self.model.sample_intervals(
                state.params, self.statics, frame, cond, state.occ,
                batch["rays"], k_strat, state.step, flags, t_idx,
                seed_grid=seed_grid)
        return iv, {k: jnp.asarray(v, jnp.int32)
                    for k, v in counters.items()}, seed_grid

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def train_step_jit(self, state: TrainState, batch, t_idx,
                       flags: RenderFlags, intervals=None, seed_grid=None):
        return self.train_step_impl(state, batch, t_idx, flags, intervals,
                                    seed_grid)

    def train_step(self, state: TrainState, batch, t_idx,
                   flags: RenderFlags):
        """Two-jit step: sampling (no grad) then shading+optimize.

        With ``trainer.grad_accum = n > 1`` the shading/backward stage runs
        as n microbatches of R/n rays whose gradients are averaged before
        one optimizer update — activation memory scales with the microbatch
        while the optimization trajectory matches the monolithic step (all
        losses are per-ray means over equal-size chunks; the background
        color and step schedules are shared across chunks).

        With ``self.mesh`` set, the whole step runs ray-sharded over the
        device mesh instead (grad accumulation is unnecessary there — the
        per-chip ray count already shrinks by the mesh size)."""
        if self.mesh is not None:
            return self.sharded_train_step(state, batch, t_idx, flags)
        intervals, s_counters, seed_grid = self.sample_step(state, batch,
                                                            t_idx, flags)
        n_micro = int(self.config.trainer.get("grad_accum", 1))
        if n_micro <= 1 or batch["rays"].shape[0] % n_micro != 0:
            state, losses = self.train_step_jit(state, batch, t_idx, flags,
                                                intervals, seed_grid)
        else:
            state, losses = self._train_step_accum(state, batch, t_idx,
                                                   flags, intervals, n_micro,
                                                   seed_grid)
        # fold sampling-stage overflow counters into the loss scalars
        # (summing with any same-named counter from the shading stage)
        losses = dict(losses)
        for k, v in s_counters.items():
            losses[k] = losses[k] + v if k in losses else v
        return state, losses

    # ------------------------------------------------------- device mesh

    def use_mesh(self, mesh) -> None:
        """Enable ray-sharded training over ``mesh`` (or disable with
        ``None``).  Replaces the reference's DDP wiring
        (`launch.py:91-98`)."""
        self.mesh = mesh
        self._sharded_steps = {}

    def shard_batch(self, batch):
        from intrinsicavatar_tpu.parallel.sharding import batch_shardings
        return jax.device_put(batch, batch_shardings(self.mesh, batch))

    def replicate_state(self, state: TrainState) -> TrainState:
        from intrinsicavatar_tpu.parallel.sharding import replicated
        return jax.device_put(state, replicated(self.mesh, state))

    def sharded_train_step(self, state: TrainState, batch, t_idx,
                           flags: RenderFlags):
        from intrinsicavatar_tpu.parallel.sharding import (
            make_sharded_train_step)
        fn = self._sharded_steps.get(flags)
        if fn is None:
            fn = make_sharded_train_step(self, self.mesh, flags, state,
                                         batch)
            self._sharded_steps[flags] = fn
        return fn(state, batch, t_idx)

    # ---------------------------------------------- gradient accumulation

    _PER_RAY_KEYS = ("rays", "rgb", "alpha", "rgb_wo_mask", "valid_mask")

    def _grad_microbatch(self, params, occ, step, flags, t_idx, key, bg,
                         n_micro, i_micro, batch, intervals, seed_grid=None):
        """Gradients of the shading loss on rays [i*m, (i+1)*m).

        ``i_micro`` may be a python int (unrolled accum loop — the slice
        becomes static) or traced; the chunk size m = R // n_micro is
        static either way."""
        R = batch["rays"].shape[0]
        m = R // n_micro

        def chunk(x):
            return jax.lax.dynamic_slice_in_dim(x, i_micro * m, m, axis=0)

        mb = {k: (chunk(v) if k in self._PER_RAY_KEYS else v)
              for k, v in batch.items()}
        mb_iv = jax.tree.map(chunk, intervals)

        fg = mb["alpha"][..., None]
        rgb = mb["rgb"] * fg + linear_to_srgb(bg)[None, :] * (1.0 - fg)
        mb = {**mb, "rgb_wo_mask": mb["rgb"], "rgb": rgb}

        def loss_fn(params):
            frame, cond = self.model.prepare(params, self.statics, mb, step)
            out = self.model.forward(
                params, self.statics, frame, cond, occ, mb["rays"], key,
                step, flags, t_idx=t_idx, background_color=bg,
                intervals=mb_iv, seed_grid=seed_grid)
            loss, losses = self.compute_losses(params, out, mb, step, flags)
            return loss, losses

        (_, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        return grads, losses

    @functools.partial(jax.jit, static_argnums=(0, 4, 6))
    def _train_step_accum(self, state: TrainState, batch, t_idx,
                          flags: RenderFlags, intervals, n_micro: int,
                          seed_grid=None):
        """ONE-dispatch grad-accum step: rng keys, the n_micro microbatch
        gradient passes as a ``lax.scan`` (body compiled once, activation
        buffers reused — memory stays at one microbatch, and the loop
        carry serializes the iterations exactly like the old per-microbatch
        dispatches), gradient average and optimizer apply, all inside a
        single jit.

        The previous implementation issued ~8 jit dispatches per optimizer
        step (keys, 2x microbatch, 2x2 tree adds, apply, scale); on a
        1-core host driving the TPU over a tunnel the measured dispatch
        overhead was ~1.45 s/step against a ~1.5 s device step — the
        wall-true telemetry discrepancy flagged in round 3/4.

        The microbatch loop is UNROLLED (python loop under jit), not a
        ``lax.scan``: inside a while-loop body XLA:TPU normalizes temps to
        default tiled layouts, which pads the encode's ``[N, 2]``
        per-level features and the ``[T, 2]`` table casts 64x (2-wide
        minor dim -> 128 lanes) — measured +15 GB of HLO temp padding at
        a 2048-ray microbatch vs the same body in the entry computation
        (bench OOM, round 5).  Straight-line code keeps XLA's layout
        freedom and sequential buffer reuse, so peak memory stays at ~one
        microbatch like the old per-dispatch form."""
        rng, k_bg, k_fwd = jax.random.split(state.rng, 3)
        bg_mode = self.config.model.get("background_color", "random")
        if bg_mode == "white":
            bg = jnp.ones(3)
        elif bg_mode == "black":
            bg = jnp.zeros(3)
        else:
            bg = jax.random.uniform(k_bg, (3,))
        keys = jax.random.split(k_fwd, n_micro)

        grads = None
        losses_per = []
        for i_micro in range(n_micro):
            g, losses = self._grad_microbatch(
                state.params, state.occ, state.step, flags, t_idx,
                keys[i_micro], bg, n_micro, i_micro, batch, intervals,
                seed_grid)
            grads = g if grads is None else jax.tree.map(jnp.add, grads, g)
            losses_per.append(losses)
        losses = jax.tree.map(lambda *xs: jnp.stack(xs), *losses_per)
        grads = jax.tree.map(lambda g: g / n_micro, grads)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        losses = jax.tree.map(lambda x: jnp.mean(x, axis=0), losses)
        return TrainState(params=params, opt_state=opt_state, occ=state.occ,
                          step=state.step + 1, rng=rng), losses

    @functools.partial(jax.jit, static_argnums=(0,))
    def occ_update_step(self, state: TrainState, batch, t_idx):
        """EMA occupancy update on the current frame's level
        (`models/intrinsic_avatar.py:256-264`, every n=20 steps)."""
        rng, k_occ = jax.random.split(state.rng)
        frame, cond = self.model.prepare(state.params, self.statics, batch,
                                         state.step)
        sched = self.model._schedules(state.step)
        fn = self.model.occ_eval_fn(state.params, self.statics, frame, cond,
                                    sched, state.step)
        occ = update_occ_grid(
            state.occ, level_of(state.occ, t_idx), fn, k_occ,
            occ_thre=self.config.model.get("grid_prune_occ_thre", 0.001),
            ema_decay=self.config.model.get("grid_prune_ema_decay", 0.8))
        return state._replace(occ=occ, rng=rng)

    def reinit_occupancy_grid(self, state: TrainState, batches):
        """Re-create the grid with one level per frame in deformed space
        (`systems/intrinsic_avatar.py:46-79`, milestone step 8000).

        The per-frame build (SMPL prepare + 64^3 x 3 jittered occupancy
        eval + morphology) runs as ONE jitted function reused across
        frames — eager execution of this path takes minutes per frame
        over a TPU tunnel."""
        res = self.config.model.get("occ_resolution", 64)
        occ_thre = self.config.model.get("grid_prune_occ_thre", 0.001)

        @jax.jit
        def one_frame(params, step, k, batch):
            frame, cond = self.model.prepare(params, self.statics, batch,
                                             step)
            sched = self.model._schedules(step)
            aabb2 = self.model.deformer.rigid.get_bbox_deformed(frame)
            aabb = jnp.concatenate([aabb2[0], aabb2[1]])
            fn = self.model.occ_eval_fn(params, self.statics, frame, cond,
                                        sched, step)
            binary = compute_test_occ_grid(fn, aabb, k, resolution=res,
                                           occ_thre=occ_thre)
            return binary, aabb

        binaries, aabbs = [], []
        rng = state.rng
        for batch in batches:
            rng, k = jax.random.split(rng)
            binary, aabb = one_frame(state.params, state.step, k, batch)
            binaries.append(binary)
            aabbs.append(aabb)
        occ = OccGridState(
            occs=jnp.zeros((len(batches), res**3)),
            binaries=jnp.stack(binaries),
            aabbs=jnp.stack(aabbs),
        )
        return state._replace(occ=occ, rng=rng)

    # ------------------------------------------------------------ loop

    def reinit_optimizer(self, state: TrainState) -> TrainState:
        """Rebuild optimizer + schedule from scratch
        (`systems/base.py:131-135`)."""
        self.tx = make_optimizer(
            state.params, self.config.system.optimizer,
            self.config.system.get("scheduler", {}),
            self.config.system.get("warmup_steps", 1000))
        return state._replace(opt_state=self.tx.init(state.params))

    def reinit_shape(self, state: TrainState, betas) -> None:
        """Rebuild the deformer's canonical statics from the currently
        optimized SMPL shape (`systems/intrinsic_avatar.py:81-82` +
        `snarf_deformer.py:46-79` lazy re-init)."""
        betas = jnp.asarray(betas).reshape(-1)[:10]
        pc = state.params.get("pose_correction", {})
        if "betas_correction" in pc:
            betas = betas + pc["betas_correction"].reshape(-1)[:10]
        self.statics = self.model.initialize(np.asarray(betas))

    def fit(self, data_iter, state: TrainState, max_steps: int,
            log_every: int = 100, callback=None, all_frames_fn=None,
            prefetch: bool = True, logger=None, val_fn=None,
            val_every: int = 0, betas=None, ckpt_fn=None,
            ckpt_every: int = 0, deadline_ts: float = 0.0):
        """The training loop (replaces Lightning's trainer.fit).

        ``all_frames_fn()`` returns one pose batch per training frame; it is
        invoked at the occupancy-grid re-init milestones.  ``prefetch``
        overlaps host-side batch preparation with device steps; ``logger``
        is an optional ``utils.logging.MetricLogger``.  ``val_fn(state,
        step) -> dict`` runs in-training validation every ``val_every``
        steps (the reference validates every 2000 steps,
        `configs/config.yaml` check_val_every_n_epoch); its scalars are
        logged with a ``val/`` prefix.  Only log-cadence loss scalars are
        retained in the returned history (device buffers are not
        accumulated per step).
        """
        import time

        from intrinsicavatar_tpu.utils.logging import Throughput

        if prefetch:
            try:
                from intrinsicavatar_tpu.native import Prefetcher
                data_iter = Prefetcher(data_iter, depth=4)
            except Exception:
                pass
        tput = Throughput()
        history = []
        ovf_acc: list = []
        if self.mesh is not None:
            state = self.replicate_state(state)
        # wall-true throughput window: `tput` ticks after an *async*
        # dispatch, which flatters the rate when host work (data decode,
        # occ re-init, val, ckpt) runs between dispatches.  Track the
        # window on the host clock, anchored at the log-cadence device
        # sync, and attribute the non-step time by section.
        wall_t0 = time.perf_counter()
        wall_step0 = int(state.step)
        wall_rays = 0
        sect_t = {"data": 0.0, "occ": 0.0, "val": 0.0, "ckpt": 0.0,
                  "dispatch": 0.0}
        from concurrent.futures import ThreadPoolExecutor
        ckpt_pool = ThreadPoolExecutor(max_workers=1,
                                       thread_name_prefix="ckpt")
        ckpt_future = None
        for step in range(int(state.step), max_steps):
            _t = time.perf_counter()
            batch, t_idx = next(data_iter)
            sect_t["data"] += time.perf_counter() - _t
            if self.mesh is not None:
                batch = self.shard_batch(batch)
            if step in self.reinit_occ_steps and all_frames_fn is not None:
                _t = time.perf_counter()
                state = self.reinit_occupancy_grid(state, all_frames_fn())
                sect_t["occ"] += time.perf_counter() - _t
            if step in self.reinit_optimizer_steps and step > 0:
                state = self.reinit_optimizer(state)
            if (self.reinit_shape_every > 0 and step > 0
                    and step % self.reinit_shape_every == 0):
                self.reinit_shape(state, jnp.zeros(10) if betas is None
                                  else betas)
            if step % self.occ_update_every == 0:
                _t = time.perf_counter()
                state = self.occ_update_step(state, batch, t_idx)
                sect_t["occ"] += time.perf_counter() - _t
            flags = self.flags_for_step(step)
            _t = time.perf_counter()
            state, losses = self.train_step(state, batch, t_idx, flags)
            sect_t["dispatch"] += time.perf_counter() - _t
            tput.tick(int(batch["rays"].shape[0]))
            wall_rays += int(batch["rays"].shape[0])
            # buffer the overflow + budget-telemetry scalars EVERY step
            # (device references only — appending is free; the previous
            # per-step lazy `jnp.add`s were ~8 eager dispatches each a
            # tunnel round trip) and batch-read + sum at log cadence so a
            # burst between log points cannot hide from the escalator and
            # the adaptive controller sees the whole window
            ovf_acc.append({k: v for k, v in losses.items()
                            if k.startswith("ovf_")
                            or k.startswith("shading_")})
            if step % log_every == 0:
                # device_get blocks on this step's losses: the window
                # below is therefore a true device-sync-to-device-sync
                # wall interval including all host work in between
                scalars = {k: float(v) for k, v in
                           jax.device_get(losses).items() if np.ndim(v) == 0}
                ovf_window: dict = {}
                for d in jax.device_get(ovf_acc):
                    for k, v in d.items():
                        ovf_window[k] = ovf_window.get(k, 0.0) + float(v)
                ovf_acc = []
                scalars["rays_per_sec"] = tput.rays_per_sec
                now = time.perf_counter()
                wall_dt = now - wall_t0
                if step > wall_step0 and wall_dt > 0:
                    scalars["steps_per_sec_wall"] = (step - wall_step0) \
                        / wall_dt
                    scalars["rays_per_sec_wall"] = wall_rays / wall_dt
                    for k, v in sect_t.items():
                        if v > 0:
                            scalars[f"wall_{k}_s"] = v
                scalars["wall_time"] = time.time()
                wall_t0, wall_step0, wall_rays = now, step, 0
                sect_t = {k: 0.0 for k in sect_t}
                # overflow-feedback budget escalation: a nonzero ovf_*
                # counter means a static query budget silently dropped
                # lanes this step -> widen every budget by +1/16 (one
                # recompile) rather than keep biasing renders/losses
                # only the counters the boost actually widens (shading,
                # field-query and candidate-query fractions; the broyden
                # phase-2 / top-K caps have their own counters + config
                # escape hatches)
                ovf = sum(ovf_window.get(k, 0.0)
                          for k in ("ovf_shading", "ovf_query",
                                    "ovf_candidate_query"))
                if ovf > 0 and self._budget_boost < self._budget_boost_max:
                    self._budget_boost += 1
                    scalars["budget_boost"] = float(self._budget_boost)
                    print(f"[{step}] budget overflow ({int(ovf)} lanes) -> "
                          f"boost {self._budget_boost} (+"
                          f"{self._budget_boost * 6.25:.2f}% headroom, "
                          "recompile)", flush=True)
                # occupancy-adaptive budget: feed the window-accumulated
                # valid fraction (microbatch/step sums normalize in the
                # ratio)
                prev_n16 = self._budget_frac_n16
                self._update_adaptive_budget(
                    ovf_window.get("shading_valid_samples", 0.0),
                    ovf_window.get("shading_total_samples", 0.0))
                if self._budget_frac_n16 != prev_n16:
                    scalars["budget_frac_n16"] = float(self._budget_frac_n16)
                    print(f"[{step}] adaptive shading budget -> "
                          f"{self._budget_frac_n16}/16 (recompile)",
                          flush=True)
                # host-side twin of train/schedules.lr_schedule (eager jnp
                # over the TPU tunnel would round-trip per log step)
                from intrinsicavatar_tpu.train.schedules import (
                    lr_schedule_host)
                scalars["lr"] = lr_schedule_host(step, self.config.system)
                if callback is not None:
                    callback(step, scalars)
                if logger is not None:
                    logger.log(step, scalars)
                history.append((step, scalars))
            if val_fn is not None and val_every > 0 and step > 0 \
                    and step % val_every == 0:
                _t = time.perf_counter()
                metrics = val_fn(state, step)
                sect_t["val"] += time.perf_counter() - _t
                if logger is not None and metrics:
                    logger.log(step, {f"val/{k}": v
                                      for k, v in metrics.items()
                                      if np.ndim(v) == 0})
            # checkpoint cadence independent of validation (a ckpt gated
            # inside val_fn only fires on common multiples of both — and
            # never if the val dataset fails to build)
            if ckpt_fn is not None and ckpt_every > 0 and step > 0 \
                    and step % ckpt_every == 0:
                _t = time.perf_counter()
                # async: the save (device->host transfer of the full state
                # over the tunnel + orbax write, ~40 s for a 300 MB state)
                # overlaps the next ~15 device steps.  One save in flight
                # at most — the join below bounds device memory to one
                # extra state copy; JAX transfers are thread-safe against
                # the dispatching main thread.
                if ckpt_future is not None:
                    ckpt_future.result()
                ckpt_future = ckpt_pool.submit(ckpt_fn, state, step)
                sect_t["ckpt"] += time.perf_counter() - _t
            # wall-clock budget: exit the loop cleanly (the caller saves
            # ckpt/final from the returned state) so a bounded run always
            # leaves a resumable lineage + a free device for eval stages
            if deadline_ts and time.time() > deadline_ts:
                print(f"[{step}] wall deadline reached "
                      f"({time.time() - deadline_ts:.0f}s past) — "
                      "stopping training early", flush=True)
                break
        if ckpt_future is not None:
            ckpt_future.result()
        ckpt_pool.shutdown(wait=True)
        return state, history
