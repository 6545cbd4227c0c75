"""The composed volumetric renderer for articulated neural SDF avatars.

TPU-native equivalent of ``IntrinsicAvatarModel``
(`models/intrinsic_avatar.py:166-1701` in taconite/IntrinsicAvatar) plus the
compositors of `models/volrend.py`.  The pipeline per batch of rays:

  1. rays world -> SMPL (pelvis-aligned) space (detached w2s),
  2. occupancy-grid marching into rectangular edge-list intervals,
  3. two merge-importance-resampling rounds (+16 samples each) driven by
     coarse SDF queries under stop_gradient,
  4. shading pass at interval midpoints through the deformer ->
     SDF/radiance/material fields,
  5. masked transmittance compositing into rgb/normal/material/depth maps,
  6. (``enable_phys``) Monte-Carlo volumetric path tracing of scattering
     points with secondary rays — see ``render/pbr.py``.

Everything is functional: parameters, deformer statics, per-frame state and
occupancy-grid state are explicit inputs, so the whole step jits and shards.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from intrinsicavatar_tpu.registry import make, register
from intrinsicavatar_tpu.ops import volrend as V
from intrinsicavatar_tpu.ops import resample as RS
from intrinsicavatar_tpu.ops.grid_traversal import (
    RayIntervals, occupancy_sampling, intervals_to_samples,
)
from intrinsicavatar_tpu.ops.math import (safe_normalize, linear_to_srgb, take_channel, split_channels)
from intrinsicavatar_tpu.render.occupancy import OccGridState, level_of


class RenderFlags(NamedTuple):
    """Static (trace-time) switches; changing one triggers a recompile."""

    training: bool = True
    enable_phys: bool = False
    importance_sample: bool = False
    randomized: bool = True
    with_curvature_loss: bool = True
    jitter_materials: bool = True
    render_mode: str = "uniform_light"
    # cheap eval pre-pass: compute material maps but skip the secondary-ray
    # PBR stage (`models/intrinsic_avatar.py:222,1290` albedo_only) — used
    # to fit the per-frame albedo alignment ratio before the full render
    albedo_only: bool = False
    # disable query compaction (full static budgets).  Set during the early
    # warmup window while the occupancy grid is still mostly-on: the valid
    # sample fraction then approaches 1.0 and a fractional budget would
    # silently drop the far samples of every ray (ADVICE round-2).
    full_budget: bool = False
    # overflow-feedback escalation: each level adds +1/16 headroom to every
    # fractional query budget (primary shading, candidate query, secondary
    # coarse/fine).  The training loop bumps it when a logged ovf_* counter
    # is nonzero, so a pose/schedule change that blows a static budget
    # costs one recompile instead of silently biasing renders ("no silent
    # caps", VERDICT round-2).
    budget_boost: int = 0
    # occupancy-adaptive primary shading budget in 16ths (0 = use the
    # config's query_compaction fraction).  Published by the training
    # loop from the measured valid-sample fraction with hysteresis
    # (`adaptive_query_compaction: true`); a tight occupancy grid then
    # shrinks the shading row count instead of spending the static
    # budget on empty space.
    budget_frac_n16: int = 0


@register("intrinsic-avatar")
class IntrinsicAvatar:
    """Composition root.  Construct from a config tree (see
    ``intrinsicavatar_tpu.utils.default_config``)."""

    def __init__(self, config):
        self.config = config
        self.geometry = make(config.geometry.name, config.geometry)
        self.density = make(config.density.name, config.density)
        self.radiance = make(config.radiance.name, config.radiance)
        self.material = make(config.material.name, config.material)
        self.pose_encoder = make(config.pose_encoder.name, config.pose_encoder)
        self.pose_correction = make(config.pose_correction.name,
                                    config.pose_correction)
        self.deformer = make(config.deformer.name, config.deformer)
        self.scatterer = (make(config.scatterer.name, config.scatterer)
                          if config.get("scatterer") else None)
        self.emitter = (make(config.light.name, config.light)
                        if config.get("light") else None)

        self.scene_aabb = np.asarray(config.scene_aabb, np.float32)
        diag = float(np.linalg.norm(self.scene_aabb[3:] - self.scene_aabb[:3]))
        self.num_samples_per_ray = config.get("num_samples_per_ray", 128)
        self.render_step_size = diag / self.num_samples_per_ray
        self.samples_per_pixel = config.get("samples_per_pixel", 512)
        self.num_samples_per_secondary_ray = config.get(
            "num_samples_per_secondary_ray", 64)
        self.secondary_near_plane = config.get("secondary_near_plane", 0.0)
        self.secondary_far_plane = config.get("secondary_far_plane", 1.5)
        self.secondary_importance_sample = config.get(
            "secondary_importance_sample", True)
        self.zero_crossing_search = config.get("zero_crossing_search", True)
        self.add_emitter = config.get("add_emitter", False)
        self.volume_scattering = config.get("volume_scattering", True)
        self.material_feature = config.get("material_feature", "hybrid")
        self.n_importance_rounds = config.get("n_importance_rounds", 2)
        self.n_importance_samples = config.get("n_importance_samples", 16)
        self.grid_prune_occ_thre = config.get("grid_prune_occ_thre", 0.001)

    # ------------------------------------------------------------- setup

    def init(self, key: jax.Array) -> dict:
        ks = jax.random.split(key, 8)
        params = {
            "geometry": self.geometry.init(ks[0]),
            "radiance": self.radiance.init(ks[1]),
            "density": self.density.init(ks[2]),
            "material": self.material.init(ks[3]),
            "deformer": self.deformer.init(ks[4]),
            "pose_encoder": self.pose_encoder.init(ks[5]),
            "pose_correction": self.pose_correction.init(ks[6]),
        }
        if self.scatterer is not None:
            params["scatterer"] = self.scatterer.init(ks[7])
        if self.emitter is not None:
            params["emitter"] = self.emitter.init(
                jax.random.fold_in(ks[7], 1))
        return params

    def initialize(self, betas):
        """Host-side once-per-sequence init; also sets field bboxes."""
        statics = self.deformer.initialize(betas)
        self.geometry.prepare_bbox(self.deformer.bbox)
        self.radiance.prepare_bbox(self.deformer.bbox)
        return statics

    # ------------------------------------------------------------- frame

    def prepare(self, params, statics, batch, global_step=0):
        """Pose correction + SMPL forward + transform baking + pose cond."""
        corr = self.pose_correction(params["pose_correction"], batch["index"],
                                    global_step)
        smpl_params = {
            "betas": batch["betas"], "body_pose": batch["body_pose"],
            "global_orient": batch["global_orient"], "transl": batch["transl"],
            **corr,
        }
        frame = self.deformer.prepare(statics, smpl_params)
        cond = self.pose_encoder(params["pose_encoder"], frame.rot_mats,
                                 frame.joints[None])
        return frame, cond

    # ------------------------------------------------------------- fields

    def _schedules(self, step):
        return {
            "geo_mask": self.geometry.level_mask(step),
            "rad_mask": self.radiance.level_mask(step),
            "sh_mask": self.radiance.sh_mask(step),
        }

    def _geometry_query(self, params, sched, x, with_grad, with_feature,
                        with_laplace, rng=None):
        geo = self.geometry
        if not with_grad:
            out = geo.features(params["geometry"], x, sched["geo_mask"])
            sdf = take_channel(out, 0)
            return (sdf,) if not with_feature else (sdf, out)
        if with_laplace:
            sdf, grad, feat, lap = geo.sdf_grad_feature(
                params["geometry"], x, sched["geo_mask"], with_laplace=True,
                rng=rng)
            return sdf, grad, feat, lap
        sdf, grad, feat = geo.sdf_grad_feature(
            params["geometry"], x, sched["geo_mask"])
        return sdf, grad, feat

    def _deform_query(self, params, statics, frame, cond, pts, sched,
                      with_grad, with_feature, with_laplace=False,
                      eval_mode=True, rng=None, global_step=0, mask=None,
                      budget=None, mask2d=None, boost=0, seed=None,
                      seed_iters=None):
        """Canonicalize + query geometry; returns the deformer output list.

        When ``mask`` is given and query compaction is enabled, only a fixed
        budget of valid points runs the (expensive) Broyden search + field
        query; the rest receive neutral fills (sdf=1e5 -> alpha=0) — the
        TPU-native replacement for the reference's ragged packed evaluation.
        ``mask2d`` (the ``[R, S]`` view of ``mask``) selects sample-major
        compaction so budget overflow drops far samples, not whole rays.
        ``seed`` = ``(xc [M,3], ok [M])`` warm-starts the root search at a
        known canonical correspondence (eval-mode only; see
        ``FastSNARF.deform_seeded``) — seeds ride along as extra point
        columns so compaction gathers them with their points.
        """

        def geometry_fn(xc):
            return self._geometry_query(params, sched, xc, with_grad,
                                        with_feature, with_laplace, rng)

        def query(p):
            s = None
            if seed is not None:
                p, s = p[:, :3], (p[:, 3:6], p[:, 6] > 0.5)
            out = self.deformer(
                params["deformer"], statics, frame, p, cond, geometry_fn,
                with_jac=with_grad, eval_mode=eval_mode,
                global_step=global_step, boost=boost, seed=s,
                seed_iters=seed_iters)
            return tuple(out)

        if seed is not None:
            pts = jnp.concatenate(
                [pts, seed[0], seed[1].astype(pts.dtype)[:, None]], axis=-1)
        frac = self.config.get("query_compaction", 0.5)
        if mask is None or not frac:
            return list(query(pts))

        from intrinsicavatar_tpu.ops.compact import compact_apply
        from intrinsicavatar_tpu.utils import diag
        M = pts.shape[0]
        if budget is None:
            budget = int(np.ceil(
                M * min(1.0, float(frac) + 0.0625 * boost) / 128.0)) * 128
        budget = min(max(budget, 128), M)
        diag.record("ovf_query", jax.nn.relu(
            jnp.sum(mask.astype(jnp.int32)) - budget))
        # fills by deformer output position: pts_cano, sdf, valid,
        # [grad_obs, grad_cano, feat, laplace]
        fills = [0.0, 1e5, False]
        if with_grad:
            fills += [jnp.asarray([0.0, 0.0, 1.0]),
                      jnp.asarray([0.0, 0.0, 1.0])]
        if with_feature:
            fills.append(0.0)
        if with_laplace:
            fills.append(0.0)
        return list(compact_apply(query, pts, mask, budget, fills,
                                  mask2d=mask2d))

    def get_alpha(self, params, sdf, dists, step):
        beta = self.density.get_beta(params["density"], step)
        return V.alpha_from_sdf(sdf, dists, beta)

    def occ_eval_fn(self, params, statics, frame, cond, sched, step):
        """alpha(x) evaluator for occupancy updates
        (`models/intrinsic_avatar.py:243-254`)."""

        def fn(x):
            out = self._deform_query(params, statics, frame, cond, x, sched,
                                     with_grad=False, with_feature=False,
                                     eval_mode=True, global_step=step)
            sdf = out[1]
            return self.get_alpha(params, sdf, self.render_step_size, step)

        return fn

    # ------------------------------------------------------- importance

    def _coarse_sdf_at_edges(self, params, statics, frame, cond, sched,
                             rays_o, rays_d, iv: RayIntervals, step,
                             prev_sdf=None, is_new=None, full_budget=False,
                             boost=0, seed_grid=None):
        """SDF at (new) edge values; invalid slots get 1e10
        (`models/intrinsic_avatar.py:955-998` coarse_alpha_fn)."""
        R, E = iv.vals.shape
        t = jnp.where(iv.valid, iv.vals, 0.0)
        pos = (rays_o[:, None, :] + rays_d[:, None, :] * t[..., None]
               ).reshape(-1, 3)
        gth = self._grid_gather(seed_grid, pos)
        # Importance rounds only PLACE the primary shading samples (which
        # re-query their midpoints exactly, seeded, below in forward) —
        # like the baked secondary coarse pass, a grid with the SDF
        # channel answers every edge from the seed gather's own row.
        # ``baked_importance: false`` restores the queried rounds.
        if (gth is not None and gth[2] is not None
                and bool(self.config.get("baked_importance", True))):
            return jnp.where(iv.valid, gth[2].reshape(R, E), 1e10)
        qmask = iv.valid if is_new is None else (iv.valid & is_new)
        nb = None if is_new is None else R * self.n_importance_samples
        if full_budget and nb is None:
            nb = pos.shape[0]
        out = self._deform_query(params, statics, frame, cond, pos, sched,
                                 with_grad=False, with_feature=False,
                                 eval_mode=True, global_step=step,
                                 mask=qmask.reshape(-1), budget=nb,
                                 mask2d=qmask, boost=boost,
                                 seed=None if gth is None
                                 else (gth[0], gth[1]),
                                 seed_iters=int(self.config.get(
                                     "seed_grid_polish_iters", 6)))
        sdf_new = jax.lax.stop_gradient(out[1]).reshape(R, E)
        if prev_sdf is not None:
            sdf = jnp.where(is_new, sdf_new, prev_sdf)
        else:
            sdf = sdf_new
        return jnp.where(iv.valid, sdf, 1e10)

    def _edge_alphas_min_sdf(self, params, iv: RayIntervals, sdf, step):
        """Interval alpha from min(sdf_left, sdf_right), constant step dists."""
        sdf_r = jnp.roll(sdf, -1, axis=-1)
        valid_r = jnp.roll(iv.valid, -1, axis=-1).at[:, -1].set(False)
        real = iv.is_left & jnp.roll(iv.is_right, -1, axis=-1) & iv.valid \
            & valid_r
        sdf_min = jnp.minimum(sdf, jnp.where(real, sdf_r, jnp.inf))
        alphas = self.get_alpha(params, sdf_min, self.render_step_size, step)
        return jnp.where(real, alphas, 0.0), real

    def _importance_resample(self, params, statics, frame, cond, sched,
                             rays_o, rays_d, iv: RayIntervals, step,
                             full_budget=False, boost=0, seed_grid=None):
        """Merge-resampling rounds (`models/intrinsic_avatar.py:1184-1238`).

        Per-edge SDF values are cached across rounds through the merge's
        ``gather_idx`` payload carry, so each round after the initial full
        pass queries the deformer+SDF only at the ``n_new`` freshly drawn
        edges per ray — the reference's ``is_resampled`` contract
        (`cdf.cu:218-333` callers re-query new points only).
        """
        n_new = self.n_importance_samples
        # round 0: SDF at all (valid) initial edges
        sdf = self._coarse_sdf_at_edges(params, statics, frame, cond, sched,
                                        rays_o, rays_d, iv, step,
                                        full_budget=full_budget, boost=boost,
                                        seed_grid=seed_grid)
        for r in range(self.n_importance_rounds):
            alphas, _ = self._edge_alphas_min_sdf(params, iv, sdf, step)
            alphas = jax.lax.stop_gradient(alphas)
            weights, _ = V.render_weight_from_alpha(alphas, iv.valid)
            merged = RS.merge_resample_rays(iv.vals, iv.is_left, iv.is_right,
                                            iv.valid, weights, n_new)
            iv = RayIntervals(vals=merged.vals, is_left=merged.is_left,
                              is_right=merged.is_right, valid=merged.valid)
            if r + 1 == self.n_importance_rounds:
                break  # shading re-queries its own midpoints
            # carry cached SDF into the merged layout; new slots get a
            # placeholder that the masked re-query below overwrites
            fill = jnp.full((sdf.shape[0], n_new), 1e10, sdf.dtype)
            carried = jnp.take_along_axis(
                jnp.concatenate([sdf, fill], axis=1), merged.gather_idx,
                axis=1)
            sdf = self._coarse_sdf_at_edges(
                params, statics, frame, cond, sched, rays_o, rays_d, iv,
                step, prev_sdf=carried, is_new=merged.is_new, boost=boost,
                seed_grid=seed_grid)
        return iv

    # ------------------------------------------------------------ forward

    def sample_intervals(self, params, statics, frame, cond,
                         occ: OccGridState, rays_world, rng, step,
                         flags: RenderFlags, t_idx=0.0, seed_grid=None):
        """Stages 1-3: ray transform, occupancy marching, importance rounds.

        Entirely gradient-free (the reference wraps the importance loop in
        ``torch.no_grad``, `models/intrinsic_avatar.py:1240-1252`), so it can
        be jit-compiled separately from the differentiated shading stage —
        keeping each TPU compile unit small.  Returns
        ``(t_starts, t_ends, smask)`` rectangular ``[R, S]``.
        """
        sched = self._schedules(step)
        rays = self.deformer.rigid.transform_rays_w2s(frame, rays_world) \
            if hasattr(self.deformer, "rigid") else rays_world
        R = rays.shape[0]
        rays_o, rays_d = rays[:, :3], rays[:, 3:6]
        near, far = rays[:, 6], rays[:, 7]
        strat_u = (jax.random.uniform(rng, (R,))
                   if flags.randomized else None)

        lvl = level_of(occ, t_idx)
        iv = occupancy_sampling(
            rays_o, rays_d, occ.binaries[lvl], occ.aabbs[lvl],
            self.render_step_size, self.num_samples_per_ray,
            near=near, far=far, stratified_u=strat_u,
            concentrate=int(self.config.get("march_concentrate", 0)))

        if flags.importance_sample:
            iv = self._importance_resample(params, statics, frame, cond,
                                           sched, rays_o, rays_d, iv, step,
                                           full_budget=flags.full_budget,
                                           boost=flags.budget_boost,
                                           seed_grid=seed_grid)
        t_starts, t_ends, smask = intervals_to_samples(iv)
        return (jax.lax.stop_gradient(t_starts),
                jax.lax.stop_gradient(t_ends), smask)

    def bake_seed_grid(self, params, statics, frame, cond, step,
                       resolution=None, chunk=65536):
        """Per-frame eval-only correspondence bake (``anim/seedgrid.py``).

        One chunked pass of the ordinary searched canonicalization over a
        lattice spanning the deformed bbox — the same cost shape as the
        per-frame test occupancy build.  Returns a :class:`SeedGrid` to
        pass into :meth:`forward`'s ``seed_grid``; eval queries then
        warm-start from it instead of running the multi-init search.
        """
        from intrinsicavatar_tpu.anim.seedgrid import bake_seed_grid
        if resolution is None:
            resolution = int(self.config.get("seed_grid_resolution", 96))
        sched = self._schedules(step)
        aabb = self.deformer.rigid.get_bbox_deformed(frame)

        def deform_fn(p):
            out = self._deform_query(params, statics, frame, cond, p, sched,
                                     with_grad=False, with_feature=False,
                                     eval_mode=True, global_step=step)
            # third output bakes the canonical-SDF channel: eval placement
            # passes (secondary coarse march, importance rounds) then read
            # sdf from the same row gather as the seeds
            return out[0], out[2], out[1]

        return bake_seed_grid(deform_fn, aabb, resolution, chunk)

    def use_train_seed_grid(self, flags) -> bool:
        """Per-STEP baked correspondence grid for the phys training regime.

        The eval grid amortizes one bake over a whole frame; at training
        time the pose changes per step, but a phys step's secondary
        fan-out (rays x spp x occupied coarse samples, ~10^7 inverse-
        skinning queries at the reference's 4096x512 regime —
        `models/intrinsic_avatar.py:396-545` pays the full search per
        query) dwarfs a 64^3 (~2.6e5-point) bake.  The entire secondary
        stage is gradient-free (the reference wraps it in torch.no_grad),
        so placement-from-bake + seeded fine polish carry no gradient
        contract at all; the primary shading pass is untouched.  Opt-in
        via ``train_seed_grid: true`` until its TPU delta is measured.
        """
        if not flags.training \
                or not bool(self.config.get("train_seed_grid", False)):
            return False
        scope = str(self.config.get("train_seed_grid_scope", "phys"))
        if scope == "all":
            # radiance regime too: the bake also serves the importance
            # rounds (placement) and the primary shading pass (seeded
            # polish w/ the train-mode gradient correction) once
            # importance sampling is on
            return flags.enable_phys or flags.importance_sample
        return flags.enable_phys

    def bake_train_seed_grid(self, params, statics, frame, cond, step):
        """Per-step bake for training (`use_train_seed_grid`): smaller
        lattice (``train_seed_grid_resolution``, default 64) and fully
        detached — safe to call inside a differentiated step."""
        grid = self.bake_seed_grid(
            params, statics, frame, cond, step,
            resolution=int(self.config.get("train_seed_grid_resolution", 64)))
        return jax.tree.map(jax.lax.stop_gradient, grid)

    def _grid_seed(self, seed_grid, pts):
        """(seed_xc, seed_ok) for ``pts`` from the baked grid, or None."""
        g = self._grid_gather(seed_grid, pts)
        return None if g is None else (g[0], g[1])

    def _grid_gather(self, seed_grid, pts):
        """(seed_xc, seed_ok, sdf|None) for ``pts``, or None (no grid)."""
        if seed_grid is None:
            return None
        from intrinsicavatar_tpu.anim.seedgrid import gather_from_grid
        return gather_from_grid(
            seed_grid, pts,
            coh_factor=float(self.config.get("seed_grid_coh_factor", 3.0)))

    def forward(self, params, statics, frame, cond, occ: OccGridState,
                rays_world, rng, step, flags: RenderFlags,
                t_idx=0.0, background_color=None, emitter_state=None,
                intervals=None, albedo_align_ratio=None, seed_grid=None):
        """Render a batch of rays.  Returns the output dict of Appendix B
        (`models/intrinsic_avatar.py:1492-1666`): ``comp_rgb, comp_normal,
        opacity, depth, rays_valid, ...`` plus ``*_bg`` / ``*_full`` and
        training loss maps.

        ``intervals`` (from :meth:`sample_intervals`) skips stages 1-3 so
        the caller can jit the gradient-free sampling separately.

        Every static-budget truncation inside records an overflow counter;
        they are returned under ``out["counters"]`` (and logged by the
        training system) so a pose/schedule change that blows a budget is
        visible instead of silently biasing the render.
        """
        from intrinsicavatar_tpu.utils import diag
        with diag.collect() as counters:
            out_dict = self._forward_body(
                params, statics, frame, cond, occ, rays_world, rng, step,
                flags, t_idx, background_color, emitter_state, intervals,
                albedo_align_ratio, seed_grid)
        out_dict["counters"] = {k: jnp.asarray(v, jnp.int32)
                                for k, v in counters.items()}
        return out_dict

    def _forward_body(self, params, statics, frame, cond, occ: OccGridState,
                      rays_world, rng, step, flags: RenderFlags,
                      t_idx=0.0, background_color=None, emitter_state=None,
                      intervals=None, albedo_align_ratio=None,
                      seed_grid=None):
        from intrinsicavatar_tpu.utils import diag
        sched = self._schedules(step)
        rays = self.deformer.rigid.transform_rays_w2s(frame, rays_world) \
            if hasattr(self.deformer, "rigid") else rays_world
        R = rays.shape[0]
        rays_o, rays_d = rays[:, :3], rays[:, 3:6]
        near, far = rays[:, 6], rays[:, 7]
        if background_color is None:
            background_color = jnp.zeros(3)

        k_strat, k_lap, k_jit, k_pbr = jax.random.split(rng, 4)
        lvl = level_of(occ, t_idx)

        # training: a per-step baked grid serves the gradient-free stages
        # (importance placement, the whole secondary march) when enabled;
        # eval passes its per-frame grid in from the caller
        if seed_grid is None and intervals is None \
                and self.use_train_seed_grid(flags):
            seed_grid = self.bake_train_seed_grid(params, statics, frame,
                                                  cond, step)
        train_grid_ok = not flags.training or self.use_train_seed_grid(flags)

        if intervals is None:
            intervals = self.sample_intervals(
                params, statics, frame, cond, occ, rays_world, k_strat,
                step, flags, t_idx,
                seed_grid=seed_grid if train_grid_ok else None)
        t_starts, t_ends, smask = intervals
        S = t_starts.shape[1]
        mids = 0.5 * (t_starts + t_ends)
        dists = t_ends - t_starts

        # ------------------------------------------------ shading queries
        #
        # All per-sample field work (deformer, geometry, radiance,
        # material) runs in a COMPACT domain of the ~50% valid samples —
        # one gather in, one packed scatter out — so every hash-encode /
        # MLP (and its backward) touches half the lanes.  Samples beyond
        # the static budget are dropped from the render (alpha 0), exactly
        # like the per-query budgets the reference's ragged packing
        # replaced.
        pos = (rays_o[:, None, :] + rays_d[:, None, :] * mids[..., None]
               ).reshape(-1, 3)
        with_lap = flags.training and flags.with_curvature_loss
        Mfull = R * S
        frac = self.config.get("query_compaction", 0.5)
        # occupancy-adaptive override: the training loop tracks the
        # measured valid-sample fraction (EMA of shading_valid_samples /
        # shading_total_samples) and publishes a bucketed fraction in
        # 16ths through the static flags — tight occupancy grids then
        # stop paying for empty-space sample slots.  An explicit
        # query_compaction: 0 (compaction disabled) always wins.
        if flags.budget_frac_n16 > 0 and frac:
            frac = flags.budget_frac_n16 / 16.0
        use_compact = bool(frac) and Mfull >= 4096 \
            and not flags.full_budget
        # valid-fraction telemetry feeding the adaptive budget
        diag.record("shading_valid_samples",
                    jnp.sum(smask.astype(jnp.int32)))
        diag.record("shading_total_samples",
                    jnp.asarray(Mfull, jnp.int32))
        if use_compact:
            from intrinsicavatar_tpu.ops.compact import (
                compact_indices_interleaved)
            # +1/16 headroom over the nominal fraction (more under
            # overflow-feedback escalation): the sample-validity fraction
            # hovers around frac itself after importance merging
            # (overflow is observable via the ovf_shading counter)
            budget = int(np.ceil(Mfull * min(
                1.0, float(frac) + 0.0625 * (1 + flags.budget_boost))
                / 128.0)) * 128
            budget = min(max(budget, 128), Mfull)
            diag.record("ovf_shading", jax.nn.relu(
                jnp.sum(smask.astype(jnp.int32)) - budget))
            sidx, spicked = compact_indices_interleaved(smask, budget)
            pos_q = pos[sidx]
            dirs_q = jnp.repeat(rays_d, S, axis=0)[sidx]
            dists_q = dists.reshape(-1)[sidx]
            qmask = None
        else:
            sidx, spicked = None, None
            pos_q = pos
            dirs_q = jnp.repeat(rays_d, S, axis=0)
            dists_q = dists.reshape(-1)
            # compaction warmup = FULL evaluation: a mask here would still
            # compact inside _deform_query at the nominal budget (with no
            # headroom), silently dropping lanes during the all-on-grid
            # phase the warmup exists to protect
            qmask = None if flags.full_budget else smask.reshape(-1)

        # The primary shading pass runs under the scoped reduced-
        # precision policy (``primary_dtype``, default bfloat16):
        # hash-table gathers and MLP matmuls in bf16 with f32
        # accumulation (preferred_element_type) — the TPU-native
        # analog of the reference's fused-fp16 tcnn hot path
        # (`models/network_utils.py:58-100`).  Alphas, volume
        # rendering and losses stay f32 (the scope only changes
        # gather/matmul compute dtypes).  Set ``primary_dtype:
        # float32`` for the exact path; tiny-capsule val guard:
        # tests/test_precision.py::test_primary_bf16_val_guard.
        from intrinsicavatar_tpu.ops import precision
        pd = str(self.config.get("primary_dtype", "bfloat16"))
        # warm-start the shading pass's inverse skinning from the baked
        # correspondence grid (anim/seedgrid.py): per-frame at eval;
        # per-step at training when `train_seed_grid_primary` also routes
        # the primary pass through the seeded polish (the train-mode
        # gradient correction in FastSNARF.deform_seeded keeps the pose-
        # gradient topology of the searched path)
        allow_primary_seed = (not flags.training
                              or bool(self.config.get(
                                  "train_seed_grid_primary", True)))
        grid_seed = (self._grid_seed(seed_grid, pos_q)
                     if train_grid_ok and allow_primary_seed else None)
        with precision.scope(None if pd == "float32" else pd):
            out = self._deform_query(
                params, statics, frame, cond, pos_q, sched,
                with_grad=True, with_feature=True, with_laplace=False,
                eval_mode=not flags.training, rng=k_lap, global_step=step,
                mask=qmask, boost=flags.budget_boost, seed=grid_seed,
                seed_iters=int(self.config.get("seed_grid_polish_iters", 6)))
            pos_cano, sdf, valid, sdf_grad, sdf_grad_cano, feat = out[:6]

            # Curvature on a random SUBSET of the shading lanes: the tangent
            # perturbation needs a second SDF-gradient evaluation whose backward
            # scatters into the hash tables (the dominant TPU cost); the
            # curvature loss only consumes the masked *mean*, so a uniform
            # with-replacement subsample is an unbiased estimator.  The
            # reference computes it on every sample (`models/rf/geometry.py:
            # 173-205`); set ``curvature_subsample: 1.0`` for the exact path.
            laplace = laplace_mask = None
            if with_lap:
                q_valid = valid & (spicked if use_compact
                                   else smask.reshape(-1))
                frac_lap = float(self.config.get("curvature_subsample", 0.25))
                nq = pos_cano.shape[0]
                if frac_lap >= 1.0:
                    x_sub, grad_sub, laplace_mask = pos_cano, sdf_grad_cano, \
                        q_valid
                else:
                    nsub = min(max(int(np.ceil(nq * frac_lap / 128.0)) * 128,
                                   128), nq)
                    k_sub, k_lap = jax.random.split(k_lap)
                    sub = jax.random.randint(k_sub, (nsub,), 0, nq)
                    x_sub = jnp.take(pos_cano, sub, axis=0)
                    grad_sub = jnp.take(sdf_grad_cano, sub, axis=0)
                    laplace_mask = jnp.take(q_valid, sub, axis=0)
                laplace = self.geometry._tangent_laplace(
                    params["geometry"], x_sub, grad_sub, sched["geo_mask"],
                    k_lap)

            dirs_world = self.deformer.rigid.transform_dirs_s2w(frame, dirs_q)
            normal_world_q = self.deformer.rigid.transform_dirs_s2w(
                frame, sdf_grad)

            rgbs, rgb_feat = self.radiance(
                params["radiance"], pos_cano, feat, dirs_world, normal_world_q,
                level_mask=sched["rad_mask"], sh_mask=sched["sh_mask"])

            alphas = self.get_alpha(params, sdf, dists_q, step)

            mats = mats_jitter = None
            if flags.enable_phys:
                if self.material_feature == "geometry":
                    mat_feat = feat
                elif self.material_feature == "radiance":
                    mat_feat = rgb_feat
                else:
                    mat_feat = jnp.concatenate([rgb_feat, feat], axis=-1)
                mats = self.material(params["material"], mat_feat)
                if not flags.training and albedo_align_ratio is not None:
                    # eval-time albedo alignment: the fitted per-channel ratio
                    # scales the material albedo so relighting uses aligned
                    # colors (`models/intrinsic_avatar.py:1114-1115`)
                    alb0, rest0 = split_channels(mats, [3, mats.shape[-1] - 3])
                    mats = jnp.concatenate(
                        [alb0 * albedo_align_ratio[None, :], rest0], -1)
                # Jittered material clone for the smoothness regularizers.  The
                # clone needs its own geometry+radiance encodes whose backward
                # scatters into BOTH hash tables; like the curvature proxy, the
                # losses only consume means, so on the compact path a uniform
                # with-replacement subsample is an unbiased estimator of the
                # reference's per-sample accumulation (set
                # ``smoothness_subsample: 1.0`` for the exact path).
                frac_j = float(self.config.get("smoothness_subsample", 0.25))
                jit_subsample = use_compact and frac_j < 1.0
                jsub = mats_sub = mats_jitter_sub = None

                def jitter_mats(pos_base):
                    pos_j = pos_base + jax.random.normal(
                        k_jit, pos_base.shape) * 0.01
                    feat_j = self.geometry.features(
                        params["geometry"], pos_j, sched["geo_mask"])
                    if self.material_feature == "geometry":
                        mfj = feat_j
                    else:
                        rgb_feat_j = self.radiance(
                            params["radiance"], pos_j, feat_j, None,
                            level_mask=sched["rad_mask"], feature_only=True)
                        mfj = rgb_feat_j if self.material_feature == "radiance" \
                            else jnp.concatenate([rgb_feat_j, feat_j], axis=-1)
                    return self.material(params["material"], mfj)

                if flags.training and flags.jitter_materials and jit_subsample:
                    nq = pos_cano.shape[0]
                    nsub = min(max(int(np.ceil(nq * frac_j / 128.0)) * 128,
                                   128), nq)
                    k_jsub, k_jit = jax.random.split(k_jit)
                    jsub = jax.random.randint(k_jsub, (nsub,), 0, nq)
                    mats_sub = jnp.take(mats, jsub, axis=0)
                    mats_jitter_sub = jitter_mats(jnp.take(pos_cano, jsub,
                                                           axis=0))
                    mats_jitter = jnp.zeros_like(mats)
                elif flags.training and flags.jitter_materials:
                    mats_jitter = jitter_mats(pos_cano)
                else:
                    mats_jitter = jnp.zeros_like(mats)

        if use_compact:
            # one packed row scatter returns every per-sample quantity to
            # the rectangular [R*S] layout (scatters run ~10M rows/s on
            # v5e — pack once instead of scattering each quantity)
            n_mat = mats.shape[-1] if mats is not None else 0
            widths = [1, 3, 3, 1, 1]
            cols = [alphas[:, None], rgbs, sdf_grad, sdf[:, None],
                    spicked[:, None].astype(sdf.dtype)]
            pack_jitter = flags.enable_phys and jsub is None
            if flags.enable_phys:
                widths += [n_mat]
                cols += [mats]
                if pack_jitter:
                    widths += [n_mat]
                    cols += [mats_jitter]
            packed_q = jnp.concatenate(cols, axis=-1)
            packed_q = jnp.where(spicked[:, None], packed_q, 0.0)
            full = jnp.zeros((Mfull, packed_q.shape[-1]), packed_q.dtype
                             ).at[sidx].set(packed_q)
            parts = split_channels(full, widths)
            alphas = parts[0][:, 0]
            rgbs = parts[1]
            sdf_grad = parts[2]
            sdf = parts[3][:, 0]
            smask = smask & (parts[4][:, 0] > 0.5).reshape(R, S)
            if flags.enable_phys:
                mats = parts[5]
                if pack_jitter:
                    mats_jitter = parts[6]
                else:
                    mats_jitter = jnp.zeros_like(mats)
            valid = jnp.zeros((Mfull,), bool).at[sidx].set(valid & spicked)

        normal_smpl = safe_normalize(sdf_grad)
        normal_world = self.deformer.rigid.transform_dirs_s2w(frame, sdf_grad)
        alphas = alphas.reshape(R, S)

        # ------------------------------------------------ composite
        weights, trans = V.render_weight_from_alpha(alphas, smask)
        rgb_map = V.accumulate_along_rays(weights, rgbs.reshape(R, S, 3), smask)
        normal_map = V.accumulate_along_rays(
            weights, normal_world.reshape(R, S, 3), smask)
        acc_map = V.accumulate_along_rays(weights, None, smask)
        depth_map = V.accumulate_along_rays(weights, mids[..., None], smask)
        depth_map = depth_map + (1.0 - acc_map) * far[:, None]

        out_dict = {
            "comp_rgb": rgb_map,
            "comp_normal": normal_map,
            "opacity": acc_map,
            "depth": depth_map,
            "rays_valid": acc_map > 0,
            "rays_valid_phys": (acc_map > 0) if flags.enable_phys
            else jnp.zeros_like(acc_map, dtype=bool),
            "num_samples": jnp.sum(smask.astype(jnp.int32)),
            "beta": self.density.get_beta(params["density"], step),
        }

        if flags.enable_phys:
            m = mats.reshape(R, S, -1)
            m_alb, m_rough, m_metal = split_channels(
                m, [3, 1, m.shape[-1] - 4])
            albedo_map = V.accumulate_along_rays(weights, m_alb, smask)
            roughness_map = V.accumulate_along_rays(weights, m_rough, smask)
            metallic_map = V.accumulate_along_rays(weights, m_metal, smask)
            out_dict.update({
                "comp_albedo": albedo_map,
                "comp_roughness": roughness_map,
                "comp_metallic": metallic_map,
            })
            if not flags.albedo_only:
                from intrinsicavatar_tpu.render import pbr as pbr_mod
                pbr_out = pbr_mod.pbr_forward(
                    self, params, statics, frame, cond, occ, sched,
                    rays_o, rays_d, t_starts, t_ends, smask, weights, trans,
                    sdf.reshape(R, S), mats, normal_smpl.reshape(R, S, 3),
                    k_pbr, step, flags, background_color, lvl,
                    emitter_state=emitter_state,
                    seed_grid=seed_grid if train_grid_ok else None)
                out_dict.update(pbr_out)

        if flags.training:
            out_dict.update({
                "sdf_samples": sdf,
                "sdf_grad_samples": sdf_grad,
                "weights": weights,
                "points": mids,
                "intervals": dists,
                "sample_mask": smask,
                "sample_valid": valid.reshape(R, S),
            })
            if laplace is not None:
                out_dict["sdf_laplace_samples"] = laplace
                out_dict["laplace_mask"] = laplace_mask
            if flags.enable_phys:
                nrm = normal_smpl.reshape(R, S, 3)
                orient = jnp.clip(jnp.sum(
                    rays_d[:, None, :] * nrm, -1, keepdims=True), 0.0)
                out_dict["normals_orientation_loss_map"] = \
                    V.accumulate_along_rays(weights, orient, smask)

                def smooth_loss(v, vj):
                    base = jnp.clip(jnp.maximum(v, vj), 1e-6)
                    return jnp.sum(((v - vj) / base) ** 2, -1, keepdims=True)

                if jsub is not None:
                    # subsampled estimator of mean_r(sum_s w * smooth):
                    # (n_lanes / R) * mean over the lane subset of w*smooth
                    w_sub = jnp.take(weights.reshape(-1),
                                     jnp.take(sidx, jsub))[:, None] \
                        * jnp.take(spicked, jsub)[:, None]
                    scale = pos_cano.shape[0] / R
                    ms_alb, ms_rough, ms_metal = split_channels(
                        mats_sub, [3, 1, mats_sub.shape[-1] - 4])
                    mjs_alb, mjs_rough, mjs_metal = split_channels(
                        mats_jitter_sub,
                        [3, 1, mats_jitter_sub.shape[-1] - 4])
                    out_dict.update({
                        "albedo_smoothness_loss_map": scale * jnp.mean(
                            w_sub * smooth_loss(ms_alb, mjs_alb)),
                        "roughness_smoothness_loss_map": scale * jnp.mean(
                            w_sub * smooth_loss(ms_rough, mjs_rough)),
                        "metallic_smoothness_loss_map": scale * jnp.mean(
                            w_sub * smooth_loss(ms_metal, mjs_metal)),
                    })
                else:
                    mj = mats_jitter.reshape(R, S, -1)
                    mj_alb, mj_rough, mj_metal = split_channels(
                        mj, [3, 1, mj.shape[-1] - 4])
                    out_dict.update({
                        "albedo_smoothness_loss_map": V.accumulate_along_rays(
                            weights, smooth_loss(m_alb, mj_alb), smask),
                        "roughness_smoothness_loss_map":
                            V.accumulate_along_rays(
                                weights, smooth_loss(m_rough, mj_rough),
                                smask),
                        "metallic_smoothness_loss_map":
                            V.accumulate_along_rays(
                                weights, smooth_loss(m_metal, mj_metal),
                                smask),
                    })
            else:
                z = jnp.zeros_like(acc_map)
                out_dict.update({
                    "normals_orientation_loss_map": z,
                    "albedo_smoothness_loss_map": z,
                    "roughness_smoothness_loss_map": z,
                    "metallic_smoothness_loss_map": z,
                })

        # --------------------------------------------- bg + full composite
        bg_rgb = jnp.broadcast_to(background_color[None, :], rgb_map.shape)
        out_dict["comp_rgb_bg"] = bg_rgb
        out_dict["comp_rgb_full"] = jnp.clip(
            linear_to_srgb(rgb_map + bg_rgb * (1.0 - acc_map)), 0.0, 1.0)
        if flags.enable_phys:
            if not flags.albedo_only:
                out_dict["comp_rgb_phys_full"] = jnp.clip(
                    linear_to_srgb(out_dict["comp_rgb_phys"]), 0.0, 1.0)
                out_dict["comp_demod_phys_full"] = jnp.clip(
                    linear_to_srgb(out_dict["comp_demod_phys"]), 0.0, 1.0)
            bg_scalar = jnp.mean(background_color)
            out_dict["comp_albedo_full"] = (
                out_dict["comp_albedo"])
            out_dict["comp_metallic_full"] = (
                out_dict["comp_metallic"]
                + bg_scalar * (1.0 - acc_map))
            out_dict["comp_roughness_full"] = (
                out_dict["comp_roughness"]
                + bg_scalar * (1.0 - acc_map))
            out_dict["rays_valid_phys_full"] = out_dict["rays_valid_phys"]
        return out_dict
