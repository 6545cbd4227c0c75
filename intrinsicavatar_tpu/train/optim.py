"""Optimizer factory: Adam with named param groups + composite LR schedule.

Equivalent of `systems/utils.py:305-351` + `configs/config.yaml:110-152`
(taconite/IntrinsicAvatar): Adam(betas=(0.9, 0.99), eps=1e-15) with
per-group learning-rate multipliers and (torch-style, pre-Adam) L2 weight
decay on selected groups; 1k-step linear warmup then MultiStepLR gamma=0.3.

Groups are addressed by '/'-joined parameter-path prefixes into the params
pytree, e.g. ``pose_correction`` or ``radiance/table``.
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp
import optax

from intrinsicavatar_tpu.train.schedules import lr_schedule


def _path_str(path) -> str:
    parts = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            parts.append(str(p.key))
        elif isinstance(p, jax.tree_util.SequenceKey):
            parts.append(str(p.idx))
        elif isinstance(p, jax.tree_util.GetAttrKey):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _group_of(path_str: str, groups: Mapping[str, dict]) -> str | None:
    """Longest matching group prefix for a parameter path."""
    best = None
    for prefix in groups:
        key = prefix.replace(".", "/")
        if path_str == key or path_str.startswith(key + "/"):
            if best is None or len(key) > len(best):
                best = prefix
    return best


def make_optimizer(params, optimizer_cfg, scheduler_cfg,
                   warmup_steps: int = 1000):
    """Build the optax GradientTransformation.

    Args:
      params: the parameter pytree (for group resolution).
      optimizer_cfg: ``{args: {lr, betas, eps}, params: {group: {lr,
        weight_decay}}}``.
      scheduler_cfg: ``{milestones, gamma, warmup_start_factor}``.
    """
    args = optimizer_cfg.get("args", {})
    base_lr = args.get("lr", 1e-3)
    b1, b2 = args.get("betas", [0.9, 0.99])
    eps = args.get("eps", 1e-15)
    groups = optimizer_cfg.get("params", {}) or {}
    milestones = tuple(scheduler_cfg.get("milestones",
                                         [12500, 18750, 22500, 23750]))
    gamma = scheduler_cfg.get("gamma", 0.3)
    start_factor = scheduler_cfg.get("warmup_start_factor", 0.01)

    # per-leaf lr multiplier and weight decay trees
    def leaf_info(path, _):
        g = _group_of(_path_str(path), groups)
        if g is None:
            return (1.0, 0.0)
        gcfg = groups[g]
        mult = float(gcfg.get("lr", base_lr)) / base_lr
        wd = float(gcfg.get("weight_decay", 0.0))
        return (mult, wd)

    info = jax.tree_util.tree_map_with_path(leaf_info, params)
    lr_mults = jax.tree.map(lambda i: i[0], info,
                            is_leaf=lambda x: isinstance(x, tuple))
    wds = jax.tree.map(lambda i: i[1], info,
                       is_leaf=lambda x: isinstance(x, tuple))

    def add_l2(updates, p):
        # torch-style decay: grad += wd * param, before Adam moments
        return jax.tree.map(lambda g, w, wd: g + wd * w, updates, p, wds)

    def scale_per_leaf(updates, params=None):
        return jax.tree.map(lambda g, m: g * m, updates, lr_mults)

    def sched(step):
        return lr_schedule(step, base_lr, warmup_steps, start_factor,
                           milestones, gamma)

    tx = optax.chain(
        optax.stateless(add_l2),
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps, eps_root=0.0),
        optax.stateless(scale_per_leaf),
        optax.scale_by_learning_rate(sched),
    )
    return tx
