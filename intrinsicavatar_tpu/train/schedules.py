"""Scalar schedules for loss weights and learning rates.

Equivalents of ``BaseSystem.C`` (`systems/base.py:33-88` in
taconite/IntrinsicAvatar) and the warmup + MultiStepLR composite
(`configs/config.yaml:137-152`), written as pure functions of the (possibly
traced) global step so the whole train step jits.
"""

from __future__ import annotations

import jax.numpy as jnp


def C(value, step):
    """Interpret a scheduled scalar.

    * number -> constant;
    * ``[v0, v1, end_step]`` -> step function: v0 before end_step, v1 after;
    * ``[start_step, v0, v1, end_step]`` -> 0 before start_step, then linear
      ramp v0 -> v1 over [start_step, end_step].
    """
    if isinstance(value, (int, float)):
        return jnp.asarray(float(value))
    value = list(value)
    step = jnp.asarray(step, jnp.float32)
    if len(value) == 3:
        v0, v1, end = value
        return jnp.where(step < end, v0, v1).astype(jnp.float32)
    if len(value) == 4:
        start, v0, v1, end = value
        t = jnp.clip((step - start) / max(end - start, 1e-8), 0.0, 1.0)
        ramp = v0 + (v1 - v0) * t
        return jnp.where(step >= start, ramp, 0.0).astype(jnp.float32)
    raise TypeError(f"bad schedule spec: {value!r}")


def C_static(value, step: int) -> float:
    """Python-float version of :func:`C` for trace-time gating decisions."""
    if isinstance(value, (int, float)):
        return float(value)
    value = list(value)
    if len(value) == 3:
        v0, v1, end = value
        return float(v0 if step < end else v1)
    start, v0, v1, end = value
    if step < start:
        return 0.0
    t = min(max((step - start) / max(end - start, 1e-8), 0.0), 1.0)
    return float(v0 + (v1 - v0) * t)


DEFAULT_LR_MILESTONES = (12500, 18750, 22500, 23750)


def lr_schedule(step, base_lr: float, warmup_steps: int = 1000,
                warmup_start_factor: float = 0.01,
                milestones=DEFAULT_LR_MILESTONES, gamma: float = 0.3):
    """Linear warmup then MultiStepLR decay (`configs/config.yaml:137-152`)."""
    step = jnp.asarray(step, jnp.float32)
    warm = warmup_start_factor + (1.0 - warmup_start_factor) * jnp.clip(
        step / max(warmup_steps, 1), 0.0, 1.0)
    decay = jnp.ones(())
    for m in milestones:
        decay = decay * jnp.where(step >= m, gamma, 1.0)
    return base_lr * warm * decay


def lr_schedule_host(step: int, system_cfg) -> float:
    """Host-side (numpy-free) twin of :func:`lr_schedule` for logging —
    same formula and defaults, no device round-trip per log step."""
    sch = system_cfg.get("scheduler", {})
    sf = sch.get("warmup_start_factor", 0.01)
    w = system_cfg.get("warmup_steps", 1000)
    lr = system_cfg.get("optimizer", {}).get("args", {}).get("lr", 1e-3) \
        * (sf + (1.0 - sf) * min(step / max(w, 1), 1.0))
    for m in sch.get("milestones", DEFAULT_LR_MILESTONES):
        if step >= m:
            lr *= sch.get("gamma", 0.3)
    return lr
