"""SDF -> density conversion (VolSDF Laplace CDF) with learned/scheduled beta.

Equivalents of `models/rf/density.py:19-59` (taconite/IntrinsicAvatar).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from intrinsicavatar_tpu.registry import register
from intrinsicavatar_tpu.ops.volrend import laplace_density


@register("learned-laplace-density")
class LearnedLaplaceDensity:
    """beta is a learned parameter: effective beta = |beta| + beta_min."""

    def __init__(self, config):
        self.config = config
        self.beta_min = config.get("beta_min", 1e-4)
        self.beta_init = config.get("params_init", {}).get("beta", 0.1)

    def init(self, key=None):
        return {"beta": jnp.asarray(float(self.beta_init))}

    def get_beta(self, params, global_step=None):
        return jnp.abs(params["beta"]) + self.beta_min

    def __call__(self, params, sdf, beta=None, global_step=None):
        if beta is None:
            beta = self.get_beta(params)
        return laplace_density(sdf, beta)


@register("scheduled-laplace-density")
class ScheduledLaplaceDensity:
    """beta follows beta0 / (1 + (beta0-beta1)/beta1 * t^0.8), t = step/N."""

    def __init__(self, config):
        self.config = config
        self.beta0 = config.get("beta0", 0.1)
        self.beta1 = config.get("beta1", 0.001)
        self.schedule_steps = config.get("beta_schedule_steps", 10000)

    def init(self, key=None):
        return {}

    def get_beta(self, params, global_step=0):
        t = jnp.minimum(
            jnp.asarray(global_step, jnp.float32) / self.schedule_steps, 1.0
        )
        return self.beta0 / (
            1.0 + (self.beta0 - self.beta1) / self.beta1 * t**0.8
        )

    def __call__(self, params, sdf, beta=None, global_step=0):
        if beta is None:
            beta = self.get_beta(params, global_step)
        return laplace_density(sdf, beta)
