"""Material field: Lipschitz-MLP head over hybrid features.

Equivalent of ``VolumeMaterial`` (`models/pbr/material.py:13-87` in
taconite/IntrinsicAvatar): sigmoid outputs affinely mapped to
albedo (x0.77 + 0.03), roughness (x0.9 + 0.09) and metallic (x1.0 + 0.0).
The Lipschitz bound regularizer comes from the MLP; the smoothness/
orientation/entropy regularizers are assembled by the training system from
per-sample loss maps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from intrinsicavatar_tpu.registry import register
from intrinsicavatar_tpu.nets.mlp import make_mlp, LipschitzMLP
from intrinsicavatar_tpu.ops.math import get_activation, split_channels


@register("volume-material")
class VolumeMaterial:
    def __init__(self, config):
        self.config = config
        self.n_output_dims = config.get("n_output_dim", 5)
        self.n_input_dims = config.get("input_feature_dim", 48)
        self.mlp = make_mlp(self.n_input_dims, self.n_output_dims,
                            config.get("mlp_network_config", {}))
        self.activation = get_activation(config.get("material_activation"))
        self.albedo_scale = config.get("albedo_scale", 0.77)
        self.albedo_bias = config.get("albedo_bias", 0.03)
        self.roughness_scale = config.get("roughness_scale", 0.9)
        self.roughness_bias = config.get("roughness_bias", 0.09)
        self.metallic_scale = config.get("metallic_scale", 1.0)
        self.metallic_bias = config.get("metallic_bias", 0.0)

    def init(self, key):
        return {"mlp": self.mlp.init(key)}

    def __call__(self, params, features):
        """``[N, F] -> [N, n_output_dims]`` = (albedo*3, roughness, metallic*k)."""
        raw = self.activation(self.mlp(params["mlp"], features))
        # selector-matmul split: slice backwards (pads) crash the TPU
        # fusion pass (ops.math.split_channels)
        a_raw, r_raw, m_raw = split_channels(
            raw, [3, 1, self.n_output_dims - 4])
        albedo = a_raw * self.albedo_scale + self.albedo_bias
        roughness = r_raw * self.roughness_scale + self.roughness_bias
        metallic = m_raw * self.metallic_scale + self.metallic_bias
        return jnp.concatenate([albedo, roughness, metallic], axis=-1)

    def lipschitz_bound(self, params):
        if isinstance(self.mlp, LipschitzMLP):
            return self.mlp.lipschitz_bound_full(params["mlp"])
        return jnp.asarray(0.0)
