"""Radiance fields: view-dir, reflected-dir, and RefNeRF-style variants.

Equivalents of `models/rf/radiance.py` (taconite/IntrinsicAvatar):

  * ``volume-radiance``            — plain view-direction conditioning.
  * ``volume-ref-dir-radiance``    — DEFAULT: own progressive hash grid over
    canonical xyz + SH(4) of the *reflected* view direction with a
    progressive band mask (`radiance.py:82-155`).
  * ``volume-reflection-radiance`` — full RefNeRF head (diffuse + tint +
    roughness + bottleneck + IDE, `radiance.py:250-358`).

All return ``(color, xyz_features)`` — the xyz features feed the material
head in "hybrid" mode (`models/intrinsic_avatar.py:184-188`).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from intrinsicavatar_tpu.registry import register
from intrinsicavatar_tpu.nets.mlp import make_mlp
from intrinsicavatar_tpu.ops.hashgrid import hashgrid_encode, init_hashgrid
from intrinsicavatar_tpu.ops.encoding import (
    hashgrid_level_mask, sh_band_mask, spherical_harmonics,
    integrated_directional_encoding,
)
from intrinsicavatar_tpu.ops.math import get_activation, reflect
from intrinsicavatar_tpu.fields.geometry import hashgrid_spec_from_config


class _RadianceBase:
    def __init__(self, config):
        self.config = config
        self.n_dir_dims = config.get("n_dir_dims", 3)
        self.input_feature_dim = config.get("input_feature_dim", 16)
        enc_cfg = config.get("xyz_encoding_config", None)
        self.spec = hashgrid_spec_from_config(enc_cfg) if enc_cfg else None
        self.enc_cfg = enc_cfg
        self.color_activation = get_activation(config.get("color_activation"))
        self.center = np.zeros(3, np.float32)
        self.scale = np.ones(3, np.float32)
        self._bbox_set = False
        self.sh_degree = config.get("dir_encoding_config", {}).get("degree", 4)
        self.sh_start_step = config.get("start_step", 0)
        self.sh_full_band_step = config.get("full_band_step", 1)

    def prepare_bbox(self, bbox):
        if self._bbox_set:
            return
        bbox = np.asarray(bbox, np.float32)
        self.center = (bbox[0] + bbox[1]) / 2.0
        self.scale = bbox[1] - bbox[0]
        self._bbox_set = True

    @property
    def xyz_feature_dim(self) -> int:
        return self.spec.n_output_dims if self.spec else 0

    def level_mask(self, global_step):
        if self.spec is None:
            return None
        return hashgrid_level_mask(
            global_step,
            n_levels=self.spec.n_levels,
            n_features_per_level=self.spec.n_features_per_level,
            start_level=self.enc_cfg.get("start_level", self.spec.n_levels),
            start_step=self.enc_cfg.get("start_step", 0),
            update_steps=self.enc_cfg.get("update_steps", 1),
            smooth=self.enc_cfg.get("update_mode", "non_smooth") == "smooth",
            full_band_step=self.enc_cfg.get("full_band_step", 5000),
        )

    def sh_mask(self, global_step):
        return sh_band_mask(global_step, 4, self.sh_start_step,
                            self.sh_full_band_step)

    def _xyz_embed(self, params, points, level_mask):
        if self.spec is None:
            return jnp.zeros((points.shape[0], 0), points.dtype)
        xn = (points - jnp.asarray(self.center)) / jnp.asarray(self.scale) + 0.5
        return hashgrid_encode(params["table"], xn, self.spec, level_mask)


@register("volume-radiance")
class VolumeRadiance(_RadianceBase):
    """Color from (xyz features, geometry features, SH(view dir), extras)."""

    def __init__(self, config):
        super().__init__(config)
        sh_dim = self.sh_degree ** 2
        self.n_input_dims = (self.input_feature_dim + sh_dim
                             + self.xyz_feature_dim)
        self.mlp = make_mlp(self.n_input_dims, 3,
                            config.get("mlp_network_config", {}))

    def init(self, key):
        k1, k2 = jax.random.split(key)
        p = {"mlp": self.mlp.init(k2)}
        if self.spec is not None:
            p["table"] = init_hashgrid(k1, self.spec)
        return p

    def __call__(self, params, points, features, dirs, *args,
                 level_mask=None, sh_mask=None, feature_only=False):
        xyz_embd = self._xyz_embed(params, points, level_mask)
        if feature_only:
            return xyz_embd
        dirs_embd = spherical_harmonics(dirs, self.sh_degree)
        inp = jnp.concatenate([xyz_embd, features, dirs_embd, *args], axis=-1)
        color = self.color_activation(self.mlp(params["mlp"], inp))
        return color, xyz_embd


@register("volume-ref-dir-radiance")
class VolumeRefDirRadiance(_RadianceBase):
    """Default radiance: SH of the reflected view dir, progressively unmasked.

    ``forward(points, features, dirs, normals)``: the direction encoded is
    ``reflect(-dirs, normals)`` and ``normals`` is appended to the MLP input
    (`models/rf/radiance.py:116-135`).
    """

    def __init__(self, config):
        super().__init__(config)
        sh_dim = self.sh_degree ** 2
        self.n_input_dims = (self.input_feature_dim + sh_dim
                             + self.xyz_feature_dim)
        self.mlp = make_mlp(self.n_input_dims, 3,
                            config.get("mlp_network_config", {}))

    def init(self, key):
        k1, k2 = jax.random.split(key)
        p = {"mlp": self.mlp.init(k2)}
        if self.spec is not None:
            p["table"] = init_hashgrid(k1, self.spec)
        return p

    def __call__(self, params, points, features, dirs, normals=None,
                 level_mask=None, sh_mask=None, feature_only=False):
        xyz_embd = self._xyz_embed(params, points, level_mask)
        if feature_only:
            return xyz_embd
        ref = reflect(-dirs, normals)
        dirs_embd = spherical_harmonics(ref, self.sh_degree)
        if sh_mask is not None:
            dirs_embd = dirs_embd * sh_mask
        inp = jnp.concatenate([xyz_embd, features, dirs_embd, normals], axis=-1)
        color = self.color_activation(self.mlp(params["mlp"], inp))
        return color, xyz_embd


@register("volume-reflection-radiance")
class VolumeReflectionRadiance(_RadianceBase):
    """RefNeRF-style: diffuse + tint * specular(IDE(reflect, roughness))."""

    def __init__(self, config):
        super().__init__(config)
        self.n_input_dims = self.input_feature_dim + self.xyz_feature_dim
        self.n_bottleneck_dims = config.get("n_bottleneck_dims",
                                            self.n_input_dims)
        self.roughness_bias = config.get("roughness_bias", 1.0)
        self.dir_otype = config.get("dir_encoding_config", {}).get("otype", "IDE")
        self.ide_degree = config.get("dir_encoding_config", {}).get("degree", 5)
        if self.dir_otype == "IDE":
            n_ml = sum(2**i + 1 for i in range(self.ide_degree))
            dir_dim = 2 * n_ml
        else:
            dir_dim = self.sh_degree ** 2
        self.dir_dim = dir_dim
        self.mlp = make_mlp(self.n_bottleneck_dims + dir_dim + 1, 3,
                            config.get("mlp_network_config", {}))

    def init(self, key):
        ks = jax.random.split(key, 6)
        d = self.n_input_dims

        def linear(k, din, dout):
            bound = 1.0 / math.sqrt(din)
            return {
                "w": jax.random.uniform(k, (din, dout), minval=-bound, maxval=bound),
                "b": jnp.zeros((dout,)),
            }

        p = {
            "mlp": self.mlp.init(ks[0]),
            "roughness": linear(ks[1], d, 1),
            "diffuse": linear(ks[2], d, 3),
            "tint": linear(ks[3], d, 3),
            "bottleneck": linear(ks[4], d, self.n_bottleneck_dims),
        }
        if self.spec is not None:
            p["table"] = init_hashgrid(ks[5], self.spec)
        return p

    def __call__(self, params, points, features, dirs, normals, *args,
                 level_mask=None, sh_mask=None, feature_only=False,
                 rng=None, training=False):
        xyz_embd = self._xyz_embed(params, points, level_mask)
        inp = jnp.concatenate([xyz_embd, features, *args], axis=-1)
        if feature_only:
            return inp

        lin = lambda p, x: x @ p["w"] + p["b"]
        dotprod = jnp.sum(-dirs * normals, axis=-1, keepdims=True)
        raw_diffuse = lin(params["diffuse"], inp)
        tint = jax.nn.sigmoid(lin(params["tint"], inp))
        roughness = jax.nn.softplus(lin(params["roughness"], inp)
                                    + self.roughness_bias)
        bottleneck = lin(params["bottleneck"], inp)
        if training and rng is not None:
            bottleneck = bottleneck + jax.random.normal(rng, bottleneck.shape)

        ref = reflect(-dirs, normals)
        if self.dir_otype == "IDE":
            dirs_embd = integrated_directional_encoding(ref, roughness,
                                                        self.ide_degree)
        else:
            dirs_embd = spherical_harmonics(ref, self.sh_degree)
        if sh_mask is not None and self.dir_otype != "IDE":
            dirs_embd = dirs_embd * sh_mask

        spec_in = jnp.concatenate([bottleneck, dirs_embd, dotprod], axis=-1)
        specular = self.color_activation(self.mlp(params["mlp"], spec_in))
        diffuse = jax.nn.sigmoid(raw_diffuse - jnp.log(3.0))
        return tint * specular + diffuse, inp
