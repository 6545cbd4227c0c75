"""Environment lights (emitters) with luminance-CDF importance sampling.

From-scratch equivalents of the torch_pbr emitters (the reference's
submodule is empty upstream; the API surface is reconstructed from call sites
— SURVEY.md §2.3 and `models/intrinsic_avatar.py:566-700`):

  * ``envlight-tensor`` — an H x W HDR lat-long image parameter (used for
    relighting; ``base`` is replaced by the test HDRI).
  * ``envlight-SG``     — 64 spherical Gaussians (the training default),
    rasterized to a base-resolution image for CDF sampling.
  * ``envlight-mlp`` / ``envlight-ngp`` — direction-MLP emitters.

Emitter protocol (all functional):
  ``init(key) -> params``;
  ``eval(params, dirs) -> [N,3]`` world-space radiance;
  ``update_pdf(params) -> pdf_state`` (marginal/conditional CDF tables);
  ``sample(pdf_state, key, n) -> dirs`` proportional to luminance;
  ``pdf(pdf_state, dirs) -> [N,1]`` solid-angle pdf (scale = H*W/(2*pi^2),
  `models/intrinsic_avatar.py:298-300`);
  ``sample_uniform_sphere_stratified(key, n1, n2) -> (dirs[n1*n2,3], inv_pdf)``.

Lat-long convention (y-up, documented — torch_pbr's exact mapping is not
recoverable): ``v = acos(y)/pi`` rows, ``u = (atan2(x, -z))/(2*pi) + 0.5``
columns; the optional ``xyz2lonlat_mode='blender'`` uses z-up.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from intrinsicavatar_tpu.registry import register
from intrinsicavatar_tpu.ops.math import luminance


def xyz_to_uv(dirs: jax.Array, mode: str | None = None):
    """Unit directions -> lat-long (u, v) in [0,1]."""
    if mode == "blender":
        x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
        up = z
        lon = jnp.arctan2(y, x)
    else:
        x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
        up = y
        lon = jnp.arctan2(x, -z)
    v = jnp.arccos(jnp.clip(up, -1.0, 1.0)) / jnp.pi
    u = lon / (2.0 * jnp.pi) + 0.5
    return u, v


def uv_to_xyz(u: jax.Array, v: jax.Array, mode: str | None = None):
    theta = v * jnp.pi
    lon = (u - 0.5) * 2.0 * jnp.pi
    st = jnp.sin(theta)
    if mode == "blender":
        return jnp.stack([st * jnp.cos(lon), st * jnp.sin(lon),
                          jnp.cos(theta)], -1)
    return jnp.stack([st * jnp.sin(lon), jnp.cos(theta), -st * jnp.cos(lon)],
                     -1)


def _bilinear_sample(img: jax.Array, u: jax.Array, v: jax.Array):
    """Bilinear lookup of ``img [H,W,C]`` at continuous (u, v); u wraps."""
    H, W = img.shape[:2]
    x = u * W - 0.5
    y = jnp.clip(v * H - 0.5, 0.0, H - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), W)
    x1i = jnp.mod(x0i + 1, W)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    a = img[y0i, x0i]
    b = img[y0i, x1i]
    c = img[y1i, x0i]
    d = img[y1i, x1i]
    return (a * (1 - fx) + b * fx) * (1 - fy) + (c * (1 - fx) + d * fx) * fy


class EnvPdfState(NamedTuple):
    """2D luminance CDF tables for lat-long importance sampling."""

    marginal_cdf: jax.Array   # [H] CDF over rows
    conditional_cdf: jax.Array  # [H, W] CDF over columns per row
    pdf_image: jax.Array      # [H, W] normalized probability per texel
    pdf_scale: jax.Array      # scalar H*W/(2 pi^2)


def _build_pdf(image: jax.Array) -> EnvPdfState:
    H, W = image.shape[:2]
    lum = luminance(image)[..., 0]                       # [H,W]
    v = (jnp.arange(H, dtype=image.dtype) + 0.5) / H
    sin_theta = jnp.sin(v * jnp.pi)[:, None]
    w = jnp.maximum(lum, 0.0) * sin_theta + 1e-12
    p = w / jnp.sum(w)
    row_p = jnp.sum(p, axis=1)
    marginal_cdf = jnp.cumsum(row_p)
    cond = p / row_p[:, None]
    conditional_cdf = jnp.cumsum(cond, axis=1)
    return EnvPdfState(
        marginal_cdf=marginal_cdf,
        conditional_cdf=conditional_cdf,
        pdf_image=p,
        pdf_scale=jnp.asarray(H * W / (2.0 * jnp.pi**2), image.dtype),
    )


def _sample_from_pdf(state: EnvPdfState, key: jax.Array, n: int,
                     mode: str | None):
    H, W = state.pdf_image.shape
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, (n,))
    u2 = jax.random.uniform(k2, (n,))
    row = jnp.clip(jnp.searchsorted(state.marginal_cdf, u1), 0, H - 1)
    col = jax.vmap(
        lambda r, u: jnp.clip(jnp.searchsorted(state.conditional_cdf[r], u),
                              0, W - 1)
    )(row, u2)
    # jitter inside the texel
    k3, k4 = jax.random.split(k2)
    ju = jax.random.uniform(k3, (n,))
    jv = jax.random.uniform(k4, (n,))
    u = (col + ju) / W
    v = (row + jv) / H
    return uv_to_xyz(u, v, mode)


def _pdf_of_dirs(state: EnvPdfState, dirs: jax.Array, mode: str | None):
    H, W = state.pdf_image.shape
    u, v = xyz_to_uv(dirs, mode)
    col = jnp.clip((u * W).astype(jnp.int32), 0, W - 1)
    row = jnp.clip((v * H).astype(jnp.int32), 0, H - 1)
    p = state.pdf_image[row, col]
    sin_theta = jnp.maximum(jnp.sin(v * jnp.pi), 1e-6)
    return (p * state.pdf_scale / sin_theta)[..., None]


def sample_uniform_sphere_stratified(key: jax.Array, n1: int, n2: int,
                                     dtype=jnp.float32):
    """Stratified uniform sphere directions ``[n1*n2, 3]`` and inverse pdf.

    Strata over (cos theta, phi); inverse pdf of a uniform sphere = 4*pi
    (reference call site `models/intrinsic_avatar.py:677-687`, 16 x 32).
    """
    i = jnp.arange(n1, dtype=dtype)
    j = jnp.arange(n2, dtype=dtype)
    k1, k2 = jax.random.split(key)
    ju = jax.random.uniform(k1, (n1, n2), dtype)
    jv = jax.random.uniform(k2, (n1, n2), dtype)
    ct = 1.0 - 2.0 * (i[:, None] + ju) / n1
    phi = 2.0 * jnp.pi * (j[None, :] + jv) / n2
    st = jnp.sqrt(jnp.maximum(1.0 - ct**2, 0.0))
    # (x = st cos phi, y = ct, z = st sin phi): y-up
    dirs = jnp.stack([st * jnp.cos(phi), jnp.broadcast_to(ct, st.shape),
                      st * jnp.sin(phi)], -1)
    inv_pdf = jnp.full((n1 * n2, 1), 4.0 * jnp.pi, dtype)
    return dirs.reshape(-1, 3), inv_pdf


class _EmitterBase:
    def __init__(self, config):
        self.config = config
        self.mode = config.get("xyz2lonlat_mode", None)
        ec = config.get("envlight_config", {})
        self.base_res = ec.get("base_res", 256)

    def update_pdf(self, params) -> EnvPdfState:
        return _build_pdf(self.generate_image(params))

    def sample(self, pdf_state: EnvPdfState, key, n: int):
        return _sample_from_pdf(pdf_state, key, n, self.mode)

    def pdf(self, pdf_state: EnvPdfState, dirs):
        return _pdf_of_dirs(pdf_state, dirs, self.mode)


@register("envlight-tensor")
class EnvLightTensor(_EmitterBase):
    """HDR image emitter.  ``params['base']`` is ``[H, W, 3]``; for
    relighting the checkpointed base is replaced by the evaluation HDRI
    (`models/intrinsic_avatar.py:292-305`)."""

    def __init__(self, config):
        super().__init__(config)
        ec = config.get("envlight_config", {})
        self.scale = ec.get("scale", 0.5)
        self.bias = ec.get("bias", 0.25)

    def init(self, key):
        base = jax.random.uniform(
            key, (self.base_res, self.base_res * 2, 3)) * self.scale + self.bias
        return {"base": base}

    def eval(self, params, dirs):
        u, v = xyz_to_uv(dirs, self.mode)
        return jnp.maximum(_bilinear_sample(params["base"], u, v), 0.0)

    def generate_image(self, params):
        return jnp.maximum(params["base"], 0.0)


@register("envlight-SG")
class EnvLightSG(_EmitterBase):
    """Spherical-Gaussian mixture emitter (training default,
    `configs/light/envlight_SG.yaml`: 64 lobes, 256 base res).

    ``L(d) = sum_i abs(a_i) * exp(lambda_i (d . mu_i - 1))`` with lobe axes
    initialized on a Fibonacci sphere.
    """

    def __init__(self, config):
        super().__init__(config)
        ec = config.get("envlight_config", {})
        self.num_sgs = ec.get("num_SGs", 64)

    def init(self, key):
        n = self.num_sgs
        i = np.arange(n, dtype=np.float32)
        phi = np.pi * (3.0 - np.sqrt(5.0)) * i
        y = 1.0 - 2.0 * (i + 0.5) / n
        r = np.sqrt(np.maximum(1.0 - y * y, 0.0))
        axes = np.stack([r * np.cos(phi), y, r * np.sin(phi)], -1)
        sharpness = np.ones((n, 1), np.float32) * np.log(np.expm1(10.0))
        amp = jax.random.uniform(key, (n, 3)) * 0.5 + 0.25
        return {
            "axes": jnp.asarray(axes),
            "sharpness": jnp.asarray(sharpness),  # softplus -> ~10
            "amplitude": amp,
        }

    def eval(self, params, dirs):
        mu = params["axes"] / jnp.maximum(
            jnp.linalg.norm(params["axes"], axis=-1, keepdims=True), 1e-6)
        lam = jax.nn.softplus(params["sharpness"])          # [S,1]
        amp = jnp.abs(params["amplitude"])                  # [S,3]
        cos = dirs @ mu.T                                   # [N,S]
        w = jnp.exp(lam[None, :, 0] * (cos - 1.0))          # [N,S]
        return w @ amp

    def generate_image(self, params):
        H, W = self.base_res, self.base_res * 2
        v = (jnp.arange(H) + 0.5) / H
        u = (jnp.arange(W) + 0.5) / W
        uu, vv = jnp.meshgrid(u, v)
        dirs = uv_to_xyz(uu.reshape(-1), vv.reshape(-1), self.mode)
        return self.eval(params, dirs).reshape(H, W, 3)


@register("envlight-mlp")
class EnvLightMLP(_EmitterBase):
    """Frequency-encoded direction MLP emitter."""

    def __init__(self, config):
        super().__init__(config)
        from intrinsicavatar_tpu.nets.mlp import VanillaMLP
        ec = config.get("envlight_config", {})
        self.n_freq = ec.get("n_frequencies", 4)
        self.mlp = VanillaMLP(3 * 2 * self.n_freq + 3, 3,
                              n_neurons=ec.get("n_neurons", 64),
                              n_hidden_layers=ec.get("n_hidden_layers", 2),
                              output_activation="softplus")

    def init(self, key):
        return {"mlp": self.mlp.init(key)}

    def eval(self, params, dirs):
        from intrinsicavatar_tpu.ops.encoding import frequency_encode
        enc = jnp.concatenate([dirs, frequency_encode(dirs, self.n_freq)], -1)
        return self.mlp(params["mlp"], enc)

    def generate_image(self, params):
        H, W = self.base_res, self.base_res * 2
        v = (jnp.arange(H) + 0.5) / H
        u = (jnp.arange(W) + 0.5) / W
        uu, vv = jnp.meshgrid(u, v)
        dirs = uv_to_xyz(uu.reshape(-1), vv.reshape(-1), self.mode)
        return self.eval(params, dirs).reshape(H, W, 3)


@register("envlight-ngp")
class EnvLightNGP(EnvLightMLP):
    """Direction-hash emitter: frequency MLP variant is reused — a 3D hash
    over the unit sphere adds nothing at the reference's 256-res fidelity."""
