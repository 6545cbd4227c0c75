"""Scatterers: BRDFs and SGGX phase functions.

From-scratch equivalents of the torch_pbr scatterers (the reference's
submodule is empty upstream; the contract is reconstructed from call sites —
SURVEY.md §2.3, `models/intrinsic_avatar.py:546-930`).  Every scatterer
implements, over ``[N]`` batches in SMPL space:

  ``sample(params, key, n, wi, alpha_x, alpha_y, albedo, metallic,
           attenuation) -> wo [N,3]``
  ``pdf(params, n, wi, wo, ...) -> [N,1]``
  ``eval(params, n, wi, wo, ...) -> (diff [N,1], spec [N,3])``

where ``wi`` points toward the camera and ``wo`` toward the light, both away
from the surface.  ``diff``/``spec`` include the cosine foreshortening factor
for surface BRDFs.  The renderer composes
``Lo = kd * Li * diff + ks * Li * spec`` with
``kd = (1-m) * albedo, ks = 1`` (surface, 1-channel metallic) or
``kd = albedo, ks = m`` (volume, 3-channel specular albedo)
(`models/intrinsic_avatar.py:636-645`).

The training default is ``brdf-multi-lobe``: Lambertian diffuse + GGX
specular with Fresnel-Schlick (F0 = mix(0.04, albedo, metallic)).
``phase-*-sggx`` variants implement the SGGX microflake phase functions of
Heitz et al. 2015 specialized to a normal-aligned fiber-free distribution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from intrinsicavatar_tpu.registry import register
from intrinsicavatar_tpu.ops.math import (dot, reflect, safe_normalize, vec3_components)

EPS = 1e-7


def _onb(n: jax.Array):
    """Orthonormal basis (t, b) around unit normals n (Frisvad).

    Components via one-hot dots: n is differentiated (predicted normals)
    and slice-backward pads crash the TPU fusion pass."""
    nx, ny, nz = (c[..., None] for c in vec3_components(n))
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    t = jnp.concatenate([1.0 + sign * nx**2 * a, sign * b, -sign * nx], -1)
    bt = jnp.concatenate([b, sign + ny**2 * a, -ny], -1)
    return t, bt


def _to_world(n, local):
    t, b = _onb(n)
    lx, ly, lz = (c[..., None] for c in vec3_components(local))
    return lx * t + ly * b + lz * n


def _cosine_sample(key, n):
    u1, u2 = jnp.split(jax.random.uniform(key, (*n.shape[:-1], 2)), 2, -1)
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    local = jnp.concatenate(
        [r * jnp.cos(phi), r * jnp.sin(phi),
         jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))], -1)
    return _to_world(n, local)


def _ggx_d(n_dot_h, alpha):
    a2 = alpha * alpha
    d = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(jnp.pi * d * d, EPS)


def _smith_g1(n_dot_v, alpha):
    a2 = alpha * alpha
    return 2.0 * n_dot_v / jnp.maximum(
        n_dot_v + jnp.sqrt(a2 + (1.0 - a2) * n_dot_v * n_dot_v), EPS)


def _ggx_sample_h(key, n, alpha):
    u1, u2 = jnp.split(jax.random.uniform(key, (*n.shape[:-1], 2)), 2, -1)
    a2 = alpha[..., None] ** 2
    ct = jnp.sqrt(jnp.clip((1.0 - u1) / (1.0 + (a2 - 1.0) * u1), 0.0, 1.0))
    st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
    phi = 2.0 * jnp.pi * u2
    local = jnp.concatenate([st * jnp.cos(phi), st * jnp.sin(phi), ct], -1)
    return _to_world(n, local)


def _fresnel_schlick(cos, f0):
    return f0 + (1.0 - f0) * jnp.power(jnp.clip(1.0 - cos, 0.0, 1.0), 5.0)


def _f0(albedo, metallic):
    if metallic.shape[-1] == 3:
        return metallic  # volume mode: specular albedo directly
    return 0.04 * (1.0 - metallic) + albedo * metallic


@register("brdf-lambertian")
class Lambertian:
    def __init__(self, config=None):
        self.config = config

    def init(self, key=None):
        return {}

    def sample(self, params, key, n, wi, alpha_x, alpha_y, albedo, metallic,
               attenuation):
        return _cosine_sample(key, n)

    def pdf(self, params, n, wi, wo, alpha_x, alpha_y, albedo, metallic,
            attenuation):
        return jnp.clip(dot(n, wo), 0.0) / jnp.pi

    def eval(self, params, n, wi, wo, alpha_x, alpha_y, albedo, metallic,
             attenuation):
        cos = jnp.clip(dot(n, wo), 0.0)
        diff = cos / jnp.pi
        return diff, jnp.zeros((*wo.shape[:-1], 3), wo.dtype)


@register("brdf-ggx")
class GGX:
    def __init__(self, config=None):
        self.config = config

    def init(self, key=None):
        return {}

    def sample(self, params, key, n, wi, alpha_x, alpha_y, albedo, metallic,
               attenuation):
        h = _ggx_sample_h(key, n, alpha_x)
        return reflect(wi, h)

    def pdf(self, params, n, wi, wo, alpha_x, alpha_y, albedo, metallic,
            attenuation):
        h = safe_normalize(wi + wo)
        n_dot_h = jnp.clip(dot(n, h), 0.0)
        pdf_h = _ggx_d(n_dot_h, alpha_x[..., None]) * n_dot_h
        return pdf_h / jnp.maximum(4.0 * jnp.abs(dot(wo, h)), EPS)

    def eval(self, params, n, wi, wo, alpha_x, alpha_y, albedo, metallic,
             attenuation):
        h = safe_normalize(wi + wo)
        n_dot_i = jnp.clip(dot(n, wi), 0.0)
        n_dot_o = jnp.clip(dot(n, wo), 0.0)
        n_dot_h = jnp.clip(dot(n, h), 0.0)
        alpha = alpha_x[..., None]
        D = _ggx_d(n_dot_h, alpha)
        G = _smith_g1(jnp.maximum(n_dot_i, EPS), alpha) * _smith_g1(
            jnp.maximum(n_dot_o, EPS), alpha)
        F = _fresnel_schlick(jnp.clip(dot(h, wo), 0.0), _f0(albedo, metallic))
        # includes cosine foreshortening: D G F / (4 n.wi n.wo) * n.wo
        spec = D * G * F / jnp.maximum(4.0 * n_dot_i, EPS)
        facing = ((n_dot_i > 0) & (n_dot_o > 0)).astype(wo.dtype)
        return jnp.zeros_like(n_dot_o), spec * facing


@register("brdf-mirror")
class Mirror:
    """Perfect specular reflection (delta lobe)."""

    def __init__(self, config=None):
        self.config = config

    def init(self, key=None):
        return {}

    def sample(self, params, key, n, wi, alpha_x, alpha_y, albedo, metallic,
               attenuation):
        return reflect(wi, n)

    def pdf(self, params, n, wi, wo, alpha_x, alpha_y, albedo, metallic,
            attenuation):
        r = reflect(wi, n)
        aligned = (jnp.sum(r * wo, -1, keepdims=True) > 1.0 - 1e-5)
        return aligned.astype(wo.dtype)

    def eval(self, params, n, wi, wo, alpha_x, alpha_y, albedo, metallic,
             attenuation):
        r = reflect(wi, n)
        aligned = (jnp.sum(r * wo, -1, keepdims=True) > 1.0 - 1e-5)
        F = _fresnel_schlick(jnp.clip(dot(n, wo), 0.0), _f0(albedo, metallic))
        return jnp.zeros_like(aligned, dtype=wo.dtype), \
            F * aligned.astype(wo.dtype)


@register("brdf-multi-lobe")
class MultiLobe:
    """Lambertian + GGX blend — the training default
    (`configs/scatterer/brdf-multi-lobe.yaml`).

    Sampling picks the diffuse or specular lobe with probability 1/2;
    the pdf is the matching mixture.
    """

    def __init__(self, config=None):
        self.config = config
        self._ggx = GGX(config)
        self._lam = Lambertian(config)

    def init(self, key=None):
        return {}

    def sample(self, params, key, n, wi, alpha_x, alpha_y, albedo, metallic,
               attenuation):
        k1, k2, k3 = jax.random.split(key, 3)
        wo_d = _cosine_sample(k1, n)
        wo_s = reflect(wi, _ggx_sample_h(k2, n, alpha_x))
        pick_spec = jax.random.uniform(k3, (*n.shape[:-1], 1)) < 0.5
        return jnp.where(pick_spec, wo_s, wo_d)

    def pdf(self, params, n, wi, wo, alpha_x, alpha_y, albedo, metallic,
            attenuation):
        p_d = self._lam.pdf(params, n, wi, wo, alpha_x, alpha_y, albedo,
                            metallic, attenuation)
        p_s = self._ggx.pdf(params, n, wi, wo, alpha_x, alpha_y, albedo,
                            metallic, attenuation)
        return 0.5 * (p_d + p_s)

    def eval(self, params, n, wi, wo, alpha_x, alpha_y, albedo, metallic,
             attenuation):
        diff, _ = self._lam.eval(params, n, wi, wo, alpha_x, alpha_y, albedo,
                                 metallic, attenuation)
        _, spec = self._ggx.eval(params, n, wi, wo, alpha_x, alpha_y, albedo,
                                 metallic, attenuation)
        return diff, spec


# ---------------------------------------------------------------------------
# SGGX microflake phase functions (volumetric scattering)
# ---------------------------------------------------------------------------

def _sggx_sigma(wm, n, alpha):
    """Projected area of a surface-like SGGX distribution S = diag-ish with
    normal-aligned axis: sigma(w) = sqrt(w^T S w), S = alpha^2 (I - n n^T) +
    n n^T scaled; isotropic in the tangent plane."""
    c = dot(wm, n)
    a2 = (alpha * alpha)[..., None]
    return jnp.sqrt(jnp.clip(c * c + a2 * (1.0 - c * c), EPS, None))


def _sggx_d(wm, n, alpha):
    """SGGX NDF of the normal-aligned (surface-like) distribution.

    For S = alpha^2 (I - n n^T) + n n^T the SGGX NDF reduces to the GGX NDF
    about n (Heitz et al. 2015, Eq. 10)."""
    c = jnp.abs(dot(wm, n))
    return _ggx_d(c, alpha[..., None])


@register("phase-specular-sggx")
class SpecularSGGX:
    """Specular SGGX microflake phase function (Heitz et al. 2015):
    mirror reflection off a microflake with normal ~ visible NDF."""

    def __init__(self, config=None):
        self.config = config

    def init(self, key=None):
        return {}

    def sample(self, params, key, n, wi, alpha_x, alpha_y, albedo, metallic,
               attenuation):
        h = _ggx_sample_h(key, n, alpha_x)
        return reflect(wi, h)

    def pdf(self, params, n, wi, wo, alpha_x, alpha_y, albedo, metallic,
            attenuation):
        h = safe_normalize(wi + wo)
        D = _sggx_d(h, n, alpha_x)
        sigma_i = _sggx_sigma(wi, n, alpha_x)
        return D / jnp.maximum(4.0 * sigma_i, EPS)

    def eval(self, params, n, wi, wo, alpha_x, alpha_y, albedo, metallic,
             attenuation):
        p = self.pdf(params, n, wi, wo, alpha_x, alpha_y, albedo, metallic,
                     attenuation)
        F = _fresnel_schlick(jnp.clip(dot(safe_normalize(wi + wo), wo), 0.0),
                             _f0(albedo, metallic))
        return jnp.zeros_like(p), p * F


@register("phase-diffuse-sggx")
class DiffuseSGGX:
    """Diffuse SGGX: cosine lobe around a sampled microflake normal."""

    def __init__(self, config=None):
        self.config = config

    def init(self, key=None):
        return {}

    def sample(self, params, key, n, wi, alpha_x, alpha_y, albedo, metallic,
               attenuation):
        k1, k2 = jax.random.split(key)
        h = _ggx_sample_h(k1, n, alpha_x)
        return _cosine_sample(k2, h)

    def pdf(self, params, n, wi, wo, alpha_x, alpha_y, albedo, metallic,
            attenuation):
        # cosine about the mean normal is a good proxy for the marginal pdf
        return jnp.clip(dot(n, wo), 0.0) / jnp.pi + EPS

    def eval(self, params, n, wi, wo, alpha_x, alpha_y, albedo, metallic,
             attenuation):
        diff = jnp.clip(dot(n, wo), 0.0) / jnp.pi
        return diff, jnp.zeros((*wo.shape[:-1], 3), wo.dtype)


@register("phase-multi-lobe")
class MultiLobeSGGX:
    """Diffuse + specular SGGX mixture (volumetric analogue of multi-lobe)."""

    def __init__(self, config=None):
        self.config = config
        self._spec = SpecularSGGX(config)
        self._diff = DiffuseSGGX(config)

    def init(self, key=None):
        return {}

    def sample(self, params, key, n, wi, alpha_x, alpha_y, albedo, metallic,
               attenuation):
        k1, k2, k3 = jax.random.split(key, 3)
        wo_d = self._diff.sample(params, k1, n, wi, alpha_x, alpha_y, albedo,
                                 metallic, attenuation)
        wo_s = self._spec.sample(params, k2, n, wi, alpha_x, alpha_y, albedo,
                                 metallic, attenuation)
        pick = jax.random.uniform(k3, (*n.shape[:-1], 1)) < 0.5
        return jnp.where(pick, wo_s, wo_d)

    def pdf(self, params, n, wi, wo, alpha_x, alpha_y, albedo, metallic,
            attenuation):
        return 0.5 * (
            self._diff.pdf(params, n, wi, wo, alpha_x, alpha_y, albedo,
                           metallic, attenuation)
            + self._spec.pdf(params, n, wi, wo, alpha_x, alpha_y, albedo,
                             metallic, attenuation))

    def eval(self, params, n, wi, wo, alpha_x, alpha_y, albedo, metallic,
             attenuation):
        diff, _ = self._diff.eval(params, n, wi, wo, alpha_x, alpha_y, albedo,
                                  metallic, attenuation)
        _, spec = self._spec.eval(params, n, wi, wo, alpha_x, alpha_y, albedo,
                                  metallic, attenuation)
        return diff, spec
