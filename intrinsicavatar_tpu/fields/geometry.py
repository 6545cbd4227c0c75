"""Canonical SDF geometry field.

Equivalent of ``VolumeSDF`` (`models/rf/geometry.py:109-266` in
taconite/IntrinsicAvatar): progressive hash-grid encoding + 1-hidden-layer
sphere-initialized MLP; channel 0 of the MLP output is the SDF, the full
output is the geometry feature vector.  Analytic gradients come from
``jax.vjp`` (the reference uses torch autograd); the curvature proxy is the
PermutoSDF tangent-perturbation angle (`models/rf/geometry.py:173-205`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from intrinsicavatar_tpu.registry import register
from intrinsicavatar_tpu.nets.mlp import make_mlp
from intrinsicavatar_tpu.ops.hashgrid import (
    HashGridSpec, hashgrid_encode, hashgrid_encode_vjp_x, init_hashgrid,
)
from intrinsicavatar_tpu.ops.encoding import hashgrid_level_mask
from intrinsicavatar_tpu.ops.math import (safe_normalize, take_channel, cross3)


def hashgrid_spec_from_config(cfg) -> HashGridSpec:
    return HashGridSpec(
        n_levels=cfg.get("n_levels", 16),
        n_features_per_level=cfg.get("n_features_per_level", 2),
        log2_hashmap_size=cfg.get("log2_hashmap_size", 19),
        base_resolution=cfg.get("base_resolution", 16),
        per_level_scale=cfg.get("per_level_scale", 1.447269237440378),
        include_xyz=cfg.get("include_xyz", False),
        xyz_scale=cfg.get("xyz_scale", 2.0),
        xyz_offset=cfg.get("xyz_offset", -1.0),
    )


@register("volume-sdf")
class VolumeSDF:
    def __init__(self, config):
        self.config = config
        self.feature_dim = config.get("feature_dim", 13)
        enc_cfg = config.get("xyz_encoding_config", {})
        self.spec = hashgrid_spec_from_config(enc_cfg)
        self.enc_cfg = enc_cfg
        self.mlp = make_mlp(self.spec.n_output_dims, self.feature_dim,
                            config.get("mlp_network_config", {}))
        self.sdf_bias = float(config.get("sdf_bias", 0.0))
        # bbox set once from the deformer's canonical bbox
        # (`models/rf/geometry.py:61-68` prepare_bbox).
        self.center = np.zeros(3, np.float32)
        self.scale = np.ones(3, np.float32)
        self._bbox_set = False

    def prepare_bbox(self, bbox: np.ndarray):
        """``bbox`` is ``[2, 3]`` (min, max) in canonical space; first call wins."""
        if self._bbox_set:
            return
        bbox = np.asarray(bbox, np.float32)
        self.center = (bbox[0] + bbox[1]) / 2.0
        self.scale = bbox[1] - bbox[0]
        self._bbox_set = True

    def init(self, key: jax.Array):
        k1, k2 = jax.random.split(key)
        return {"table": init_hashgrid(k1, self.spec),
                "mlp": self.mlp.init(k2)}

    def level_mask(self, global_step):
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

    def _normalize(self, x):
        c = jnp.asarray(self.center)
        s = jnp.asarray(self.scale)
        return (x - c) / s + 0.5

    def features(self, params, x, level_mask=None):
        """``[N,3] -> [N, feature_dim]``; channel 0 is the SDF."""
        xn = self._normalize(x)
        enc = hashgrid_encode(params["table"], xn, self.spec, level_mask)
        out = self.mlp(params["mlp"], enc)
        if self.sdf_bias:
            bias = np.zeros(self.feature_dim, np.float32)
            bias[0] = self.sdf_bias
            out = out + jnp.asarray(bias)
        return out

    def sdf(self, params, x, level_mask=None):
        # channel extraction via one-hot dot: slice-backward pads crash the
        # TPU fusion pass (ops.math.take_channel)
        return take_channel(self.features(params, x, level_mask), 0)

    def _point_grad(self, params, x, level_mask):
        """Analytic SDF gradient wrt input points.

        ``grad_type='analytic'`` uses reverse mode (one VJP, like the
        reference's torch autograd); ``'analytic_fwd'`` uses three JVPs —
        forward mode makes the training loss's differentiation of the
        gradient *reverse-over-forward* instead of reverse-over-reverse,
        which the TPU backend handles much better (second-order
        reverse-over-reverse through the hash-grid gathers trips the XLA:TPU
        fusion pass).
        """
        mode = self.config.get("grad_type", "analytic")
        if mode == "analytic_fwd":
            # the encode's custom VJP rejects forward-mode autodiff —
            # enter the raw-encode scope so jax derives the JVP itself
            from intrinsicavatar_tpu.ops.hashgrid import raw_autodiff
            f = lambda p: self.sdf(params, p, level_mask)
            comps = []
            with raw_autodiff():
                for i in range(3):
                    tangent = jnp.zeros_like(x).at[:, i].set(1.0)
                    _, gi = jax.jvp(f, (x,), (tangent,))
                    comps.append(gi)
            return jnp.stack(comps, axis=-1)
        if mode == "analytic":
            # Fused custom-VJP composition (ops.encode_grad): one gather
            # pass produces (feat, grad) and the hand-written backward
            # keeps the training loss's grad-of-grad first-order — the
            # jax-generated second-order graph through the encode both
            # SIGILLs the XLA:TPU fusion pass (round-1 bisection) and
            # costs ~10x the forward in re-gather/scatter traffic.
            _, grad_n = self._fused_encode_grad(params, x, level_mask)
            # chain d xn/dx = 1/scale per axis
            return grad_n / jnp.asarray(self.scale)[None, :]
        return jax.grad(lambda p: jnp.sum(self.sdf(params, p, level_mask)))(x)

    def _fused_encode_grad(self, params, x, level_mask):
        """``(feat, grad_wrt_normalized_x)`` via the custom-VJP fused op."""
        from intrinsicavatar_tpu.ops.encode_grad import encode_mlp_sdfgrad
        xn = self._normalize(x)
        if level_mask is None:
            level_mask = jnp.ones(
                (self.spec.n_levels * self.spec.n_features_per_level,),
                xn.dtype)
        feat, grad_n = encode_mlp_sdfgrad(
            self.spec, self.mlp.value_and_input_grad, params["table"],
            params["mlp"], xn, level_mask)
        return feat, grad_n

    def _fd_eps(self):
        """Finite-difference step: fixed or 'progressive' (a cell of the
        finest *unlocked* hash level, `models/rf/geometry.py:246-258`).
        Progressive eps is resolved at the full-band level statically."""
        eps = self.config.get("finite_difference_eps", 1e-3)
        if eps == "progressive":
            grid_res = self.spec.base_resolution * (
                self.spec.per_level_scale ** (self.spec.n_levels - 1))
            return float(np.max(self.scale) / grid_res)
        return float(eps)

    def sdf_grad_feature(self, params, x, level_mask=None,
                         with_laplace: bool = False, rng: jax.Array | None = None):
        """Returns ``(sdf, grad, feature[, laplace])``.

        ``grad`` is the SDF gradient wrt the input points — analytic
        (reverse or forward mode) or central finite differences
        (``grad_type='finite_difference'``, 6 taps; keeps the training
        loss's backward pass first-order, which the XLA:TPU backend needs);
        when ``with_laplace``, also returns the PermutoSDF curvature proxy:
        the angle (normalized by pi) between normals at ``x`` and at a
        random tangent perturbation ``x + 1e-4 * t``.
        """
        if self.config.get("grad_type", "analytic") == "analytic":
            # fused path: ONE hash encode + ONE MLP pass produce the
            # feature vector, the SDF, and the input gradient, sharing the
            # gathered corner rows; the custom VJP (ops.encode_grad) keeps
            # the training loss's backward through this first-order
            feat, grad_n = self._fused_encode_grad(params, x, level_mask)
            if self.sdf_bias:
                bias = np.zeros(self.feature_dim, np.float32)
                bias[0] = self.sdf_bias
                feat = feat + jnp.asarray(bias)
            sdf = take_channel(feat, 0)
            grad = grad_n / jnp.asarray(self.scale)[None, :]
            if not with_laplace:
                return sdf, grad, feat
            return (sdf, grad, feat,
                    self._tangent_laplace(params, x, grad, level_mask, rng))

        feat = self.features(params, x, level_mask)
        sdf = take_channel(feat, 0)
        if self.config.get("grad_type", "analytic") == "finite_difference":
            eps = self._fd_eps()
            N = x.shape[0]
            offs = jnp.concatenate([jnp.eye(3), -jnp.eye(3)]) * eps  # [6,3]
            xd = (x[:, None, :] + offs[None]).reshape(-1, 3)
            sd = self.sdf(params, xd, level_mask).reshape(N, 6)
            grad = (sd[:, :3] - sd[:, 3:]) / (2.0 * eps)
            if with_laplace:
                lap_fd = (jnp.sum(sd, -1) - 6.0 * sdf) / eps**2
                # keep the same output contract; FD mode uses the true
                # Laplacian instead of the tangent-angle proxy
                return sdf, grad, feat, lap_fd
            return sdf, grad, feat
        grad = self._point_grad(params, x, level_mask)

        if not with_laplace:
            return sdf, grad, feat
        return (sdf, grad, feat,
                self._tangent_laplace(params, x, grad, level_mask, rng))

    def _tangent_laplace(self, params, x, grad, level_mask, rng):
        """PermutoSDF curvature proxy: normal angle at a random tangent
        perturbation (`models/rf/geometry.py:173-205`)."""
        eps = 1e-4
        if rng is None:
            rng = jax.random.PRNGKey(0)
        rand_dirs = jax.random.uniform(rng, x.shape, dtype=x.dtype)
        rand_dirs = safe_normalize(rand_dirs)
        normal = safe_normalize(grad)
        tangent = cross3(normal, rand_dirs)
        x_d = x + eps * tangent
        grad_d = self._point_grad(params, x_d, level_mask)
        dot = jnp.sum(safe_normalize(grad) * safe_normalize(grad_d), axis=-1)
        angle = jnp.arccos(jnp.clip(dot, -1.0 + 1e-6, 1.0 - 1e-6))
        return angle / jnp.pi
