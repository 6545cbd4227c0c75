"""Non-rigid (pose-conditioned) canonical displacement field.

Equivalent of `models/deformers/non_rigid_deformer.py:25-120`
(taconite/IntrinsicAvatar): a frequency-encoded conditional MLP predicting a
residual displacement in canonical space; the inverse Jacobian (via autodiff)
chains into the gradient mapping.  Disabled (identity) before
``kick_in_step`` and by default (`configs/deformer/snarf_deformer.yaml:13`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from intrinsicavatar_tpu.registry import register
from intrinsicavatar_tpu.nets.mlp import make_mlp
from intrinsicavatar_tpu.ops.encoding import frequency_encode, frequency_mask


@register("dummy_non_rigid_deformer")
class DummyNonRigidDeformer:
    n_output_dims = 3

    def __init__(self, config=None):
        self.config = config

    def init(self, key=None):
        return {}

    def prepare_bbox(self, bbox):
        pass

    def __call__(self, params, points, cond=None, with_jac=False,
                 global_step=0):
        # None Jacobian: callers skip the (identity) 3x3 chain entirely
        return points, None


@register("non-rigid-deformer")
class NonRigidDeformer:
    def __init__(self, config):
        self.config = config
        enc = config.get("xyz_encoding_config", {}) or {}
        self.n_frequencies = enc.get("n_frequencies", 4)
        self.n_masking_step = enc.get("n_masking_step", 0)
        self.enc_start_step = enc.get("start_step", 0)
        self.kick_in_step = config.get("kick_in_step", 6000)
        in_dim = 3 * 2 * self.n_frequencies
        mlp_cfg = config.get("mlp_network_config", {})
        self.mlp = make_mlp(in_dim, 3, mlp_cfg)
        self.center = np.zeros(3, np.float32)
        self.scale = np.ones(3, np.float32)
        self._bbox_set = False

    def prepare_bbox(self, bbox):
        if self._bbox_set:
            return
        bbox = np.asarray(bbox, np.float32)
        self.center = (bbox[0] + bbox[1]) / 2.0
        self.scale = bbox[1] - bbox[0]
        self._bbox_set = True

    def init(self, key):
        return {"mlp": self.mlp.init(key)}

    def _displace(self, params, points, cond, mask):
        pn = (points - jnp.asarray(self.center)) / jnp.asarray(self.scale) + 0.5
        enc = frequency_encode(pn, self.n_frequencies, mask)
        if cond is not None and cond.shape[-1] > 0:
            disp = self.mlp(params["mlp"], enc, cond)
        else:
            disp = self.mlp(params["mlp"], enc)
        return disp

    def __call__(self, params, points, cond=None, with_jac=False,
                 global_step=0):
        """Returns ``(deformed_points, J_inv [N,3,3])``.

        The enable gate is traced (multiplied in) so the jit signature stays
        stable across the kick-in step.
        """
        mask = frequency_mask(global_step, self.n_frequencies,
                              self.n_masking_step, self.enc_start_step)
        on = (jnp.asarray(global_step, jnp.float32) > self.kick_in_step
              ).astype(points.dtype)

        def f(p):
            return p + on * self._displace(params, p[None], cond, mask)[0]

        if with_jac:
            out, jac = jax.vmap(lambda p: (f(p), jax.jacfwd(f)(p)))(points)
            j_inv = jnp.linalg.inv(jax.lax.stop_gradient(jac))
        else:
            out = points + on * self._displace(params, points, cond, mask)
            j_inv = None
        return out, j_inv
