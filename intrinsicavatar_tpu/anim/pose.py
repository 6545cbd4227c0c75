"""Pose encoders and per-frame pose correction.

Equivalents of `models/pose/pose_encoder.py` and
`models/pose/pose_correction.py` (taconite/IntrinsicAvatar).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from intrinsicavatar_tpu.registry import register
from intrinsicavatar_tpu.anim.smpl import PARENTS


@register("dummy_pose_encoder")
class DummyPoseEncoder:
    """Empty conditioning vector (the training default,
    `configs/config.yaml:12`)."""

    n_output_dims = 0

    def __init__(self, config=None):
        self.config = config

    def init(self, key=None):
        return {}

    def __call__(self, params, rot_mats, joints):
        b = rot_mats.shape[0] if rot_mats is not None else 1
        return jnp.zeros((b, 0), jnp.float32)


@register("leap")
class HierarchicalPoseEncoder:
    """LEAP hierarchical encoder (`models/pose/pose_encoder.py:18-120`).

    A global linear over all joint rotations+positions feeds per-joint
    2-layer MLPs walked down the kinematic tree; each joint sees its rotation
    (9D), position, bone length, and its parent's feature.
    """

    def __init__(self, config):
        self.config = config
        self.num_joints = config.get("num_joints", 24)
        self.rel_joints = config.get("rel_joints", False)
        self.dim_per_joint = config.get("dim_per_joint", 6)
        self.out_dim = config.get("out_dim", -1)
        self.dim_feat = 13 + self.dim_per_joint
        self.n_output_dims = (
            self.out_dim if self.out_dim > 0
            else self.num_joints * self.dim_per_joint
        )

    def init(self, key):
        J, dpj, df = self.num_joints, self.dim_per_joint, self.dim_feat
        ks = jax.random.split(key, 2 * J + 2)

        def linear(k, din, dout):
            bound = 1.0 / math.sqrt(din)
            k1, k2 = jax.random.split(k)
            return {
                "w": jax.random.uniform(k1, (din, dout), minval=-bound,
                                        maxval=bound),
                "b": jax.random.uniform(k2, (dout,), minval=-bound,
                                        maxval=bound),
            }

        params = {
            "layer0": linear(ks[0], 12 * J, dpj),
            "joint": [
                {"l1": linear(ks[2 * j + 1], df, df),
                 "l2": linear(ks[2 * j + 2], df, dpj)}
                for j in range(J)
            ],
        }
        if self.out_dim > 0:
            params["out"] = linear(ks[-1], J * dpj, self.out_dim)
        return params

    def __call__(self, params, rot_mats, joints):
        """rot_mats ``[B, 24, 9]``, joints ``[B, 24, 3]`` -> ``[B, out]``."""
        lin = lambda p, x: x @ p["w"] + p["b"]
        B = rot_mats.shape[0]
        if self.rel_joints:
            rel = joints.at[:, 1:].add(
                -jax.lax.stop_gradient(joints[:, PARENTS[1:]]))
            joints = jax.lax.stop_gradient(rel)

        global_feat = lin(params["layer0"], jnp.concatenate(
            [rot_mats.reshape(B, -1), joints.reshape(B, -1)], -1))

        out = [None] * self.num_joints
        for j in range(self.num_joints):
            rot = rot_mats[:, j]
            jtr = joints[:, j]
            parent = int(PARENTS[j])
            if parent == -1:
                bone_l = jnp.linalg.norm(jtr, axis=-1, keepdims=True)
                feat_in = jnp.concatenate([rot, jtr, bone_l, global_feat], -1)
            else:
                bone_l = jnp.linalg.norm(
                    jtr if self.rel_joints else jtr - joints[:, parent],
                    axis=-1, keepdims=True)
                feat_in = jnp.concatenate([rot, jtr, bone_l, out[parent]], -1)
            p = params["joint"][j]
            out[j] = lin(p["l2"], jax.nn.relu(lin(p["l1"], feat_in)))

        feat = jnp.concatenate(out, -1)
        if self.out_dim > 0:
            feat = lin(params["out"], feat)
        return feat


@register("pose_correction")
class PoseCorrection:
    """Per-frame learnable SMPL-parameter residuals
    (`models/pose/pose_correction.py:8-55`): body_pose[69],
    global_orient[3], transl[3] per frame + one shared betas[10];
    zeros (and no gradient) until ``pose_correction_start_step``.
    """

    def __init__(self, config):
        self.config = config
        self.dataset_length = config.get("dataset_length", 1)
        self.start_step = config.get("pose_correction_start_step", 4000)
        self.enable = config.get("enable_pose_correction", True)

    def init(self, key=None):
        n = self.dataset_length
        return {
            "pose": jnp.zeros((n, 69)),
            "global_orient": jnp.zeros((n, 3)),
            "transl": jnp.zeros((n, 3)),
            "betas": jnp.zeros((1, 10)),
        }

    def __call__(self, params, index, global_step=0):
        """Returns correction dict for frame ``index`` (shape ``[1, ...]``).

        ``enabled`` gating is traced: corrections are zeroed (cutting the
        gradient) before the kick-in step.
        """
        index = jnp.asarray(index).reshape(-1)[:1]
        on = jnp.asarray(
            self.enable, jnp.float32
        ) * (jnp.asarray(global_step, jnp.float32) > self.start_step)
        return {
            "betas_correction": params["betas"] * on,
            "global_orient_correction": params["global_orient"][index] * on,
            "transl_correction": params["transl"][index] * on,
            "pose_correction": params["pose"][index] * on,
        }


@register("dummy_pose_correction")
class DummyPoseCorrection:
    """Zero corrections with no learnable state."""

    def __init__(self, config=None):
        self.config = config

    def init(self, key=None):
        return {}

    def __call__(self, params, index, global_step=0):
        return {
            "betas_correction": jnp.zeros((1, 10)),
            "global_orient_correction": jnp.zeros((1, 3)),
            "transl_correction": jnp.zeros((1, 3)),
            "pose_correction": jnp.zeros((1, 69)),
        }
