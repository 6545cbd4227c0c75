"""SMPL body model in pure JAX.

Semantics match the vendored smplx of the reference
(`models/deformers/smplx/body_models.py:287-371`, `lbs.py:152-230` in
taconite/IntrinsicAvatar): shape blendshapes, pose blendshapes, joint
regression, kinematic-chain rigid transforms, linear blend skinning.  The
returned per-joint transforms ``A`` (``[24,4,4]``, including the global
translation) map rest-pose points to posed space — exactly what the
Fast-SNARF deformer consumes.

Real SMPL weights load from the official ``.pkl``/``.npz``; tests and
benchmarks use :func:`make_synthetic_body_model`, a capsule-limb articulated
body with the SMPL skeleton topology (the official model is licensed and not
redistributable).
"""

from __future__ import annotations

import dataclasses
import pickle
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from intrinsicavatar_tpu.ops.math import rodrigues, transform_mat

NUM_JOINTS = 24
# SMPL kinematic tree (parent of each joint).
PARENTS = np.array(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18,
     19, 20, 21], dtype=np.int32,
)


@dataclasses.dataclass(frozen=True)
class BodyModel:
    """Static SMPL model tensors (host numpy; moved to device on use)."""

    v_template: np.ndarray    # [V, 3]
    shapedirs: np.ndarray     # [V, 3, n_betas]
    posedirs: np.ndarray      # [(J-1)*9, V*3] or [0, V*3]
    j_regressor: np.ndarray   # [24, V]
    lbs_weights: np.ndarray   # [V, 24]
    parents: np.ndarray       # [24]
    faces: np.ndarray         # [F, 3] int

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]


class SmplOutput(NamedTuple):
    vertices: jax.Array   # [B, V, 3]
    joints: jax.Array     # [B, 24, 3]
    A: jax.Array          # [B, 24, 4, 4] rest->posed per-joint transforms


def load_body_model(path: str, gender: str = "neutral") -> BodyModel:
    """Load an official SMPL model file (.pkl or .npz)."""
    if path.endswith(".npz"):
        d = dict(np.load(path, allow_pickle=True))
    else:
        with open(path, "rb") as f:
            d = pickle.load(f, encoding="latin1")

    def arr(x):
        if hasattr(x, "todense"):
            x = np.asarray(x.todense())
        return np.asarray(x, np.float32)

    shapedirs = arr(d["shapedirs"])[..., :10]
    posedirs = arr(d["posedirs"])
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T \
        if posedirs.ndim == 3 else posedirs
    return BodyModel(
        v_template=arr(d["v_template"]),
        shapedirs=shapedirs,
        posedirs=np.ascontiguousarray(posedirs, np.float32),
        j_regressor=arr(d["J_regressor"]),
        lbs_weights=arr(d["weights"]),
        parents=PARENTS,
        faces=np.asarray(d["f"], np.int64) if "f" in d else np.zeros((0, 3), np.int64),
    )


def make_synthetic_body_model(n_surface_verts: int = 2000,
                              seed: int = 0) -> BodyModel:
    """A stand-in articulated body with SMPL topology for tests/benchmarks.

    Joints follow a plausible T-pose human skeleton; surface vertices are
    sampled on capsules around each bone with inverse-distance LBS weights;
    24 marker vertices sit exactly at the joints so the joint regressor is
    exact (rows select the markers).
    """
    rng = np.random.default_rng(seed)
    # T-pose joint locations (x right, y up, z forward), meters.
    J = np.zeros((24, 3), np.float32)
    J[0] = [0.0, 0.0, 0.0]          # pelvis
    J[1] = [0.08, -0.08, 0.0]       # L hip
    J[2] = [-0.08, -0.08, 0.0]      # R hip
    J[3] = [0.0, 0.12, 0.0]         # spine1
    J[4] = [0.09, -0.48, 0.0]       # L knee
    J[5] = [-0.09, -0.48, 0.0]      # R knee
    J[6] = [0.0, 0.25, 0.0]         # spine2
    J[7] = [0.09, -0.88, 0.0]       # L ankle
    J[8] = [-0.09, -0.88, 0.0]      # R ankle
    J[9] = [0.0, 0.38, 0.0]         # spine3
    J[10] = [0.11, -0.95, 0.10]     # L foot
    J[11] = [-0.11, -0.95, 0.10]    # R foot
    J[12] = [0.0, 0.52, 0.0]        # neck
    J[13] = [0.08, 0.45, 0.0]       # L collar
    J[14] = [-0.08, 0.45, 0.0]      # R collar
    J[15] = [0.0, 0.62, 0.02]       # head
    J[16] = [0.18, 0.45, 0.0]       # L shoulder
    J[17] = [-0.18, 0.45, 0.0]      # R shoulder
    J[18] = [0.44, 0.44, 0.0]       # L elbow
    J[19] = [-0.44, 0.44, 0.0]      # R elbow
    J[20] = [0.68, 0.43, 0.0]       # L wrist
    J[21] = [-0.68, 0.43, 0.0]      # R wrist
    J[22] = [0.76, 0.43, 0.0]       # L hand
    J[23] = [-0.76, 0.43, 0.0]      # R hand

    radii = np.full(24, 0.06, np.float32)
    radii[[0, 3, 6, 9]] = 0.12      # torso
    radii[15] = 0.09                # head
    radii[[22, 23]] = 0.035

    # sample capsule points along each bone (child joint -> its parent)
    verts, weights = [], []
    bones = [(j, PARENTS[j]) for j in range(1, 24)]
    per_bone = n_surface_verts // len(bones)
    for j, p in bones:
        t = rng.uniform(0, 1, (per_bone, 1)).astype(np.float32)
        axis = J[j] - J[p]
        center = J[p] + t * axis
        r = radii[j]
        d = rng.normal(size=(per_bone, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        pts = center + d * r
        verts.append(pts)
        w = np.zeros((per_bone, 24), np.float32)
        w[:, j] = t[:, 0]
        w[:, p] = 1.0 - t[:, 0]
        weights.append(w)
    verts = np.concatenate(verts)
    weights = np.concatenate(weights)

    # joint markers (exact regressor targets) with delta weights
    marker_w = np.eye(24, dtype=np.float32)
    verts = np.concatenate([verts, J])
    weights = np.concatenate([weights, marker_w])
    V = verts.shape[0]

    j_reg = np.zeros((24, V), np.float32)
    j_reg[:, -24:] = np.eye(24, dtype=np.float32)

    shapedirs = rng.normal(scale=0.002, size=(V, 3, 10)).astype(np.float32)
    posedirs = np.zeros((23 * 9, V * 3), np.float32)
    return BodyModel(
        v_template=verts.astype(np.float32),
        shapedirs=shapedirs,
        posedirs=posedirs,
        j_regressor=j_reg,
        lbs_weights=weights,
        parents=PARENTS,
        faces=np.zeros((0, 3), np.int64),
    )


def batch_rigid_transform(rot_mats: jax.Array, joints: jax.Array,
                          parents: np.ndarray):
    """Kinematic-chain global transforms.

    Returns posed joints and the per-joint rest->posed transforms ``A``
    (reference `smplx/lbs.py` ``batch_rigid_transform``):
    ``A_j = G_j - pad(G_j @ [J_rest_j; 0])`` where ``G`` is the chained
    global transform.
    """
    rel_joints = joints - jnp.where(
        (parents >= 0)[:, None], joints[jnp.maximum(parents, 0)], 0.0
    )
    local = transform_mat(rot_mats, rel_joints)       # [24,4,4]

    # chain along the (static) kinematic tree; 24 is small so unrolled
    chains = [local[0]]
    for j in range(1, NUM_JOINTS):
        chains.append(chains[parents[j]] @ local[j])
    G = jnp.stack(chains)                             # [24,4,4]

    posed_joints = G[:, :3, 3]
    # subtract the rest-joint contribution: A = G - pad(G @ [J;0])
    corr = jnp.einsum("jab,jb->ja", G[:, :3, :3], joints)
    A = G.at[:, :3, 3].add(-corr)
    return posed_joints, A


def smpl_forward(model: BodyModel, betas: jax.Array, body_pose: jax.Array,
                 global_orient: jax.Array | None = None,
                 transl: jax.Array | None = None) -> SmplOutput:
    """Single-frame SMPL forward.  All pose inputs are axis-angle.

    Args:
      betas: ``[10]``; body_pose: ``[69]``; global_orient: ``[3]``;
      transl: ``[3]``.
    Returns vertices ``[V,3]``, joints ``[24,3]``, transforms ``A [24,4,4]``
    (transl folded into ``A[:, :3, 3]`` as in the reference).
    """
    v_template = jnp.asarray(model.v_template)
    shapedirs = jnp.asarray(model.shapedirs)
    posedirs = jnp.asarray(model.posedirs)
    j_regressor = jnp.asarray(model.j_regressor)
    lbs_weights = jnp.asarray(model.lbs_weights)

    if global_orient is None:
        global_orient = jnp.zeros(3, betas.dtype)
    if transl is None:
        transl = jnp.zeros(3, betas.dtype)

    v_shaped = v_template + jnp.einsum("vdb,b->vd", shapedirs, betas)
    joints_rest = j_regressor @ v_shaped                     # [24,3]

    full_pose = jnp.concatenate([global_orient, body_pose]).reshape(24, 3)
    rot_mats = rodrigues(full_pose)                          # [24,3,3]

    if posedirs.shape[0] > 0:
        pose_feature = (rot_mats[1:] - jnp.eye(3)).reshape(-1)
        pose_offsets = (pose_feature @ posedirs).reshape(-1, 3)
    else:
        pose_offsets = 0.0
    v_posed = v_shaped + pose_offsets

    posed_joints, A = batch_rigid_transform(rot_mats, joints_rest,
                                            model.parents)

    T = jnp.einsum("vj,jab->vab", lbs_weights, A)            # [V,4,4]
    verts = jnp.einsum("vab,vb->va", T[:, :3, :3], v_posed) + T[:, :3, 3]

    verts = verts + transl
    posed_joints = posed_joints + transl
    A = A.at[:, :3, 3].add(transl)
    return SmplOutput(vertices=verts[None], joints=posed_joints[None],
                      A=A[None])


smpl_forward_batch = jax.vmap(smpl_forward, in_axes=(None, 0, 0, 0, 0))


def get_predefined_rest_pose(cano_pose: str) -> np.ndarray:
    """Canonical rest poses (reference `snarf_deformer.py:9-21`)."""
    body_pose = np.zeros(69, np.float32)
    cano_pose = cano_pose.lower()
    if cano_pose == "da_pose":
        body_pose[2] = np.pi / 6
        body_pose[5] = -np.pi / 6
    elif cano_pose == "a_pose":
        body_pose[2] = 0.2
        body_pose[5] = -0.2
        body_pose[47] = -0.8
        body_pose[50] = 0.8
    else:
        raise ValueError(f"Unknown cano_pose: {cano_pose}")
    return body_pose


def get_bbox_from_verts(verts: np.ndarray, factor: float = 1.2) -> np.ndarray:
    """Cube bbox around vertices (reference `snarf_deformer.py:24-35`)."""
    v = np.asarray(verts).reshape(-1, 3)
    mn, mx = v.min(0), v.max(0)
    c = (mn + mx) / 2
    s = (mx - mn).max() / 2 * factor
    return np.stack([c - s, c + s]).astype(np.float32)
