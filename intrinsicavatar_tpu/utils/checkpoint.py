"""Checkpoint save/restore via orbax.

Equivalent of the reference's Lightning checkpointing
(`configs/config.yaml:154-156`, `launch.py:102-125` in
taconite/IntrinsicAvatar) including the test-mode partial restore that
drops occupancy grids and pose corrections before loading.

The checkpoint tree holds: model params (hash tables, MLPs, beta, envlight,
pose corrections), optimizer state, occupancy-grid state, step and rng.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


def save_checkpoint(path: str, state) -> None:
    """Save a TrainState (or any pytree) to ``path`` (a directory)."""
    ocp = _ocp()
    path = os.path.abspath(path)
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)


def restore_checkpoint(path: str, target=None):
    """Restore a pytree saved by :func:`save_checkpoint`.

    With ``target`` given, the result matches its structure/dtypes.
    """
    ocp = _ocp()
    path = os.path.abspath(path)
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        if target is not None:
            restored = ckptr.restore(
                path, args=ocp.args.PyTreeRestore(item=jax.device_get(target)))
        else:
            restored = ckptr.restore(path)
    return restored


def filter_for_test(state_dict: dict) -> dict:
    """Drop occupancy grids + pose corrections for test-time restore.

    Mirrors `launch.py:111-125`: at test time fresh per-frame occupancy
    grids are built in deformed space and pose corrections do not apply to
    novel poses.
    """
    out = dict(state_dict)
    out.pop("occ", None)
    params = dict(out.get("params", {}))
    params.pop("pose_correction", None)
    out["params"] = params
    return out
