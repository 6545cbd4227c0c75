"""Reduced-precision (bf16) compute scope: numerics vs the f32 path.

The scope is the TPU analog of tcnn's fp16 fused encode+MLP
(`models/network_utils.py:58-100` in taconite/IntrinsicAvatar): master
params stay f32, gathers/matmuls inside a ``precision.scope(bfloat16)``
run in bf16 with f32 accumulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intrinsicavatar_tpu.ops import precision
from intrinsicavatar_tpu.ops.hashgrid import (
    HashGridSpec, hashgrid_encode_raw,
)
from intrinsicavatar_tpu.nets.mlp import VanillaMLP


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_scope_stack():
    assert precision.current_dtype() is None
    with precision.scope(jnp.bfloat16):
        assert precision.current_dtype() == jnp.dtype(jnp.bfloat16)
        with precision.scope(None):
            assert precision.current_dtype() is None
        assert precision.current_dtype() == jnp.dtype(jnp.bfloat16)
    assert precision.current_dtype() is None


def test_encode_bf16_close_to_f32(rng):
    spec = HashGridSpec(n_levels=8, log2_hashmap_size=12)
    # trained-scale table (init is 1e-4; bf16 matters at realistic scale)
    table = jnp.asarray(rng.normal(0.0, 0.1, (8, 4096, 2)), jnp.float32)
    x = jnp.asarray(rng.uniform(0.05, 0.95, (512, 3)), jnp.float32)
    ref = hashgrid_encode_raw(table, x, spec)
    with precision.scope(jnp.bfloat16):
        lo = hashgrid_encode_raw(table, x, spec)
    assert lo.dtype == jnp.float32          # promotes back after the gather
    # bf16 has ~8 mantissa bits: features of scale 0.1 -> abs err ~4e-4
    np.testing.assert_allclose(np.asarray(lo), np.asarray(ref), atol=3e-3)
    # outside the scope: bit-identical to the reference path
    again = hashgrid_encode_raw(table, x, spec)
    np.testing.assert_array_equal(np.asarray(again), np.asarray(ref))


def test_mlp_bf16_close_to_f32(rng):
    mlp = VanillaMLP(16, 4, n_neurons=64, n_hidden_layers=2)
    params = mlp.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.normal(0.0, 0.5, (256, 16)), jnp.float32)
    ref = mlp(params, x)
    with precision.scope(jnp.bfloat16):
        lo = mlp(params, x)
    assert lo.dtype == jnp.float32
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert float(jnp.max(jnp.abs(lo - ref))) / scale < 2e-2


def test_secondary_fine_bf16_matches_f32_phys_render():
    """`secondary_fine_dtype: bfloat16` extends the scope to the secondary
    shading pass (it sits under stop_gradient — forward compute only).
    The phys losses must stay finite and close to the f32 path."""
    from intrinsicavatar_tpu.train.system import IntrinsicAvatarSystem
    from intrinsicavatar_tpu.utils.default_config import tiny_config
    from test_train import make_batch

    losses = {}
    for fd in ("float32", "bfloat16"):
        cfg = tiny_config()
        cfg.model.phys_kick_in_step = 0
        cfg.model.secondary_fine_dtype = fd
        sys_ = IntrinsicAvatarSystem(cfg)
        state = sys_.setup(np.zeros(10), jax.random.PRNGKey(0))
        batch = make_batch(R=64)
        flags = sys_.flags_for_step(600)
        assert flags.enable_phys
        _, ls = sys_.train_step(state, batch, 0.0, flags)
        losses[fd] = {k: float(v) for k, v in ls.items() if np.ndim(v) == 0}
    a, b = losses["float32"], losses["bfloat16"]
    assert np.isfinite(b["rgb_phys_l1"]) and np.isfinite(b["total"])
    # indirect radiance sits behind a transmittance factor; bf16 there
    # moves the phys loss well under the MC noise floor
    assert abs(a["rgb_phys_l1"] - b["rgb_phys_l1"]) \
        <= 0.05 * max(abs(a["rgb_phys_l1"]), 1e-3)


def test_mlp_weight_norm_bf16(rng):
    mlp = VanillaMLP(8, 1, n_neurons=32, n_hidden_layers=1,
                     sphere_init=True, weight_norm=True)
    params = mlp.init(jax.random.PRNGKey(1))
    x = jnp.asarray(rng.uniform(-0.5, 0.5, (128, 8)), jnp.float32)
    ref = mlp(params, x)
    with precision.scope(jnp.bfloat16):
        lo = mlp(params, x)
    assert float(jnp.max(jnp.abs(lo - ref))) < 5e-3


def test_primary_bf16_val_guard():
    """``primary_dtype: bfloat16`` (the default) must track the f32
    training trajectory: same-seed 25-step tiny runs both descend and end
    with rgb_l1 within 15% of each other — the guard for running the
    primary shading pass (gathers + MLP matmuls, f32 accumulation) in
    reduced precision."""
    from intrinsicavatar_tpu.train.system import IntrinsicAvatarSystem
    from intrinsicavatar_tpu.utils.default_config import tiny_config
    from test_train import make_batch

    hist = {}
    for pd in ("float32", "bfloat16"):
        cfg = tiny_config()
        cfg.model.primary_dtype = pd
        sys_ = IntrinsicAvatarSystem(cfg)
        state = sys_.setup(np.zeros(10), jax.random.PRNGKey(0))
        batch = make_batch()

        def it():
            while True:
                yield batch, 0.0

        _, h = sys_.fit(it(), state, max_steps=25, log_every=1,
                        prefetch=False)
        hist[pd] = h
    first_b = float(hist["bfloat16"][0][1]["rgb_l1"])
    a = float(hist["float32"][-1][1]["rgb_l1"])
    b = float(hist["bfloat16"][-1][1]["rgb_l1"])
    assert np.isfinite(b)
    assert b < first_b, "bf16 run did not descend"
    assert abs(a - b) <= 0.15 * max(a, 1e-3), (a, b)
