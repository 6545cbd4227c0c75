"""No-silent-caps: forced budget overflow must surface a counter
(VERDICT round-2 item 5): every static budget records an ``ovf_*`` scalar
into ``out['counters']`` / the logged loss scalars."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from intrinsicavatar_tpu.train.system import IntrinsicAvatarSystem
from intrinsicavatar_tpu.utils.default_config import tiny_config
from intrinsicavatar_tpu.utils import diag

from test_train import make_batch


def test_record_and_collect_sum():
    with diag.collect() as d:
        diag.record("a", jnp.asarray(2))
        diag.record("a", jnp.asarray(3))
        diag.record("b", 1)
    assert int(d["a"]) == 5 and d["b"] == 1
    # no-op outside a collector
    diag.record("c", 1)


def test_forced_shading_overflow_is_counted():
    """A tiny query_compaction fraction guarantees more valid samples than
    budget; the dropped count must appear in the counters."""
    cfg = tiny_config()
    cfg.model.query_compaction = 0.05   # force overflow
    sys_ = IntrinsicAvatarSystem(cfg)
    state = sys_.setup(np.zeros(10), jax.random.PRNGKey(0))
    # rays >= 4096/S so the compact path engages (Mfull >= 4096)
    batch = make_batch(R=256)
    flags = sys_.flags_for_step(600)
    assert not flags.full_budget  # warmup window must be over
    state, losses = sys_.train_step(state, batch, 0.0, flags)
    assert "ovf_shading" in losses
    assert float(losses["ovf_shading"]) > 0
    # the broyden/candidate counters exist (may be zero on the easy body)
    assert "ovf_candidates" in losses


def test_budget_boost_widens_budget_and_clears_overflow():
    """Overflow-feedback escalation: fit() bumps RenderFlags.budget_boost
    when a logged ovf_shading/ovf_query is nonzero; a sufficient boost
    widens the fractional budgets enough that the counter returns to 0."""
    cfg = tiny_config()
    cfg.model.query_compaction = 0.05   # force overflow at boost 0
    sys_ = IntrinsicAvatarSystem(cfg)
    state = sys_.setup(np.zeros(10), jax.random.PRNGKey(0))
    batch = make_batch(R=256)
    # step past the importance kick-in so the sampling stage records
    # ovf_query too (via the sample_step counter fold)
    flags0 = sys_.flags_for_step(1200)
    _, losses0 = sys_.train_step(state, batch, 0.0, flags0)
    assert float(losses0["ovf_shading"]) > 0
    assert "ovf_query" in losses0
    # boost high enough to cover the full valid fraction: 0.05 + 16/16 > 1
    flags_hi = flags0._replace(budget_boost=16)
    _, losses_hi = sys_.train_step(state, batch, 0.0, flags_hi)
    assert float(losses_hi["ovf_shading"]) == 0
    assert float(losses_hi["ovf_query"]) == 0


def test_fit_bumps_boost_on_overflow():
    """Two fit() steps with an overflowing budget: the logged first step
    must raise the system's boost level for subsequent flags."""
    cfg = tiny_config()
    cfg.model.query_compaction = 0.05
    sys_ = IntrinsicAvatarSystem(cfg)
    state = sys_.setup(np.zeros(10), jax.random.PRNGKey(0))
    state = state._replace(step=jnp.asarray(600, jnp.int32))

    def it():
        while True:
            yield make_batch(R=256), 0.0

    assert sys_._budget_boost == 0
    sys_.fit(it(), state, 601, log_every=1, prefetch=False)
    assert sys_._budget_boost >= 1
    assert sys_.flags_for_step(601).budget_boost == sys_._budget_boost


def test_adaptive_budget_controller_hysteresis():
    """Bucket = ceil(1.25 * ema * 16), moves up eagerly, down only on a
    >= 2/16 difference (each move costs a recompile)."""
    cfg = tiny_config()
    cfg.model.adaptive_query_compaction = True
    sys_ = IntrinsicAvatarSystem(cfg)
    sys_._update_adaptive_budget(50, 100)      # ema=0.5 -> cand=10
    assert sys_._budget_frac_n16 == 10
    sys_._update_adaptive_budget(50, 100)      # stable
    assert sys_._budget_frac_n16 == 10
    # decaying occupancy: no move until the candidate is 2 buckets away
    for _ in range(30):
        sys_._update_adaptive_budget(10, 100)
    # converges to 4: cand = ceil(0.1*1.25*16) = 3, hysteresis holds at 4
    assert sys_._budget_frac_n16 <= 4
    # growing occupancy moves up on the next measurement
    for _ in range(8):
        sys_._update_adaptive_budget(90, 100)
    assert sys_._budget_frac_n16 >= 14
    # disabled controller never publishes
    cfg2 = tiny_config()
    sys2 = IntrinsicAvatarSystem(cfg2)
    sys2._update_adaptive_budget(50, 100)
    assert sys2._budget_frac_n16 == 0
    assert sys2.flags_for_step(600).budget_frac_n16 == 0


def test_adaptive_budget_flag_overrides_config_fraction():
    """budget_frac_n16=16 widens the 0.05 config fraction to full -> the
    forced overflow from the tiny budget disappears."""
    cfg = tiny_config()
    cfg.model.query_compaction = 0.05
    sys_ = IntrinsicAvatarSystem(cfg)
    state = sys_.setup(np.zeros(10), jax.random.PRNGKey(0))
    batch = make_batch(R=256)
    flags = sys_.flags_for_step(600)._replace(budget_frac_n16=16)
    _, losses = sys_.train_step(state, batch, 0.0, flags)
    assert float(losses["ovf_shading"]) == 0
    # telemetry the controller feeds on is present
    assert float(losses["shading_total_samples"]) > 0
    assert 0 < float(losses["shading_valid_samples"]) \
        <= float(losses["shading_total_samples"])


def test_fit_publishes_adaptive_budget():
    cfg = tiny_config()
    cfg.model.adaptive_query_compaction = True
    sys_ = IntrinsicAvatarSystem(cfg)
    state = sys_.setup(np.zeros(10), jax.random.PRNGKey(0))
    state = state._replace(step=jnp.asarray(600, jnp.int32))

    def it():
        while True:
            yield make_batch(R=256), 0.0

    sys_.fit(it(), state, 601, log_every=1, prefetch=False)
    assert sys_._budget_frac_n16 > 0
    assert sys_.flags_for_step(601).budget_frac_n16 == sys_._budget_frac_n16


def test_candidate_budget_escalates_with_boost():
    """ovf_candidate_query is boost-responsive: a tiny candidate budget
    overflows at boost 0 and clears at a high boost (threaded through the
    deformer facade into _query_geometry_compact)."""
    cfg = tiny_config()
    cfg.model.deformer.rigid_deformer.deformer_config \
        .candidate_compaction = 0.02
    sys_ = IntrinsicAvatarSystem(cfg)
    state = sys_.setup(np.zeros(10), jax.random.PRNGKey(0))
    batch = make_batch(R=256)
    flags0 = sys_.flags_for_step(600)
    _, l0 = sys_.train_step(state, batch, 0.0, flags0)
    assert float(l0["ovf_candidate_query"]) > 0
    _, lhi = sys_.train_step(state, batch, 0.0,
                             flags0._replace(budget_boost=16))
    assert float(lhi["ovf_candidate_query"]) == 0


def test_no_overflow_in_nominal_config():
    cfg = tiny_config()
    sys_ = IntrinsicAvatarSystem(cfg)
    state = sys_.setup(np.zeros(10), jax.random.PRNGKey(0))
    batch = make_batch(R=256)
    flags = sys_.flags_for_step(600)
    state, losses = sys_.train_step(state, batch, 0.0, flags)
    for k, v in losses.items():
        if k.startswith("ovf_"):
            assert float(v) == 0, f"{k} overflowed in the nominal config"


def test_full_budget_flag_in_warmup_window():
    cfg = tiny_config()
    sys_ = IntrinsicAvatarSystem(cfg)
    assert sys_.flags_for_step(0).full_budget
    assert sys_.flags_for_step(100).full_budget
    assert not sys_.flags_for_step(5000).full_budget
    assert not sys_.flags_for_step(100, training=False).full_budget
