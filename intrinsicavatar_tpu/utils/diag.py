"""Trace-time diagnostics collector: no-silent-caps observability.

Every static budget in the pipeline (shading-query compaction, secondary
budgets, Broyden phase-2 lanes, deformer candidate top-K) drops overflow
entries silently by design — the TPU-native replacement for the reference's
ragged evaluation.  This module lets the code at each budget site *record*
the overflow count as a traced scalar; the outermost render/train function
collects them into its output dict so they land in ``metrics.jsonl``.

Usage::

    with diag.collect() as counters:
        ... traced code calling diag.record("ovf_shading", n) ...
    out["counters"] = dict(counters)

``record`` is a no-op when no collector is active (e.g. unit tests calling
ops directly).  Values recorded under the same name are summed.  Inside a
``lax.map``/``lax.scan`` body a *nested* ``collect()`` must be opened and
its sums returned through the body's outputs (see
``render/pbr.compute_indirect_radiance``) — traced values cannot escape the
inner scope through Python state.
"""

from __future__ import annotations

import contextlib

_STACK: list[dict] = []


def record(name: str, value) -> None:
    """Add ``value`` (traced scalar) to the active collector, if any."""
    if _STACK:
        d = _STACK[-1]
        d[name] = d[name] + value if name in d else value


@contextlib.contextmanager
def collect():
    d: dict = {}
    _STACK.append(d)
    try:
        yield d
    finally:
        _STACK.pop()
