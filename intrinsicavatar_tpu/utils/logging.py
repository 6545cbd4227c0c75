"""Training observability: metric logging, throughput counters, profiling.

The reference has only wandb scalar/image logging (`launch.py:67-81` in
taconite/IntrinsicAvatar) and no profiler.  Here:

  * :class:`MetricLogger` — JSONL + console metrics with optional wandb
    passthrough (if the package exists in the environment);
  * :class:`Throughput` — rays/sec and samples/sec counters (the
    reference's only throughput signal is the ``num_samples`` output,
    `models/intrinsic_avatar.py:1501-1503`);
  * :func:`profile_steps` — wraps a span in the JAX profiler for
    TensorBoard-viewable traces.
"""

from __future__ import annotations

import contextlib
import json
import os
import time


class MetricLogger:
    def __init__(self, log_dir: str, use_wandb: bool = False,
                 project: str = "intrinsicavatar-tpu", config=None):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self.wandb = None
        if use_wandb:
            try:
                import wandb

                self.wandb = wandb.init(project=project, config=config,
                                        dir=log_dir)
            except Exception:
                self.wandb = None

    def log(self, step: int, scalars: dict):
        rec = {"step": int(step),
               **{k: float(v) for k, v in scalars.items()}}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self.wandb is not None:
            self.wandb.log(scalars, step=step)

    def log_image(self, step: int, name: str, image):
        """Image logging (`systems/intrinsic_avatar.py:540-542` logs the
        validation grids to wandb); silently a no-op without wandb — disk
        dumps remain the primary record."""
        if self.wandb is not None:
            import wandb

            self.wandb.log({name: wandb.Image(image)}, step=step)

    def close(self):
        self._f.close()
        if self.wandb is not None:
            self.wandb.finish()


class Throughput:
    """Sliding-window rays/sec + steps/sec counter."""

    def __init__(self, window: int = 50):
        self.window = window
        self._events = []  # (t, n_rays)

    def tick(self, n_rays: int):
        now = time.perf_counter()
        self._events.append((now, n_rays))
        if len(self._events) > self.window:
            self._events.pop(0)

    @property
    def rays_per_sec(self) -> float:
        if len(self._events) < 2:
            return 0.0
        dt = self._events[-1][0] - self._events[0][0]
        n = sum(e[1] for e in self._events[1:])
        return n / max(dt, 1e-9)

    @property
    def steps_per_sec(self) -> float:
        if len(self._events) < 2:
            return 0.0
        dt = self._events[-1][0] - self._events[0][0]
        return (len(self._events) - 1) / max(dt, 1e-9)


@contextlib.contextmanager
def profile_steps(log_dir: str):
    """JAX profiler span -> TensorBoard trace in ``log_dir``."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
