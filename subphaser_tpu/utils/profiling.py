"""Throughput counters + optional jax profiler traces.

The reference has no tracing at all (SURVEY §5); here every hot stage can be
wrapped in a Throughput meter (logged as Mbp/s or items/s) and the whole run
can emit a TensorBoard-compatible device trace via ``trace(logdir)``.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

from subphaser_tpu.utils.log import logger


@dataclass
class Throughput:
    name: str
    unit: str = "Mbp"
    total: float = 0.0
    seconds: float = 0.0
    _t0: float = field(default=0.0, repr=False)

    def start(self):
        self._t0 = time.time()
        return self

    def stop(self, amount: float):
        dt = time.time() - self._t0
        self.total += amount
        self.seconds += dt
        return dt

    @property
    def rate(self) -> float:
        return self.total / self.seconds if self.seconds > 0 else 0.0

    def log(self):
        logger.info(
            "[perf] %s: %.1f %s in %.2fs -> %.2f %s/s",
            self.name, self.total, self.unit, self.seconds, self.rate, self.unit,
        )


@contextlib.contextmanager
def timed(name: str):
    t0 = time.time()
    yield
    logger.info("[perf] %s took %.2fs", name, time.time() - t0)


@contextlib.contextmanager
def trace(logdir: str | None):
    """Device trace via jax.profiler when a logdir is given, else no-op."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("[perf] device trace written to %s", logdir)
