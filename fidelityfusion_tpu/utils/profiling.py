"""Profiling / timing hooks.

TPU-native re-design of the reference's ad-hoc wall-clock timing
(`GaussianProcess/gp_basic.py:179-186`, the `time` CSV column at
`Experiments/GAR_Non_Aligned/exp_non_aligned.py:89`, and per-BO-iteration
`operation_time`, `MF_BO_discrete.py:62`): a stopwatch registry feeding
the same CSV columns, plus `jax.profiler` trace capture and the
chain-difference device timer used by bench.py (naive per-call timing over
a tunneled device is wildly pessimistic — see `bench.py` docstring).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Callable, Dict


class Stopwatch:
    """Accumulating named timers -> the reference's time columns."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def measure(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] += time.time() - t0
            self.counts[name] += 1

    def rate(self, name: str) -> float:
        """Events per second for a named timer."""
        return self.counts[name] / self.totals[name] if self.totals[name] else 0.0

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": self.totals[k], "count": self.counts[k],
                "mean_s": self.totals[k] / max(self.counts[k], 1)}
            for k in self.totals
        }


@contextlib.contextmanager
def profiler_trace(logdir: str):
    """Capture a `jax.profiler` trace (view with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_time(fn_factory: Callable[[int], Callable], L1: int = 2, L2: int = 12,
                reps: int = 3) -> float:
    """Per-op seconds via the chain-difference method: ``fn_factory(L)``
    returns a jitted nullary function executing the op L times inside one
    call with a scalar output."""
    f1, f2 = fn_factory(L1), fn_factory(L2)
    float(f1())
    float(f2())

    def t(f):
        t0 = time.time()
        for _ in range(reps):
            float(f())
        return (time.time() - t0) / reps

    return (t(f2) - t(f1)) / (L2 - L1)
