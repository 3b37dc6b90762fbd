"""Runtime profiling buckets.

Preserves the reference's dt/pt/pn bucket API (`betapose_evaluate.py:132-136`,
`fn.py:222-227` getTime) and adds jax.profiler trace capture (SURVEY.md 5.1).
"""

from __future__ import annotations

import contextlib
import time


def get_time():
    """Wall-clock (the reference's getTime, fn.py:222-227, sans CUDA sync —
    use block_until_ready on outputs to measure device work)."""
    return time.time()


class RuntimeProfile:
    """Named wall-clock buckets: dt (detection), pt (pose), pn (post)."""

    def __init__(self, names=("dt", "pt", "pn")):
        self.buckets = {n: [] for n in names}

    @contextlib.contextmanager
    def bucket(self, name):
        if name not in self.buckets:
            self.buckets[name] = []
        t0 = time.time()
        yield
        self.buckets[name].append(time.time() - t0)

    def mean(self, name):
        b = self.buckets.get(name, [])
        return sum(b) / len(b) if b else 0.0

    def summary(self):
        return " | ".join(
            f"{n}: {self.mean(n):.4f}" for n in self.buckets if self.buckets[n])


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class DataLogger:
    """Running-average meter (reference `KPD/src/utils/eval.py:9-26`)."""

    def __init__(self):
        self.clear()

    def clear(self):
        self.value = 0.0
        self.sum = 0.0
        self.cnt = 0
        self.avg = 0.0

    def update(self, value, n=1):
        self.value = value
        self.sum += value * n
        self.cnt += n
        self.avg = self.sum / self.cnt
