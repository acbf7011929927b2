"""Timing utilities.

Equivalent of `bm::chrono_taker` (src/bmtimer.h:40): a RAII wall-clock timer
accumulating named statistics — the reference's only profiling facility.  On
TPU, correct timing requires synchronizing the device, so the timer calls
``jax.block_until_ready`` on an optional tracked value and also exposes a
``jax.profiler`` trace hook.
"""

from __future__ import annotations

import contextlib
import time

import jax

statistics: dict[str, dict] = {}


class ChronoTaker:
    """with ChronoTaker("name"[, repeats]): ... — accumulates into the module
    ``statistics`` map like the reference's chrono_taker::statistics."""

    def __init__(self, name: str, repeats: int = 1, track=None):
        self.name = name
        self.repeats = repeats
        self.track = track

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.track is not None:
            jax.block_until_ready(self.track)
        dt = time.perf_counter() - self.t0
        st = statistics.setdefault(self.name, {"total_s": 0.0, "calls": 0,
                                               "repeats": 0})
        st["total_s"] += dt
        st["calls"] += 1
        st["repeats"] += self.repeats
        return False


def print_statistics(out=None):
    import sys
    out = out or sys.stdout
    for name, st in sorted(statistics.items()):
        per = st["total_s"] / max(st["repeats"], 1)
        print(f"{name}: {st['total_s']*1e3:.2f} ms total, "
              f"{st['calls']} calls, {per*1e6:.1f} us/op", file=out)


def reset_statistics():
    statistics.clear()


@contextlib.contextmanager
def profiler_trace(logdir: str):
    """jax.profiler wrapper for deep traces (SURVEY §5 tracing note)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
