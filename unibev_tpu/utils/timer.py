"""Profiling utilities.

Replaces the reference's (unused) cuda-synchronized ``run_time`` decorator
(/root/reference/projects/UniBEV/unibev_plugin/models/utils/bricks.py:7-19)
with a block_until_ready-bracketed running-average timer, plus a context
manager for the jax profiler trace server (SURVEY §5 tracing/profiling).
"""

from __future__ import annotations

import contextlib
import functools
import time
from collections import defaultdict
from typing import Callable, Dict

import jax

_TIME_STATS: Dict[str, list] = defaultdict(lambda: [0.0, 0])


def run_time(name: str) -> Callable:
    """Decorator: running-average wall time of a jax-returning function."""

    def wrap(fn):
        @functools.wraps(fn)
        def inner(*args, **kwargs):
            t0 = time.perf_counter()
            out = fn(*args, **kwargs)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            s = _TIME_STATS[name]
            s[0] += dt
            s[1] += 1
            print(f"[{name}] avg {s[0] / s[1] * 1e3:.2f} ms over {s[1]} calls")
            return out
        return inner

    return wrap


def timing_stats() -> Dict[str, float]:
    return {k: v[0] / max(v[1], 1) for k, v in _TIME_STATS.items()}


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax profiler trace around a code block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_profiler_server(port: int = 9999):
    """Live trace server for `tensorboard --logdir` capture."""
    return jax.profiler.start_server(port)
