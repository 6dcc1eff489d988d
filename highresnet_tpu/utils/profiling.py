"""Profiling & numerical-debugging hooks (SURVEY.md §5 aux subsystems).

The reference's only tooling is line_profiler in a notebook and a
permanently-enabled torch anomaly detector (src/train.py:156). Here:

- ``trace(dir)``: context manager around jax.profiler — produces a
  Perfetto/XProf trace of device execution.
- ``timed(fn)``: wall-clock timing helper that really syncs (works around
  relay backends where block_until_ready is advisory, by forcing a tiny
  readback).
- ``enable_nan_debugging()``: jax_debug_nans — the reference's
  detect_anomaly equivalent, behind a flag instead of always-on.
"""

from __future__ import annotations

import contextlib
import statistics
import time
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace", create_perfetto_link: bool = False):
    """Profile device execution: `with trace("/tmp/t"): run_steps()`."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> None:
    """True device sync: reads one scalar back (relay-safe)."""
    leaves = [x for x in jax.tree_util.tree_leaves(tree) if hasattr(x, "dtype")]
    if leaves:
        float(jnp.sum(leaves[0].ravel()[0]))


def timed(fn: Callable, *args, iters: int = 10, warmup: int = 2, **kwargs):
    """(mean_seconds, last_result) with relay-safe synchronization."""
    result = None
    for _ in range(warmup):
        result = fn(*args, **kwargs)
    sync(result)
    t0 = time.perf_counter()
    for _ in range(iters):
        result = fn(*args, **kwargs)
    sync(result)
    return (time.perf_counter() - t0) / iters, result


def enable_nan_debugging(enable: bool = True) -> None:
    """NaN tripwire for every jitted computation (costly; debug only)."""
    jax.config.update("jax_debug_nans", enable)


def enqueue_timed(
    step: Callable[[], object], k1: int, k2: int, warmups: int = 2, repeats: int = 1
) -> float:
    """Two-point enqueue timing: seconds per step, relay-safe.

    On device transports where block_until_ready is advisory and a scalar
    readback costs ~1 s RTT, naive timing is wrong in both directions.
    Protocol: enqueue k1 steps and read one scalar, enqueue k2 steps and
    read one scalar; the slope (t2 - t1) / (k2 - k1) cancels the fixed
    dispatch/readback overhead. ``step`` executes ONE enqueue and returns
    something sync-able (it may carry state through a closure); this is
    the single home of the protocol used by bench.py and the examples.

    ``repeats > 1`` measures the slope that many times and returns the
    median: a single relay-jitter event (one slow RTT landing inside one
    run_k window) corrupts one slope, and at short step times (k2-k1)*dt
    can be comparable to that jitter — the median discards the outlier
    instead of averaging it in.
    """
    out = None
    for _ in range(warmups):
        out = step()
    sync(out)

    def run_k(k: int) -> float:
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = step()
        sync(o)
        return time.perf_counter() - t0

    slopes = []
    for _ in range(max(1, repeats)):
        t1, t2 = run_k(k1), run_k(k2)
        slopes.append((t2 - t1) / (k2 - k1))
    # statistics.median averages the two middle slopes for even repeats;
    # indexing len//2 would bias toward the slower (jitter-inflated) one
    return float(statistics.median(slopes))
