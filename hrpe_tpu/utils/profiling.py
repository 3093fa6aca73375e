"""Tracing / profiling / FLOPs utilities (SURVEY.md §5.1).

The reference instruments the forward with cuda-synchronized wall timers
(full_net.py:277-457 `test_fps`) and has an inactive thop FLOPs hook
(test.py:19,207-210). TPU-native equivalents:

  * `timed`       — steady-state timing with block_until_ready
  * `trace`       — jax.profiler trace context (view in TensorBoard/XProf)
  * `flops_of`    — XLA cost analysis of a jitted function
  * `NanGuard`    — opt-in jax_debug_nans (replaces
                    torch.autograd.set_detect_anomaly, §5.2)
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


def timed(fn: Callable, *args, iters: int = 10, warmup: int = 2):
    """Returns (mean_seconds, last_output) with full device sync."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace context; inspect with TensorBoard's profile tab."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def flops_of(fn: Callable, *args) -> float:
    """Total FLOPs of the compiled fn per XLA cost analysis."""
    lowered = jax.jit(fn).lower(*args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", -1.0)) if cost else -1.0


@contextlib.contextmanager
def nan_guard():
    """Raise on NaN production anywhere in jitted code (debug runs only —
    disables some fusions)."""
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
