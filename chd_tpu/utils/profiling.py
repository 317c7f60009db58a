"""Profiling & timing utilities.

The reference had none (SURVEY §5: only commented-out @profile decorators and
IPOPT's own timing prints). Here: a jax.profiler trace context for TensorBoard
traces, and a dispatch-safe timing harness that forces materialization (this
matters on remote-dispatch backends where block_until_ready can return before
the work lands — observed with the axon tunnel).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """TensorBoard-viewable device trace: with trace('/tmp/tb'): f()."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _sync(tree):
    """Force full materialization via a scalar host read."""
    leaves = [l for l in jax.tree.leaves(tree) if hasattr(l, "dtype")]
    if leaves:
        float(jnp.sum(jnp.stack([jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves])))


def benchmark(fn: Callable, *args, warmup: int = 1, iters: int = 10) -> Dict[str, float]:
    """Wall-time a jitted callable with compile excluded and a hard sync."""
    out = fn(*args)
    for _ in range(max(warmup - 1, 0)):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    return {"mean_s": dt, "iters_per_s": 1.0 / dt}
