"""Profiling and timing helpers (SURVEY.md §5 tracing/profiling — absent in
the reference; here: ``jax.profiler`` traces + honest device timing)."""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def device_sync(tree) -> float:
    """True device sync: fetch a scalar reduction of the first leaf.

    On the tunneled axon TPU platform ``block_until_ready`` can return before
    remote execution finishes (measured: a 1.2 s batch "completed" in 0.6 ms);
    a scalar fetch forces real completion with negligible transfer.
    """
    leaf = jax.tree.leaves(tree)[0]
    return float(jnp.sum(leaf.astype(jnp.float32) if hasattr(leaf, "astype") else leaf))


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 1) -> Tuple[float, object]:
    """Wall-time a jitted function with proper sync; returns (seconds/iter,
    last output)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    device_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    device_sync(out)
    return (time.perf_counter() - t0) / iters, out


@contextlib.contextmanager
def trace(log_dir: str):
    """``jax.profiler`` trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
