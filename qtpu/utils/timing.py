"""Honest device timing (SURVEY §5.1): block_until_ready fencing so wall
times aren't lies under JAX async dispatch, plus jax.profiler trace capture
helpers."""

from __future__ import annotations

import contextlib
import time

import jax


class Timer:
    """Wall-clock timer that fences device work on enter/exit."""

    def __init__(self, fence=None):
        self.fence = fence
        self.elapsed = 0.0

    def __enter__(self):
        if self.fence is not None:
            jax.block_until_ready(self.fence)
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.fence is not None:
            jax.block_until_ready(self.fence)
        self.elapsed = time.perf_counter() - self._t0
        return False


def timed(fn, *args, warmup: int = 1, iters: int = 5, **kw):
    """Best-of-iters latency of fn(*args) with compile warmup and
    block_until_ready fencing. Returns (best_seconds, last_result).

    NOTE: on relay-style backends where block_until_ready does not actually
    fence (see .claude/skills/verify/SKILL.md), use timed_chain instead.
    """
    result = None
    for _ in range(max(warmup, 1)):
        result = jax.block_until_ready(fn(*args, **kw))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        result = jax.block_until_ready(fn(*args, **kw))
        best = min(best, time.perf_counter() - t0)
    return best, result


def timed_chain(step_fn, state, iters: int = 8, repeats: int = 2):
    """Per-iteration latency of a data-dependent chain, robust to lazy
    backends: state_{k+1} = step_fn(state_k), ended with a tiny host
    readback that forces the whole chain, differencing an N=1 run against
    an N=iters run to cancel the readback/dispatch overhead.

    step_fn must return a state whose leaves all depend on the previous
    state (otherwise the backend can skip work). Returns seconds/iter.
    """
    import jax.numpy as jnp

    def run(n):
        s = state
        t0 = time.perf_counter()
        for _ in range(n):
            s = step_fn(s)
        leaf = jax.tree_util.tree_leaves(s)[0]
        float(jnp.sum(leaf))  # host readback = real fence
        return time.perf_counter() - t0

    run(1)  # compile both shapes/paths
    run(iters)
    best = float("inf")
    for _ in range(repeats):
        t1 = run(1)
        tn = run(iters)
        best = min(best, (tn - t1) / (iters - 1))
    return best


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace (view in Perfetto/TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
