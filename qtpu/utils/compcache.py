"""Persistent XLA compilation cache for serving cold starts.

The serving engine's program zoo (fused engine step × decode-block
buckets × admission widths) takes minutes to compile on a fresh process
(r4: 19.9 s mean cold TTFT, 62 tok/s cold vs 1,838 warm). JAX can
serialize compiled executables keyed by (HLO, compile options, backend)
to a directory; a second process start then deserializes instead of
recompiling. Nothing in qtpu enabled it before r5 — every fresh process
paid the whole zoo again.

Call enable_compilation_cache() before building any jitted program (the
serve CLI and ContinuousBatcher do). Set QTPU_COMPILE_CACHE=off to
disable, or to a path to relocate (default ~/.cache/qtpu_xla)."""

from __future__ import annotations

import os

_enabled = False


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently turn on JAX's persistent compilation cache.

    Returns the cache directory, or None when disabled/unsupported."""
    global _enabled
    env = os.environ.get("QTPU_COMPILE_CACHE", "")
    if env.lower() in ("off", "0", "none"):
        return None
    d = os.path.expanduser(cache_dir or env or "~/.cache/qtpu_xla")
    import jax

    # only persist for TPU backends by default: XLA:CPU AOT entries embed
    # host machine features and reload with SIGILL-risk warnings when the
    # detected feature set differs (observed on this image); CPU compiles
    # are cheap anyway. Set QTPU_COMPILE_CACHE=<path> to force-enable.
    if not env and jax.default_backend() != "tpu":
        return None

    try:
        jax.config.update("jax_compilation_cache_dir", d)
        # cache everything: the zoo is many small-to-medium programs and
        # the default min-compile-time threshold would skip most of them
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # older jax without these flags
        return None
    os.makedirs(d, exist_ok=True)
    _enabled = True
    return d
