"""Debug-mode numerical safety (SURVEY §5.2).

The reference's in-kernel NaN asserts (quantization_utils.py:398-407,
pot_apot_quantizer.py:109) cannot live inside jitted JAX code; the
equivalents here are:
  - assert_all_finite: host-side pytree check (use at stage boundaries)
  - checked(fn): checkify-wrapped jittable fn that raises on NaN/Inf from
    inside the traced computation
  - debug_nans(): context manager flipping jax_debug_nans for a scope
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def assert_all_finite(tree, name: str = "tree") -> None:
    """Raise AssertionError naming the first non-finite leaf."""
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves_with_paths:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                raise AssertionError(
                    f"non-finite values in {name}{jax.tree_util.keystr(path)}"
                )


def checked(fn):
    """Wrap a jittable fn so NaN/Inf inside the computation raise
    checkify errors when called (debug builds/tests)."""
    checked_fn = checkify.checkify(fn, errors=checkify.float_checks)

    def wrapper(*args, **kw):
        err, out = checked_fn(*args, **kw)
        err.throw()
        return out

    return wrapper


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Scope-local jax_debug_nans toggle."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
