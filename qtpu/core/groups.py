"""Group reshape helpers shared by every quantizer.

The reference reshapes weights to [-1, q_group_size] before computing
per-group statistics (quantization_utils.py:383-387). Here that reshape is a
pure function used by all schemes; group_size <= 0 means "one group per row"
(per-output-channel), matching the reference's q_group_size == -1 path where
the 2-D weight itself is the group matrix.
"""

from __future__ import annotations

import jax.numpy as jnp


def to_groups(w: jnp.ndarray, group_size: int) -> tuple[jnp.ndarray, tuple]:
    """Reshape a weight tensor to [n_groups, group_size].

    Returns the grouped view and the original shape (for regrouping).
    Requires the trailing dim to divide evenly when group_size > 0.
    """
    orig_shape = w.shape
    if group_size > 0:
        if orig_shape[-1] % group_size != 0:
            raise ValueError(
                f"last dim {orig_shape[-1]} not divisible by group_size {group_size}"
            )
        w = w.reshape(-1, group_size)
    else:
        if w.ndim != 2:
            w = w.reshape(orig_shape[0], -1)
    return w, orig_shape


def from_groups(w: jnp.ndarray, orig_shape: tuple) -> jnp.ndarray:
    """Inverse of to_groups."""
    return w.reshape(orig_shape)


def num_groups(shape: tuple, group_size: int) -> int:
    if group_size > 0:
        total = 1
        for d in shape:
            total *= d
        return total // group_size
    return shape[0]
