"""Round-to-nearest uniform quantization (reference C8).

`pseudo_quantize` reproduces the asymmetric per-group quantize→dequantize of
the reference exactly (quantization_utils.py:362-413): per-group min/max,
scale=(max−min).clamp(1e-5)/(2^b−1), zero=clamp(round(−min/scale),0,2^b−1),
round-clamp-dequant, original shape and dtype preserved.

`symmetric_fake_quantize` reproduces the reference GPTQ fallback
(gptq_quantizer.py:94-99): scale=absmax/(2^b−1), clamp(round(w/s),
−2^b, 2^b−1) — note the reference's asymmetric clamp floor of −max_int−1,
kept for parity.

Both are pure jittable functions of the tensor. Integer extraction for real
packed storage lives in qtpu.core.packing.quantize_pack.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("n_bit", "q_group_size"))
def pseudo_quantize(
    w: jnp.ndarray, n_bit: int = 4, q_group_size: int = -1
) -> jnp.ndarray:
    """Asymmetric per-group fake quantization, reference-parity."""
    orig_shape = w.shape
    orig_dtype = w.dtype
    if q_group_size > 0:
        if orig_shape[-1] % q_group_size != 0:
            raise ValueError(
                f"last dim {orig_shape[-1]} % group {q_group_size} != 0"
            )
        w = w.reshape(-1, q_group_size)
    if w.ndim != 2:
        raise ValueError("expected 2-D tensor when q_group_size <= 0")
    w = w.astype(jnp.float32)
    max_val = jnp.max(w, axis=1, keepdims=True)
    min_val = jnp.min(w, axis=1, keepdims=True)
    max_int = 2**n_bit - 1
    scales = jnp.clip(max_val - min_val, 1e-5, None) / max_int
    zeros = jnp.clip(-jnp.round(min_val / scales), 0, max_int)
    w_q = jnp.clip(jnp.round(w / scales) + zeros, 0, max_int)
    w_dq = (w_q - zeros) * scales
    return w_dq.reshape(orig_shape).astype(orig_dtype)


@partial(jax.jit, static_argnames=("n_bit", "q_group_size"))
def symmetric_fake_quantize(
    w: jnp.ndarray, n_bit: int = 4, q_group_size: int = -1
) -> jnp.ndarray:
    """Symmetric per-group fake quantization (reference GPTQ-fallback
    parity, gptq_quantizer.py:78-108)."""
    orig_shape = w.shape
    orig_dtype = w.dtype
    if q_group_size > 0:
        if orig_shape[-1] % q_group_size != 0:
            raise ValueError(
                f"last dim {orig_shape[-1]} % group {q_group_size} != 0"
            )
        w = w.reshape(-1, q_group_size)
    w = w.astype(jnp.float32)
    max_int = 2**n_bit - 1
    absmax = jnp.max(jnp.abs(w), axis=1, keepdims=True)
    scales = jnp.clip(absmax / max_int, 1e-5, None)
    w_q = jnp.clip(jnp.round(w / scales), -max_int - 1, max_int)
    return (w_q * scales).reshape(orig_shape).astype(orig_dtype)
