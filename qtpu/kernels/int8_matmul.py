"""W8A8 dynamic-activation int8 matmul (SmoothQuant-style serving).

The reference's SmoothQuant only pseudo-quantizes weights
(smooth_quant_quantizer.py:307-320) — activations stay fp and the smoothing
pre-hook just re-scales them. Real W8A8 serving quantizes the (smoothed)
activation per token to int8 and runs an int8×int8→int32 matmul on the
MXU, with per-token × per-channel rescale on the output:

  x_q = round(x / sx),  sx = max|x| per token / 127         (dynamic)
  w_q, sw, zw : per-group asymmetric int8 weights (g = K → per-channel)
  y = (x_q @ w_q) ∘ sx ∘ sw  −  (Σ x_q) ∘ sx ∘ zw ∘ sw

Per-channel weight quantization (one group spanning K) keeps the zero-point
correction a rank-1 term — the standard W8A8 layout. XLA path here; the
int8-MXU Pallas kernel slots in behind the same interface.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def quantize_activations(x: jnp.ndarray):
    """Per-token (last-axis) symmetric int8: returns (x_q int8, sx f32
    [..., 1])."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    sx = jnp.clip(absmax / 127.0, 1e-8, None)
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127)
    return x_q.astype(jnp.int8), sx


def w8a8_matmul(x, data, scales, zeros, meta):
    """y = dequant((quant(x) @ w_q)) for per-channel int8 weights.

    data: int8 [K, N] (biased −128 storage, qtpu.core.packing w8 layout
    with group_size == K); scales [1, N]; zeros [1, N] uint8.

    On TPU dispatches to the single-launch Pallas kernel (in-kernel act
    quant + int8×int8→int32 MXU dots); elsewhere / untiled shapes run the
    XLA reference below."""
    if jax.default_backend() == "tpu":
        try:
            from qtpu.kernels.pallas_int8_matmul import pallas_w8a8_matmul

            return pallas_w8a8_matmul(x, data, scales, zeros, meta)
        except NotImplementedError:
            pass
    return _w8a8_matmul_ref(x, data, scales, zeros, meta)


@partial(jax.jit, static_argnames=("meta",))
def _w8a8_matmul_ref(x, data, scales, zeros, meta):
    bits, group_size, K, N = meta
    if bits != 8 or group_size != K:
        raise ValueError("w8a8 path needs per-channel (group=K) int8 weights")
    x_q, sx = quantize_activations(x)
    w_q = data.astype(jnp.int32) + 128  # [K, N] in [0, 255]
    acc = jax.lax.dot_general(
        x_q.astype(jnp.int32),
        w_q,
        (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    sum_xq = jnp.sum(x_q.astype(jnp.int32), axis=-1, keepdims=True).astype(
        jnp.float32
    )
    sw = scales.astype(jnp.float32).reshape(1, N)
    zw = zeros.astype(jnp.int32).astype(jnp.float32).reshape(1, N)
    y = (acc - sum_xq * zw) * sw * sx
    return y.astype(x.dtype)
