"""Fused dequantize + matmul for packed INT4/INT8 weights.

This is the serving hot path the reference does not have (it only
pseudo-quantizes in place, quantization_utils.py:362-413). Two
implementations with one entry point:

- `quantized_matmul` — public op. On TPU it calls the Pallas kernel for
  supported shapes; elsewhere (CPU tests) or for odd shapes it falls back to
  the XLA reference path, which unpacks + dequantizes and lets XLA fuse the
  elementwise work into the matmul.

Layout contract (qtpu.core.packing): W logical [K, N]; w4 packs K-pairs into
int8 bytes; scales [K/g, N] bf16; zeros [K/g, N] uint8 (quantized domain,
asymmetric) or None (symmetric, offset 2^(b−1)); w8 data stored biased by
−128 so the int8 container is centered.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from qtpu.core.packing import unpack_int2, unpack_int4


def _dequant_ref(data, scales, zeros, bits, group_size, K, N, out_dtype):
    if bits == 2:
        qu = unpack_int2(data, group_size).astype(jnp.int32)
    elif bits == 4:
        qu = unpack_int4(data, group_size).astype(jnp.int32)
    else:
        qu = data.astype(jnp.int32) + 128
    qu = qu.reshape(K // group_size, group_size, N)
    s = scales.astype(jnp.float32).reshape(K // group_size, 1, N)
    if zeros is not None:
        z = zeros.astype(jnp.int32).reshape(K // group_size, 1, N)
    else:
        z = 2 ** (bits - 1)
    w = (qu - z).astype(jnp.float32) * s
    return w.reshape(K, N).astype(out_dtype)


@partial(jax.jit, static_argnames=("meta",))
def _quantized_matmul_ref(x, data, scales, zeros, meta):
    bits, group_size, K, N = meta
    w = _dequant_ref(data, scales, zeros, bits, group_size, K, N, x.dtype)
    return x @ w


def quantized_matmul(x, data, scales, zeros, meta):
    """y = x @ dequant(data, scales, zeros). meta = (bits, group, K, N).

    x: [..., K]; returns [..., N].
    """
    bits, group_size, K, N = meta
    # trace-time dispatch: the jitted program is built for one backend
    if jax.default_backend() == "tpu":
        try:
            from qtpu.kernels.pallas_dequant_matmul import pallas_quantized_matmul

            return pallas_quantized_matmul(x, data, scales, zeros, meta)
        except NotImplementedError:
            pass
    return _quantized_matmul_ref(x, data, scales, zeros, meta)


def quantized_matmul_stacked(
    x, data, scales, zeros, meta, layer, norm_w=None, resid=None, eps=1e-5
):
    """y = [resid +] [rms_norm·norm_w[layer] ∘] x @ dequant(data[layer])
    with STACKED per-layer weights [L, ...] and a traced layer index — on
    TPU the Pallas kernel indexes the stacked arrays via scalar prefetch
    so a `lax.scan` over layers never materializes per-layer weight copies
    (the xs-slicing such a scan would otherwise do costs more HBM traffic
    than the matmul itself at decode shapes). The optional norm/residual
    fusions fold the surrounding elementwise kernels of a decoder layer
    into the same launch. Fallback: dynamic-slice the layer, reference
    path with the same norm/residual composition."""
    if jax.default_backend() == "tpu":
        try:
            from qtpu.kernels.pallas_dequant_matmul import (
                pallas_quantized_matmul_stacked,
            )

            return pallas_quantized_matmul_stacked(
                x, data, scales, zeros, meta, layer,
                norm_w=norm_w, resid=resid, eps=float(eps),
            )
        except NotImplementedError:
            pass
    if norm_w is not None:
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xf = xf * jax.lax.rsqrt(var + float(eps))
        x = (xf * norm_w[layer].astype(jnp.float32)).astype(x.dtype)
    y = _quantized_matmul_ref(
        x, data[layer], scales[layer], None if zeros is None else zeros[layer], meta
    )
    return y if resid is None else resid + y


def codebook_matmul(x, data, scales, codebook, meta):
    """y = x @ (scales ∘ codebook[codes]) for POT/APOT codebook-packed
    weights. data: int4-packed codes (group-halves); scales [K/g, N];
    codebook [n_levels] f32 level values (|level| ≤ max level; scale caps
    magnitude). On TPU dispatches to the Pallas select-chain LUT kernel;
    elsewhere the XLA gather path."""
    if jax.default_backend() == "tpu":
        try:
            from qtpu.kernels.pallas_dequant_matmul import pallas_codebook_matmul

            return pallas_codebook_matmul(x, data, scales, codebook, meta)
        except NotImplementedError:
            pass
    return _codebook_matmul_ref(x, data, scales, codebook, meta)


@partial(jax.jit, static_argnames=("meta",))
def _codebook_matmul_ref(x, data, scales, codebook, meta):
    bits, group_size, K, N = meta
    codes = unpack_int4(data, group_size).astype(jnp.int32)  # [K, N]
    w = codebook[codes].reshape(K // group_size, group_size, N)
    w = w * scales.astype(jnp.float32).reshape(K // group_size, 1, N)
    return x @ w.reshape(K, N).astype(x.dtype)
