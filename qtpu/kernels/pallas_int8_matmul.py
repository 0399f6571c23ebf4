"""Pallas TPU kernel: true W8A8 matmul (SmoothQuant serving, BASELINE #4).

The XLA path in qtpu.kernels.int8_matmul quantizes activations on device
but pays an f32-ish dot; here the whole thing is one kernel per output
tile:

  sx  = max|x| per token / 127            (dynamic, in-kernel)
  x_q = round(x / sx)  → int8
  acc = x_q @ d   (int8 × int8 → int32 on the MXU; d is the stored
        value-minus-128 signed container, so acc = x_q @ (w_q − 128))
  y   = (acc + Σx_q ∘ (128 − z)) ∘ s_w ∘ sx

Per-channel weights (ONE group spanning K, the standard W8A8 layout) keep
the zero-point correction rank-1: (128 − z) folds the signed-container
bias and the asymmetric zero-point into one [1, N] row.

The activation quantize is recomputed per N-tile (it is [bm, K] VPU work
against a [K, bn] weight stream — negligible, and it keeps the kernel a
single launch with no [M, K] int8 round trip through HBM).

Reference parity: the reference never quantizes activations
(smooth_quant_quantizer.py:307-323) — this is the serving extension its
SmoothQuant story points at; accuracy-tested against the XLA
int8_matmul path which tests/test_awq_gptq_sq.py ties to the fake-quant
math.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _w8a8_kernel(x_ref, d_ref, s_ref, z_ref, o_ref, *, K):
    xf = x_ref[:].astype(jnp.float32)  # [bm, K]
    absmax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    sx = jnp.clip(absmax * (1.0 / 127.0), 1e-8, None)
    xq = jnp.round(xf * (1.0 / sx)).astype(jnp.int8)  # [-127, 127]
    acc = jax.lax.dot_general(
        xq,
        d_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)  # [bm, bn] = x_q @ (w_q - 128)
    sum_xq = jnp.sum(xq.astype(jnp.float32), axis=1, keepdims=True)
    sw = s_ref[0, :][None, :].astype(jnp.float32)
    zc = 128.0 - z_ref[0, :][None, :].astype(jnp.int32).astype(jnp.float32)
    y = (acc + sum_xq * zc) * sw * sx
    o_ref[:] = y.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("meta", "interpret"))
def pallas_w8a8_matmul(x, data, scales, zeros, meta, interpret=False):
    """y ≈ x @ dequant(data) with dynamic per-token int8 activations.

    x [..., K] bf16/f32; data int8 [K, N] (value − 128 storage); scales
    [1, N]; zeros [1, N] uint8. meta = (8, K, K, N). Raises
    NotImplementedError for untiled shapes (caller falls back to XLA).
    """
    bits, group_size, K, N = meta
    if bits != 8 or group_size != K:
        raise NotImplementedError("w8a8 kernel needs per-channel int8")
    if zeros is None:
        raise NotImplementedError("w8a8 kernel expects asymmetric packing")
    orig_shape = x.shape
    M = 1
    for d in orig_shape[:-1]:
        M *= d
    x2 = x.reshape(M, K)
    pad_m = (-M) % 8
    if pad_m:
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
    Mp = M + pad_m
    bm = next((b for b in (256, 128, 64, 32, 16, 8) if Mp % b == 0), Mp)
    while bm * K > 2 * 1024 * 1024 and bm > 8:
        bm //= 2
    wide = int(os.environ.get("QTPU_BN_MAX", "512"))
    bn = next((b for b in (2048, 1024, 512, 256, 128) if b <= wide and N % b == 0), N)
    if Mp % bm or N % bn:
        raise NotImplementedError("shapes do not tile")

    grid = (Mp // bm, N // bn)
    out = pl.pallas_call(
        partial(_w8a8_kernel, K=K),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0)),
            pl.BlockSpec((K, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=Mp * K * 2 + K * N + Mp * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, data, scales.reshape(1, N), zeros.reshape(1, N))
    if pad_m:
        out = out[:M]
    return out.reshape(orig_shape[:-1] + (N,))
