"""Pallas TPU kernel: causal flash attention for full-sequence forward
(prefill and perplexity eval).

The XLA attention path materializes [H, S, S] fp32 scores — ~537 MB per
layer at S=2048 — and streams them through HBM twice. This kernel computes
attention with the online-softmax recurrence in VMEM: per (batch, head,
query-block) program, iterate key blocks up to the causal frontier carrying
(running max m, normalizer l, accumulator acc). Memory is O(S·hd) per
program and the score tiles never touch HBM.

Layout: q/k/v [B, H, S, hd] (head-major, matching the KV-cache layout);
causal mask only (what the eval/prefill paths need). bq = bk = 128 tiles →
[128, hd] @ [hd, 128] MXU dots.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 128
BK = 128


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, S, hd):
    i = pl.program_id(2)  # query block index
    q = q_ref[0, 0].astype(jnp.float32) / math.sqrt(hd)  # [BQ, hd]

    n_kblocks = (i + 1) * BQ // BK  # causal frontier (block-aligned)

    def body(j, carry):
        m, l, acc = carry
        off = pl.multiple_of(j * BK, BK)
        k = k_ref[0, 0, pl.ds(off, BK), :].astype(jnp.float32)  # [BK, hd]
        v = v_ref[0, 0, pl.ds(off, BK), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BQ, BK]
        q_idx = i * BQ + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 0)
        k_idx = j * BK + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1)
        s = jnp.where(k_idx <= q_idx, s, -1e30)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(
            p, v, preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((BQ, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((BQ, 1), jnp.float32)
    acc0 = jnp.zeros((BQ, hd), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_kblocks, body, (m0, l0, acc0))
    o_ref[0, 0] = (acc / jnp.where(l == 0, 1.0, l)).astype(o_ref.dtype)


@partial(jax.jit)
def pallas_flash_attention(q, k, v):
    """Causal attention. q/k/v [B, H, S, hd] (k/v may have fewer heads —
    GQA handled by the caller via repeat, or pass KV==H). Returns
    [B, H, S, hd] in q.dtype."""
    B, H, S, hd = q.shape
    if S % BQ or k.shape[1] != H:
        raise NotImplementedError("flash attention needs S%128==0, KV==H")

    grid_spec = pl.GridSpec(
        grid=(B, H, S // BQ),
        in_specs=[
            pl.BlockSpec(
                (1, 1, BQ, hd), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, S, hd), lambda b, h, i: (b, h, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, S, hd), lambda b, h, i: (b, h, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, BQ, hd), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        partial(_flash_kernel, S=S, hd=hd),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, S, hd), q.dtype),
    )(q, k, v)
