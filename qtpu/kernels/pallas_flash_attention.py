"""Pallas TPU kernel: causal flash attention for full-sequence forward
(prefill and perplexity eval).

The XLA attention path materializes [H, S, S] fp32 scores — ~537 MB per
layer at S=2048 — and streams them through HBM twice. This kernel computes
attention with the online-softmax recurrence in VMEM: per (batch, q-head,
query-block) program, iterate key blocks inside the causal (optionally
banded) frontier carrying (running max m, normalizer l, accumulator acc).
Memory is O(S·hd) per program and the score tiles never touch HBM.

GQA is native: k/v stay at their KV head count and the BlockSpec index map
sends every q head of a group to its shared KV head — with the q-block
grid axis innermost, consecutive programs of one group hit the same K/V
block index and Pallas skips the re-DMA, so KV HBM traffic is S·hd per KV
head, not per q head (the round-1 version jnp.repeat-ed K/V to H heads in
HBM first — H/KV× the traffic and memory).

Sliding-window (Mistral) masking runs in-kernel: key blocks entirely
outside the band are skipped by starting the key loop at the band's first
block, and the in-band tiles apply the banded mask.

Layout: q [B, H, S, hd], k/v [B, KV, S, hd] (head-major, matching the
KV-cache layout). bq = bk = 128 tiles → [128, hd] @ [hd, 128] MXU dots.
VMEM bound: one program holds K+V [S, hd] ≈ 4·S·hd bytes (bf16) — ~8 MB
at S=16k/hd=64, comfortably pipelinable on v5e's VMEM.
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


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, S, hd, window):
    i = pl.program_id(2)  # query block index
    q = q_ref[0, 0].astype(jnp.float32) / math.sqrt(hd)  # [BQ, hd]

    n_kblocks = (i + 1) * BQ // BK  # causal frontier (block-aligned)
    # banded mask: keys < q_pos - window + 1 never attend; the first block
    # that can bind for this q block starts at (i·BQ − window + 1)
    if window > 0:
        j0 = jnp.maximum((i * BQ - window + 1) // BK, 0)
    else:
        j0 = 0

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
        mask = k_idx <= q_idx
        if window > 0:
            mask &= k_idx > q_idx - window
        s = jnp.where(mask, s, -1e30)

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
    m, l, acc = jax.lax.fori_loop(j0, n_kblocks, body, (m0, l0, acc0))
    o_ref[0, 0] = (acc / jnp.where(l == 0, 1.0, l)).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("window", "interpret"))
def pallas_flash_attention(q, k, v, window: int = 0, interpret: bool = False):
    """Causal (window=0) or sliding-window attention. q [B, H, S, hd];
    k/v [B, KV, S, hd] with H % KV == 0 (GQA read natively in the index
    map — no repeat). Returns [B, H, S, hd] in q.dtype."""
    B, H, S, hd = q.shape
    KV = k.shape[1]
    if S % BQ or H % KV:
        raise NotImplementedError("flash attention needs S%128==0, H%KV==0")
    rep = H // KV

    grid_spec = pl.GridSpec(
        # q-block axis innermost: consecutive programs of one GQA group
        # keep the same K/V block index → Pallas skips the re-DMA
        grid=(B, H, S // BQ),
        in_specs=[
            pl.BlockSpec(
                (1, 1, BQ, hd), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, S, hd),
                lambda b, h, i: (b, h // rep, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, S, hd),
                lambda b, h, i: (b, h // rep, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, BQ, hd), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        partial(_flash_kernel, S=S, hd=hd, window=int(window)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, S, hd), q.dtype),
        interpret=interpret,
    )(q, k, v)
