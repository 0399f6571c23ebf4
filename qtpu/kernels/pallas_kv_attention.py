"""Pallas TPU kernel: decode attention over the INT8 KV cache.

One decode step's attention reads the ENTIRE cache — at long context the
KV stream rivals the weight stream — so the kernel consumes the int8 K/V
directly from HBM and folds the per-(head, position) dequant scales into
the score/probability math instead of materializing a bf16 cache copy:

  scores[g, s] = (q_g · k_int[s]) · ks[s] / sqrt(hd)
  out[g]       = Σ_s (softmax(scores)[g, s] · vs[s]) · v_int[s]
               = (p ∘ vs) @ v_int          (scales folded into the probs)

Grid: (B, KV) — one program per (sequence, kv-head); the G = H/KV query
heads of the group attend together ([G, hd] @ [S, hd]ᵀ on the MXU). The
causal/validity mask comes from the per-sequence position via scalar
prefetch. Layout contract: K/V [B, KV, S, hd] int8, scales [B, KV, S] f32
(qtpu.serve.kvcache), S a multiple of 8, hd the full lane dim.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_attn_kernel(pos_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref, *, kb):
    """One program: `kb` kv-heads of one sequence (statically unrolled).

    Grid-step overhead is ~0.5 µs on v5e; at MHA head counts a
    per-(sequence, head) grid pays it 256× per layer (measured
    132 µs/layer for Llama-2-7B decode attention, ~10× the actual
    HBM/MXU work). Blocking kv-heads into one program amortizes it while
    keeping each head's [G, S] score tile MXU-shaped."""
    b = pl.program_id(0)
    G, hd = q_ref.shape[2], q_ref.shape[3]
    S = k_ref.shape[2]
    pos = pos_ref[b]
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (G, S), 1)
    for j in range(kb):  # static unroll over the kv-head block
        q = q_ref[0, j].astype(jnp.float32)  # [G, hd]
        k = k_ref[0, j].astype(jnp.float32)  # [S, hd] (int8 → f32)
        ks = ks_ref[0, j, :, 0].astype(jnp.float32)  # [S] (fed as [..,S,1])

        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [G, S]
        scores = scores * ks[None, :] / jnp.sqrt(float(hd))
        scores = jnp.where(s_idx <= pos, scores, -1e30)

        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # [G, S]

        vs = vs_ref[0, j, :, 0].astype(jnp.float32)  # [S]
        v = v_ref[0, j].astype(jnp.float32)  # [S, hd]
        out = jnp.dot(p * vs[None, :], v, preferred_element_type=jnp.float32)
        o_ref[0, j] = out.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def pallas_decode_attention(q, k_c, v_c, ks_c, vs_c, pos, interpret=False):
    """q [B, H, hd]; k_c/v_c [B, KV, S, hd] int8; ks_c/vs_c [B, KV, S] f32;
    pos [B] (attend keys ≤ pos). Returns [B, H, hd] in q.dtype."""
    B, H, hd = q.shape
    KV, S = k_c.shape[1], k_c.shape[2]
    if H % KV or S % 8 or hd % 8:
        raise NotImplementedError("decode attention needs H%KV==0, S%8==0")
    G = H // KV
    q4 = q.reshape(B, KV, G, hd)

    # kv-head block: as many heads per program as keep the K+V block under
    # ~4 MB of VMEM (pipelinable), rounded down to a divisor of KV
    kb = max(1, min(KV, (4 * 1024 * 1024) // (2 * S * hd)))
    while KV % kb:
        kb -= 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, KV // kb),
        in_specs=[
            pl.BlockSpec(
                (1, kb, G, hd), lambda b, h, pos: (b, h, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, kb, S, hd), lambda b, h, pos: (b, h, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, kb, S, hd), lambda b, h, pos: (b, h, 0, 0), memory_space=pltpu.VMEM
            ),
            # scales as [B, KV, S, 1]: a (1, kb, S) block would put the
            # kb-wide KV slice in the sublane position, below the tile floor
            pl.BlockSpec(
                (1, kb, S, 1), lambda b, h, pos: (b, h, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, kb, S, 1), lambda b, h, pos: (b, h, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, kb, G, hd), lambda b, h, pos: (b, h, 0, 0), memory_space=pltpu.VMEM
        ),
    )

    out = pl.pallas_call(
        partial(_decode_attn_kernel, kb=kb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KV, G, hd), q.dtype),
        interpret=interpret,
    )(pos.astype(jnp.int32), q4, k_c, v_c, ks_c[..., None], vs_c[..., None])
    return out.reshape(B, H, hd)
