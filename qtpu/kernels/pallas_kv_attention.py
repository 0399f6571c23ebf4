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


def _pick_blocks(B, KV, S, hd, bytes_per_head, scale_bytes_per_head=0):
    """(bb, kb): sequences × kv-heads per program, sized for the 16 MB
    VMEM with two constraints: ≤ ~5 MB of cache blocks per program (room
    for double buffering), and ≤ 32 unrolled (bi, j) bodies — the bodies'
    stack intermediates scale with the unroll count, and 64 bodies hit
    the 16 MB scoped-vmem ceiling at 18 MB (B=32 write+attend, S=288)
    while the measured-good configurations all sit at ≤ 32. Both factors
    divide their axis. QTPU_ATTN_BB / QTPU_ATTN_KB override for
    measurement."""
    import os

    budget = 5 * 1024 * 1024
    per_head = bytes_per_head + scale_bytes_per_head
    kb = max(1, min(KV, budget // max(per_head, 1)))
    while KV % kb:
        kb -= 1
    bb = max(1, min(B, budget // max(kb * per_head, 1)))
    while B % bb:
        bb -= 1
    # unroll cap: the phased kernel bodies keep blend tiles + score tiles
    # live across phases, and Mosaic allocates in/out blocks per body —
    # measured ~4.6× per_head of scoped vmem per body (16.88M at 32
    # bodies, S=440). Cap total bodies to fit the 16 MB scoped-vmem limit
    # with headroom, never above 32 (the r3 stack-OOM ceiling).
    max_bodies = min(32, max(8, int(14.5e6 // max(4.6 * per_head, 1))))
    while bb > 1 and bb * kb > max_bodies:
        bb -= 1
        while B % bb:
            bb -= 1
    while kb > max_bodies and bb * kb > max_bodies:  # MHA: bb already 1
        kb -= 1
        while KV % kb:
            kb -= 1
    env_bb = os.environ.get("QTPU_ATTN_BB")
    env_kb = os.environ.get("QTPU_ATTN_KB")
    if env_bb and B % int(env_bb) == 0:
        bb = int(env_bb)
    if env_kb and KV % int(env_kb) == 0:
        kb = int(env_kb)
    if bb * kb > max_bodies:
        import warnings

        warnings.warn(
            f"QTPU_ATTN_BB/KB override gives {bb * kb} unrolled bodies "
            f"(> {max_bodies}): risks the scoped-vmem OOM the cap prevents"
        )
    return bb, kb


def _decode_attn_kernel(
    pos_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref, *, bb, kb, window
):
    """One program: `bb` sequences × `kb` kv-heads (statically unrolled).

    Grid-step overhead is ~0.5 µs on v5e; at MHA head counts a
    per-(sequence, head) grid pays it 256× per layer (measured
    132 µs/layer for Llama-2-7B decode attention, ~10× the actual
    HBM/MXU work). Blocking heads and sequences into one program
    amortizes it while keeping each head's [G, S] score tile MXU-shaped.
    Scales ride the LANE dimension and dots run in bf16 — see
    _decode_attn_write_kernel."""
    G, hd = q_ref.shape[2], q_ref.shape[3]
    S = k_ref.shape[2]
    bodies = [(bi, j) for bi in range(bb) for j in range(kb)]
    # PHASED structure (r4): all score dots, then all softmaxes, then all
    # pv dots — the per-body dot→softmax→dot chain serialized the tiny MXU
    # issues; grouping the independent dots lets Mosaic overlap them
    # (measured 50.5 → 22.9 µs/layer at B=32 TinyLlama shapes on v5e)
    sc = {}
    for bi, j in bodies:
        sc[bi, j] = jax.lax.dot_general(
            q_ref[bi, j], k_ref[bi, j].astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [G, S]
    pv = {}
    for bi, j in bodies:
        pos = pos_ref[pl.program_id(0) * bb + bi]
        s_idx = jax.lax.broadcasted_iota(jnp.int32, (G, S), 1)
        valid = s_idx <= pos
        if window > 0:  # sliding-window band (Mistral)
            valid &= s_idx > pos - window
        ks = ks_ref[bi, j].astype(jnp.float32)  # [S] in lanes
        scores = sc[bi, j] * ks[None, :] * (1.0 / float(hd) ** 0.5)
        scores = jnp.where(valid, scores, -1e30)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # [G, S]
        vs = vs_ref[bi, j].astype(jnp.float32)  # [S] in lanes
        pv[bi, j] = (p * vs[None, :]).astype(jnp.bfloat16)
    for bi, j in bodies:
        out = jnp.dot(
            pv[bi, j], v_ref[bi, j].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        o_ref[bi, j] = out.astype(o_ref.dtype)


def _decode_attn_write_kernel(
    pos_ref,
    q_ref,
    kn_ref,
    vn_ref,
    k_ref,
    v_ref,
    ks_ref,
    vs_ref,
    o_ref,
    ko_ref,
    vo_ref,
    kso_ref,
    vso_ref,
    *,
    bb,
    kb,
    window,
):
    """Fused decode step: quantize+write this step's K/V row into the int8
    cache AND compute attention over the updated cache, in one pass.

    The separate masked-select cache write costs ~0.49 ms/step and the
    standalone attention kernel ~0.62 ms/step on v5e (TinyLlama B=8 —
    measured by stripping each from the full decode program); both stream
    the same [S, hd] tiles, so fusing halves the cache traffic and drops
    one kernel launch + XLA pass per layer.

    Layout/precision choices (measured, tools/exp_attn_v2.py on v5e:
    48.7 → 22.6 µs/layer at B=8, 272 → 104 at B=32 vs the first-round
    kernel): scales live in the LANE dimension ([.., kb, S] blocks — the
    old [.., S, 1] blocks forced a sublane→lane transpose of every scale
    vector per head), MXU dots run in bf16 (int8 codes are exact in bf16;
    f32 MXU multiplies cost multiple passes), and `bb` sequences share one
    program (fewer grid steps → fewer DMA issues)."""
    S = k_ref.shape[2]
    G, hd = q_ref.shape[2], q_ref.shape[3]
    bodies = [(bi, j) for bi in range(bb) for j in range(kb)]
    # PHASED (r4): all blends+writes, then all score dots, then all
    # softmaxes, then all pv dots — see _decode_attn_kernel
    blend = {}
    for bi, j in bodies:
        pos = pos_ref[pl.program_id(0) * bb + bi]
        row_hit = jax.lax.broadcasted_iota(jnp.int32, (S, hd), 0) == pos
        lane_hit = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)[0] == pos
        # quantize the new K/V row (absmax over hd → one f32 scale)
        kn = kn_ref[bi, j, 0].astype(jnp.float32)  # [hd]
        vn = vn_ref[bi, j, 0].astype(jnp.float32)
        k_sc = jnp.clip(jnp.max(jnp.abs(kn)) / 127.0, 1e-8, None)
        v_sc = jnp.clip(jnp.max(jnp.abs(vn)) / 127.0, 1e-8, None)
        kq = jnp.clip(jnp.round(kn / k_sc), -127, 127)
        vq = jnp.clip(jnp.round(vn / v_sc), -127, 127)

        # blend row into the cache tile in int8 (positions ≥ S never
        # hit → tile passes through unchanged); the write into the
        # output block IS the scan-ys cache update
        ki8 = jnp.where(row_hit, kq.astype(jnp.int8)[None, :], k_ref[bi, j])
        vi8 = jnp.where(row_hit, vq.astype(jnp.int8)[None, :], v_ref[bi, j])
        ks_bl = jnp.where(lane_hit, k_sc, ks_ref[bi, j].astype(jnp.float32))
        vs_bl = jnp.where(lane_hit, v_sc, vs_ref[bi, j].astype(jnp.float32))
        ko_ref[bi, j] = ki8
        vo_ref[bi, j] = vi8
        kso_ref[bi, j] = ks_bl
        vso_ref[bi, j] = vs_bl
        blend[bi, j] = (ki8, vi8, ks_bl, vs_bl)

    sc = {}
    for bi, j in bodies:
        sc[bi, j] = jax.lax.dot_general(
            q_ref[bi, j], blend[bi, j][0].astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [G, S]
    pv = {}
    for bi, j in bodies:
        pos = pos_ref[pl.program_id(0) * bb + bi]
        s_idx = jax.lax.broadcasted_iota(jnp.int32, (G, S), 1)
        valid = s_idx <= pos
        if window > 0:  # sliding-window band (Mistral)
            valid &= s_idx > pos - window
        _, _, ks_bl, vs_bl = blend[bi, j]
        scores = sc[bi, j] * ks_bl[None, :] * (1.0 / float(hd) ** 0.5)
        scores = jnp.where(valid, scores, -1e30)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # [G, S]
        pv[bi, j] = (p * vs_bl[None, :]).astype(jnp.bfloat16)
    for bi, j in bodies:
        out = jnp.dot(
            pv[bi, j], blend[bi, j][1].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        o_ref[bi, j] = out.astype(o_ref.dtype)


def _decode_attn_write_bf16_kernel(
    pos_ref, q_ref, kn_ref, vn_ref, k_ref, v_ref, o_ref, ko_ref, vo_ref,
    *, bb, kb, window
):
    """bf16-cache variant of the fused write+attend kernel: no per-row
    scales, no int8 quant/dequant converts — the blend and both dots run
    on the bf16 tiles directly. Cache DMA doubles vs int8 but the decode
    kernel cost is convert/VPU-bound, not DMA-bound (measured ~49 µs/layer
    fused-int8 vs ~4.5 µs of tile DMA on v5e), so this is the latency
    configuration; int8 stays the capacity configuration."""
    G, hd = q_ref.shape[2], q_ref.shape[3]
    S = k_ref.shape[2]
    for bi in range(bb):
        b = pl.program_id(0) * bb + bi
        pos = pos_ref[b]
        s_idx = jax.lax.broadcasted_iota(jnp.int32, (G, S), 1)
        row_hit = jax.lax.broadcasted_iota(jnp.int32, (S, hd), 0) == pos
        for j in range(kb):
            k_bl = jnp.where(row_hit, kn_ref[bi, j, 0][None, :], k_ref[bi, j])
            v_bl = jnp.where(row_hit, vn_ref[bi, j, 0][None, :], v_ref[bi, j])
            ko_ref[bi, j] = k_bl
            vo_ref[bi, j] = v_bl

            q = q_ref[bi, j]  # [G, hd] bf16
            scores = jax.lax.dot_general(
                q, k_bl, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) / jnp.sqrt(float(hd))
            valid = s_idx <= pos
            if window > 0:
                valid &= s_idx > pos - window
            scores = jnp.where(valid, scores, -1e30)
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v_bl.dtype)
            out = jnp.dot(p, v_bl, preferred_element_type=jnp.float32)
            o_ref[bi, j] = out.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("window", "interpret"))
def pallas_decode_attention_write_bf16(
    q, k_new, v_new, k_c, v_c, pos, window: int = 0, interpret=False
):
    """Fused row write + attention over a bf16 KV cache. q [B, H, hd];
    k_new/v_new [B, 1, KV, hd]; k_c/v_c [B, KV, S, hd] bf16; pos [B].
    Returns (out [B, H, hd], k_c, v_c) updated."""
    B, H, hd = q.shape
    KV, S = k_c.shape[1], k_c.shape[2]
    if H % KV or S % 8 or hd % 8:
        raise NotImplementedError("decode attention needs H%KV==0, S%8==0")
    G = H // KV
    q4 = q.reshape(B, KV, G, hd)
    kn = jnp.swapaxes(k_new, 1, 2).astype(k_c.dtype)
    vn = jnp.swapaxes(v_new, 1, 2).astype(v_c.dtype)

    # bf16 k+v stream in AND out per head (8·S·hd bytes)
    bb, kb = _pick_blocks(B, KV, S, hd, 8 * S * hd)

    def ix(b, h, pos):
        return (b, h, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // bb, KV // kb),
        in_specs=[
            pl.BlockSpec((bb, kb, G, hd), ix),
            pl.BlockSpec((bb, kb, 1, hd), ix),
            pl.BlockSpec((bb, kb, 1, hd), ix),
            pl.BlockSpec((bb, kb, S, hd), ix),
            pl.BlockSpec((bb, kb, S, hd), ix),
        ],
        out_specs=[
            pl.BlockSpec((bb, kb, G, hd), ix),
            pl.BlockSpec((bb, kb, S, hd), ix),
            pl.BlockSpec((bb, kb, S, hd), ix),
        ],
    )
    out, k_o, v_o = pl.pallas_call(
        partial(_decode_attn_write_bf16_kernel, bb=bb, kb=kb, window=int(window)),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, KV, G, hd), q.dtype),
            jax.ShapeDtypeStruct((B, KV, S, hd), k_c.dtype),
            jax.ShapeDtypeStruct((B, KV, S, hd), v_c.dtype),
        ],
        interpret=interpret,
    )(pos.astype(jnp.int32), q4, kn, vn, k_c, v_c)
    return out.reshape(B, H, hd), k_o, v_o


@partial(jax.jit, static_argnames=("window", "interpret"), donate_argnums=(3, 4, 5, 6))
def pallas_decode_attention_write(
    q, k_new, v_new, k_c, v_c, ks_c, vs_c, pos, window: int = 0,
    interpret=False,
):
    """Fused quantize-write + int8-cache attention for one decode step.

    q [B, H, hd] (post-rope); k_new/v_new [B, 1, KV, hd] (post-rope, the
    row being written at pos); k_c/v_c [B, KV, S, hd] int8 and ks_c/vs_c
    [B, KV, S] f32 (donated — updated in place via input/output aliasing).
    pos [B]: write position == query position; rows with pos ≥ S write
    nothing (inactive batcher slots). Returns
    (out [B, H, hd], k_c, v_c, ks_c, vs_c) updated."""
    B, H, hd = q.shape
    KV, S = k_c.shape[1], k_c.shape[2]
    if H % KV or S % 8 or hd % 8:
        raise NotImplementedError("decode attention needs H%KV==0, S%8==0")
    G = H // KV
    q4 = q.reshape(B, KV, G, hd)
    kn = jnp.swapaxes(k_new, 1, 2)  # [B, KV, 1, hd]
    vn = jnp.swapaxes(v_new, 1, 2)

    # k+v stream in AND out per head (4·S·hd int8) + scale rows in/out
    bb, kb = _pick_blocks(B, KV, S, hd, 4 * S * hd, 4 * S * 4)

    def ix(b, h, pos):
        return (b, h, 0, 0)

    def ix3(b, h, pos):
        # scales ride as [B, KV/kb, kb, S]: a (bb, kb, S) block of the 3D
        # array has trailing dims (kb, S), which Mosaic only allows when
        # kb == KV; regrouping so the head-block axis is its own dim makes
        # the trailing block dims (kb, S) == full array dims for any kb,
        # at one 8-sublane pad per head BLOCK (not per head)
        return (b, h, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // bb, KV // kb),
        in_specs=[
            pl.BlockSpec((bb, kb, G, hd), ix),
            pl.BlockSpec((bb, kb, 1, hd), ix),
            pl.BlockSpec((bb, kb, 1, hd), ix),
            pl.BlockSpec((bb, kb, S, hd), ix),
            pl.BlockSpec((bb, kb, S, hd), ix),
            pl.BlockSpec((bb, None, kb, S), ix3),
            pl.BlockSpec((bb, None, kb, S), ix3),
        ],
        out_specs=[
            pl.BlockSpec((bb, kb, G, hd), ix),
            pl.BlockSpec((bb, kb, S, hd), ix),
            pl.BlockSpec((bb, kb, S, hd), ix),
            pl.BlockSpec((bb, None, kb, S), ix3),
            pl.BlockSpec((bb, None, kb, S), ix3),
        ],
    )
    out, k_o, v_o, ks_o, vs_o = pl.pallas_call(
        partial(_decode_attn_write_kernel, bb=bb, kb=kb, window=int(window)),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, KV, G, hd), q.dtype),
            jax.ShapeDtypeStruct((B, KV, S, hd), jnp.int8),
            jax.ShapeDtypeStruct((B, KV, S, hd), jnp.int8),
            jax.ShapeDtypeStruct((B, KV // kb, kb, S), jnp.float32),
            jax.ShapeDtypeStruct((B, KV // kb, kb, S), jnp.float32),
        ],
        # NO input/output aliasing: inside the decode scan the cache tiles
        # arrive as xs slices and leave as ys slots — aliasing across that
        # boundary makes XLA insert protective copies (measured 2.90 vs
        # 2.79 ms/step unfused); fresh outputs land directly in the ys
        # buffer for read-once/write-once tile traffic
        interpret=interpret,
    )(
        pos.astype(jnp.int32),
        q4,
        kn,
        vn,
        k_c,
        v_c,
        ks_c.reshape(B, KV // kb, kb, S),
        vs_c.reshape(B, KV // kb, kb, S),
    )
    return (
        out.reshape(B, H, hd),
        k_o,
        v_o,
        ks_o.reshape(B, KV, S),
        vs_o.reshape(B, KV, S),
    )


@partial(jax.jit, static_argnames=("window", "interpret"))
def pallas_decode_attention(
    q, k_c, v_c, ks_c, vs_c, pos, window: int = 0, interpret=False
):
    """q [B, H, hd]; k_c/v_c [B, KV, S, hd] int8; ks_c/vs_c [B, KV, S] f32;
    pos [B] (attend keys ≤ pos; window > 0 additionally bounds keys to the
    last `window` positions). Returns [B, H, hd] in q.dtype."""
    B, H, hd = q.shape
    KV, S = k_c.shape[1], k_c.shape[2]
    if H % KV or S % 8 or hd % 8:
        raise NotImplementedError("decode attention needs H%KV==0, S%8==0")
    G = H // KV
    q4 = q.reshape(B, KV, G, hd)

    # k+v stream in per head (2·S·hd int8) + scale rows
    bb, kb = _pick_blocks(B, KV, S, hd, 2 * S * hd, 2 * S * 4)

    def ix(b, h, pos):
        return (b, h, 0, 0)

    def ix3(b, h, pos):
        # scales ride as [B, KV/kb, kb, S]: a (bb, kb, S) block of the 3D
        # array has trailing dims (kb, S), which Mosaic only allows when
        # kb == KV; regrouping so the head-block axis is its own dim makes
        # the trailing block dims (kb, S) == full array dims for any kb,
        # at one 8-sublane pad per head BLOCK (not per head)
        return (b, h, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // bb, KV // kb),
        in_specs=[
            pl.BlockSpec((bb, kb, G, hd), ix),
            pl.BlockSpec((bb, kb, S, hd), ix),
            pl.BlockSpec((bb, kb, S, hd), ix),
            pl.BlockSpec((bb, None, kb, S), ix3),
            pl.BlockSpec((bb, None, kb, S), ix3),
        ],
        out_specs=pl.BlockSpec((bb, kb, G, hd), ix),
    )

    out = pl.pallas_call(
        partial(_decode_attn_kernel, bb=bb, kb=kb, window=int(window)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KV, G, hd), q.dtype),
        interpret=interpret,
    )(
        pos.astype(jnp.int32), q4, k_c, v_c,
        ks_c.reshape(B, KV // kb, kb, S),
        vs_c.reshape(B, KV // kb, kb, S),
    )
    return out.reshape(B, H, hd)


def _decode_attn_banded_kernel(
    pos_ref,
    q_ref, kn_ref, vn_ref,
    k_ref, v_ref, ks_ref, vs_ref,
    kb_ref, vb_ref, ksb_ref, vsb_ref,
    o_ref, ko_ref, vo_ref, kso_ref, vso_ref,
    *, kb, window, SB,
):
    """In-place decode attention: read the full [S, hd] int8 cache tiles,
    write back ONLY the 8-row band holding this step's token (the cache
    buffers are input/output-aliased; untouched bands keep their data).

    The new token never gets blended into the [S, hd] tile: its score is
    a separate [G, 1] column folded into the softmax, and its value a
    rank-1 update after the pv dot — two full-tile selects fewer than the
    blend kernel, and output traffic drops from S rows to 8 (at S = 16k
    that is ~2000× less write traffic; the read is the roofline). The
    bands arrive as separate pos-indexed input blocks (kb_ref/…): Mosaic
    cannot prove in-kernel dynamic lane/sublane offsets aligned, but
    BlockSpec index maps may be arbitrary scalar functions.

    One sequence per program (the band's position differs per sequence, so
    `bb` > 1 cannot share an output block); `kb` heads amortize the grid.
    Inactive rows (pos ≥ S) write their band back unchanged."""
    S = k_ref.shape[2]
    G, hd = q_ref.shape[2], q_ref.shape[3]
    b = pl.program_id(0)
    pos = pos_ref[b]
    active = pos < S
    band = jnp.clip(pos, 0, S - 1) // 8 * 8
    sband = jnp.clip(pos, 0, S - 1) // SB * SB
    in_band = jax.lax.broadcasted_iota(jnp.int32, (8, hd), 0) == pos - band
    in_sband = (
        jax.lax.broadcasted_iota(jnp.int32, (1, SB), 1)[0] == pos - sband
    )
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (G, S), 1)
    # strictly-before mask: the stored row at `pos` is stale; the new
    # token rides its own score column below
    valid = s_idx < pos
    if window > 0:
        valid &= s_idx > pos - window
    for j in range(kb):
        kn = kn_ref[0, j, 0].astype(jnp.float32)  # [hd]
        vn = vn_ref[0, j, 0].astype(jnp.float32)
        k_sc = jnp.clip(jnp.max(jnp.abs(kn)) / 127.0, 1e-8, None)
        v_sc = jnp.clip(jnp.max(jnp.abs(vn)) / 127.0, 1e-8, None)
        kq = jnp.clip(jnp.round(kn / k_sc), -127, 127)
        vq = jnp.clip(jnp.round(vn / v_sc), -127, 127)

        # band write-back (8 cache rows, SB scale lanes)
        wr = jnp.logical_and(in_band, active)
        ko_ref[0, j] = jnp.where(wr, kq.astype(jnp.int8)[None, :], kb_ref[0, j])
        vo_ref[0, j] = jnp.where(wr, vq.astype(jnp.int8)[None, :], vb_ref[0, j])
        wr_s = jnp.logical_and(in_sband, active)
        kso_ref[0, j] = jnp.where(
            wr_s, k_sc, ksb_ref[0, j].astype(jnp.float32)
        )
        vso_ref[0, j] = jnp.where(
            wr_s, v_sc, vsb_ref[0, j].astype(jnp.float32)
        )

        q = q_ref[0, j]  # [G, hd] bf16
        ks = ks_ref[0, j].astype(jnp.float32)  # [S]
        scores = jax.lax.dot_general(
            q, k_ref[0, j].astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [G, S]
        inv_sqrt = 1.0 / float(hd) ** 0.5
        scores = scores * ks[None, :] * inv_sqrt
        scores = jnp.where(valid, scores, -1e30)
        # the new token's own score column (always attended when active)
        s_new = (
            jnp.sum(q.astype(jnp.float32) * kn[None, :], axis=1, keepdims=True)
            * inv_sqrt
        )  # [G, 1]
        s_new = jnp.where(active, s_new, -1e30)

        m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), s_new)
        e = jnp.exp(scores - m)
        e_new = jnp.exp(s_new - m)  # [G, 1]
        denom = jnp.sum(e, axis=-1, keepdims=True) + e_new
        p = e / denom
        vs = vs_ref[0, j].astype(jnp.float32)
        pv = (p * vs[None, :]).astype(jnp.bfloat16)
        out = jnp.dot(
            pv, v_ref[0, j].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        out = out + (e_new / denom) * vn[None, :]
        o_ref[0, j] = out.astype(o_ref.dtype)


@partial(
    jax.jit,
    static_argnames=("window", "interpret"),
    donate_argnums=(3, 4, 5, 6),
)
def pallas_decode_attention_write_banded(
    q, k_new, v_new, k_c, v_c, ks_c, vs_c, pos, window: int = 0,
    interpret=False,
):
    """Fused quantize-write + int8-cache attention with IN-PLACE banded
    cache updates: the cache buffers are input/output-aliased and only the
    8-row band holding `pos` is written back — read-once/write-8-rows
    traffic instead of read-once/write-S-rows. The format of choice for
    per-layer cache buffers (no scan ys) and long contexts.

    Same contract as pallas_decode_attention_write."""
    B, H, hd = q.shape
    KV, S = k_c.shape[1], k_c.shape[2]
    if H % KV or S % 8 or hd % 8:
        raise NotImplementedError("decode attention needs H%KV==0, S%8==0")
    SB = 128 if S % 128 == 0 else S  # scale-lane band width
    G = H // KV
    q4 = q.reshape(B, KV, G, hd)
    kn = jnp.swapaxes(k_new, 1, 2)  # [B, KV, 1, hd]
    vn = jnp.swapaxes(v_new, 1, 2)

    kb = max(
        1, min(KV, (5 * 1024 * 1024) // max(2 * S * hd + 2 * S * 4, 1), 32)
    )
    while KV % kb:
        kb -= 1

    def ix(b, h, pos):
        return (b, h, 0, 0)

    def ix_band(b, h, pos):
        return (b, h, jnp.clip(pos[b], 0, S - 1) // 8, 0)

    def ix_sband(b, h, pos):
        # scales ride as [B, KV/kb, kb, S]: dim1 is the head-group axis
        # (grid index h), dim2 spans the kb heads of the block (always 0)
        return (b, h, 0, jnp.clip(pos[b], 0, S - 1) // SB)

    def ix_s(b, h, pos):
        return (b, h, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, KV // kb),
        in_specs=[
            pl.BlockSpec((1, kb, G, hd), ix),
            pl.BlockSpec((1, kb, 1, hd), ix),
            pl.BlockSpec((1, kb, 1, hd), ix),
            pl.BlockSpec((1, kb, S, hd), ix),
            pl.BlockSpec((1, kb, S, hd), ix),
            pl.BlockSpec((1, None, kb, S), ix_s),
            pl.BlockSpec((1, None, kb, S), ix_s),
            # the pos-band of each cache array, delivered as inputs so the
            # kernel never needs a dynamic in-kernel slice
            pl.BlockSpec((1, kb, 8, hd), ix_band),
            pl.BlockSpec((1, kb, 8, hd), ix_band),
            pl.BlockSpec((1, None, kb, SB), ix_sband),
            pl.BlockSpec((1, None, kb, SB), ix_sband),
        ],
        out_specs=[
            pl.BlockSpec((1, kb, G, hd), ix),
            pl.BlockSpec((1, kb, 8, hd), ix_band),
            pl.BlockSpec((1, kb, 8, hd), ix_band),
            pl.BlockSpec((1, None, kb, SB), ix_sband),
            pl.BlockSpec((1, None, kb, SB), ix_sband),
        ],
    )
    ks4 = ks_c.reshape(B, KV // kb, kb, S)
    vs4 = vs_c.reshape(B, KV // kb, kb, S)
    out, k_o, v_o, ks_o, vs_o = pl.pallas_call(
        partial(
            _decode_attn_banded_kernel, kb=kb, window=int(window), SB=SB
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, KV, G, hd), q.dtype),
            jax.ShapeDtypeStruct((B, KV, S, hd), jnp.int8),
            jax.ShapeDtypeStruct((B, KV, S, hd), jnp.int8),
            jax.ShapeDtypeStruct((B, KV // kb, kb, S), jnp.float32),
            jax.ShapeDtypeStruct((B, KV // kb, kb, S), jnp.float32),
        ],
        # in-place: cache inputs alias the banded outputs (flat input
        # indices count the scalar-prefetch operand at 0)
        input_output_aliases={4: 1, 5: 2, 6: 3, 7: 4},
        interpret=interpret,
    )(
        pos.astype(jnp.int32),
        q4,
        kn,
        vn,
        k_c,
        v_c,
        ks4,
        vs4,
        k_c,
        v_c,
        ks4,
        vs4,
    )
    return (
        out.reshape(B, H, hd),
        k_o,
        v_o,
        ks_o.reshape(B, KV, S),
        vs_o.reshape(B, KV, S),
    )


def _decode_attn_flash_kernel(
    pos_ref,
    q_ref, kn_ref, vn_ref,
    k_ref, v_ref, ks_ref, vs_ref,
    o_ref, ko_ref, vo_ref, kso_ref, vso_ref,
    acc_scr, m_scr, l_scr,
    *, kb, window, SBLK, NS,
):
    """S-BLOCKED decode attention with online softmax + in-place banded
    cache write — the long-context decode kernel.

    Grid (B, S/SBLK): each program streams one [kb·SBLK, hd] slice of the
    int8 cache and folds it into running (max, sum, acc) scratches
    (flash-attention online rescale); the final S step adds the new
    token's score column and writes the [G, hd] output. The 8-row band
    holding `pos` is written back in place during the S step that owns it
    (cache buffers input/output-aliased; aliasing stalls cost nothing here
    because each program's write is 8 rows against an SBLK-row read).
    VMEM stays ~2·kb·SBLK·hd bytes regardless of S — no 16 MB cliff at
    long context."""
    S_total = NS * SBLK
    G, hd = q_ref.shape[2], q_ref.shape[3]
    b = pl.program_id(0)
    s = pl.program_id(1)
    pos = pos_ref[b]
    active = pos < S_total
    s0 = s * SBLK
    inv_sqrt = 1.0 / float(hd) ** 0.5

    @pl.when(s == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)

    owns_band = jnp.clip(pos, 0, S_total - 1) // SBLK == s
    # row/lane hits of `pos` within THIS S block (write = full-block blend
    # in the owning block only — no dynamic in-kernel slicing, and write
    # traffic is one SBLK block instead of all NS of them)
    in_band = (
        jax.lax.broadcasted_iota(jnp.int32, (SBLK, hd), 0) == pos - s0
    )
    in_sband = (
        jax.lax.broadcasted_iota(jnp.int32, (1, SBLK), 1)[0] == pos - s0
    )

    s_idx = s0 + jax.lax.broadcasted_iota(jnp.int32, (G, SBLK), 1)
    valid = s_idx < pos
    if window > 0:
        valid &= s_idx > pos - window

    # PHASE-SPLIT body (r5): all band writes → all score dots → all
    # softmax updates → all pv dots. The per-head dot→softmax→dot chain
    # serialized the tiny MXU issues (the r4 lesson from the short-S
    # kernels, 2.2× at B=32, never applied here); phasing also lets the
    # v-tile DMA overlap the score phase. Live state is kb [G, SBLK] f32
    # score tiles (kb·G·SBLK·4 ≈ 256 KB at default shapes).
    for j in range(kb):
        kn = kn_ref[0, j, 0].astype(jnp.float32)  # [hd]
        vn = vn_ref[0, j, 0].astype(jnp.float32)
        k_sc = jnp.clip(jnp.max(jnp.abs(kn)) / 127.0, 1e-8, None)
        v_sc = jnp.clip(jnp.max(jnp.abs(vn)) / 127.0, 1e-8, None)
        kq = jnp.clip(jnp.round(kn / k_sc), -127, 127)
        vq = jnp.clip(jnp.round(vn / v_sc), -127, 127)

        @pl.when(owns_band)
        def _write_band(j=j, kq=kq, vq=vq, k_sc=k_sc, v_sc=v_sc):
            wr = jnp.logical_and(in_band, active)
            ko_ref[0, j] = jnp.where(
                wr, kq.astype(jnp.int8)[None, :], k_ref[0, j]
            )
            vo_ref[0, j] = jnp.where(
                wr, vq.astype(jnp.int8)[None, :], v_ref[0, j]
            )
            wr_s = jnp.logical_and(in_sband, active)
            kso_ref[0, j] = jnp.where(
                wr_s, k_sc, ks_ref[0, j].astype(jnp.float32)
            )
            vso_ref[0, j] = jnp.where(
                wr_s, v_sc, vs_ref[0, j].astype(jnp.float32)
            )

    scores_all = []
    for j in range(kb):  # phase: all score dots back-to-back
        scores_all.append(
            jax.lax.dot_general(
                q_ref[0, j], k_ref[0, j].astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, SBLK]
        )

    ea = []
    for j in range(kb):  # phase: all softmax updates (pure VPU)
        ks = ks_ref[0, j].astype(jnp.float32)  # [SBLK]
        scores = scores_all[j] * ks[None, :] * inv_sqrt
        scores = jnp.where(valid, scores, -1e30)
        m_prev = m_scr[j]  # [G, 1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        e = jnp.exp(scores - m_new)
        vs = vs_ref[0, j].astype(jnp.float32)
        pv = (e * vs[None, :]).astype(jnp.bfloat16)
        l_scr[j] = l_scr[j] * alpha + jnp.sum(e, axis=-1, keepdims=True)
        m_scr[j] = m_new
        ea.append((pv, alpha))

    for j in range(kb):  # phase: all pv dots + acc updates
        pv, alpha = ea[j]
        part = jnp.dot(
            pv, v_ref[0, j].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )  # [G, hd]
        acc_scr[j] = acc_scr[j] * alpha + part

    @pl.when(s == NS - 1)
    def _final():
        for j in range(kb):
            kn = kn_ref[0, j, 0].astype(jnp.float32)
            vn = vn_ref[0, j, 0].astype(jnp.float32)
            q = q_ref[0, j]
            s_new = (
                jnp.sum(
                    q.astype(jnp.float32) * kn[None, :], axis=1, keepdims=True
                )
                * inv_sqrt
            )
            s_new = jnp.where(active, s_new, -1e30)
            m_prev = m_scr[j]
            m_fin = jnp.maximum(m_prev, s_new)
            alpha = jnp.exp(m_prev - m_fin)
            e_new = jnp.exp(s_new - m_fin)
            acc = acc_scr[j] * alpha + e_new * vn[None, :]
            l = l_scr[j] * alpha + e_new
            o_ref[0, j] = (acc / l).astype(o_ref.dtype)


@partial(
    jax.jit,
    static_argnames=("window", "interpret"),
    donate_argnums=(3, 4, 5, 6),
)
def pallas_decode_attention_flash(
    q, k_new, v_new, k_c, v_c, ks_c, vs_c, pos, window: int = 0,
    interpret=False,
):
    """S-blocked online-softmax decode attention + in-place banded write.
    Same contract as pallas_decode_attention_write; the long-context
    configuration (VMEM independent of S)."""
    B, H, hd = q.shape
    KV, S = k_c.shape[1], k_c.shape[2]
    if H % KV or hd % 8:
        raise NotImplementedError("decode attention needs H % KV == 0")
    SBLK = 2048
    if S % SBLK:
        raise NotImplementedError("flash decode needs S % 2048 == 0")
    NS = S // SBLK
    G = H // KV
    q4 = q.reshape(B, KV, G, hd)
    kn = jnp.swapaxes(k_new, 1, 2)
    vn = jnp.swapaxes(v_new, 1, 2)
    kb = KV  # all heads per program; S is the streamed axis

    def ix(b, s, pos):
        return (b, 0, 0, 0)

    def ix_blk(b, s, pos):
        return (b, 0, s, 0)

    def ix_own(b, s, pos):
        return (b, 0, jnp.clip(pos[b], 0, S - 1) // SBLK, 0)

    def ix_sblk(b, s, pos):
        return (b, 0, 0, s)

    def ix_sband(b, s, pos):
        return (b, 0, 0, jnp.clip(pos[b], 0, S - 1) // SBLK)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, NS),
        in_specs=[
            pl.BlockSpec((1, kb, G, hd), ix),
            pl.BlockSpec((1, kb, 1, hd), ix),
            pl.BlockSpec((1, kb, 1, hd), ix),
            pl.BlockSpec((1, kb, SBLK, hd), ix_blk),
            pl.BlockSpec((1, kb, SBLK, hd), ix_blk),
            pl.BlockSpec((1, None, kb, SBLK), ix_sblk),
            pl.BlockSpec((1, None, kb, SBLK), ix_sblk),
        ],
        out_specs=[
            pl.BlockSpec((1, kb, G, hd), ix),
            pl.BlockSpec((1, kb, SBLK, hd), ix_own),
            pl.BlockSpec((1, kb, SBLK, hd), ix_own),
            pl.BlockSpec((1, None, kb, SBLK), ix_sband),
            pl.BlockSpec((1, None, kb, SBLK), ix_sband),
        ],
        scratch_shapes=[
            pltpu.VMEM((kb, G, hd), jnp.float32),
            pltpu.VMEM((kb, G, 1), jnp.float32),
            pltpu.VMEM((kb, G, 1), jnp.float32),
        ],
    )
    ks4 = ks_c.reshape(B, KV // kb, kb, S)
    vs4 = vs_c.reshape(B, KV // kb, kb, S)
    out, k_o, v_o, ks_o, vs_o = pl.pallas_call(
        partial(
            _decode_attn_flash_kernel,
            kb=kb, window=int(window), SBLK=SBLK, NS=NS,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, KV, G, hd), q.dtype),
            jax.ShapeDtypeStruct((B, KV, S, hd), jnp.int8),
            jax.ShapeDtypeStruct((B, KV, S, hd), jnp.int8),
            jax.ShapeDtypeStruct((B, KV // kb, kb, S), jnp.float32),
            jax.ShapeDtypeStruct((B, KV // kb, kb, S), jnp.float32),
        ],
        input_output_aliases={4: 1, 5: 2, 6: 3, 7: 4},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        pos.astype(jnp.int32), q4, kn, vn, k_c, v_c, ks4, vs4
    )
    return (
        out.reshape(B, H, hd),
        k_o,
        v_o,
        ks_o.reshape(B, KV, S),
        vs_o.reshape(B, KV, S),
    )


def _banded_stacked_kernel(pos_ref, l_ref, *refs, kb, window, SB):
    # the layer index is consumed by the BlockSpec index maps only
    _decode_attn_banded_kernel(pos_ref, *refs, kb=kb, window=window, SB=SB)


@partial(
    jax.jit,
    static_argnames=("window", "interpret"),
    donate_argnums=(3, 4, 5, 6),
)
def pallas_decode_attention_write_banded_stacked(
    q, k_new, v_new, k_all, v_all, ks_all, vs_all, pos, layer,
    window: int = 0, interpret=False,
):
    """Banded in-place write+attend against the FULL STACKED cache
    [L, B, KV, S, hd] with the layer chosen by a prefetched scalar index —
    the scan-CARRY cache form.

    Why: with the cache as scan xs/ys, XLA stages every layer's k/v slice
    through dynamic-slice + dynamic-update-slice copies each step —
    profiled at 43% of the whole B=32 decode loop (r5, 297 of 686 ms),
    more than attention or the MLP. Here the cache arrays ride the scan
    carry; this kernel reads layer `layer`'s tiles straight from HBM
    (scalar-prefetch index maps, zero staging) and writes back only the
    8-row band holding each sequence's position via input/output
    aliasing. Same math/contract as pallas_decode_attention_write_banded,
    with k_all/v_all [L, B, KV, S, hd] int8 and ks_all/vs_all
    [L, B, KV, S] f32 donated and returned updated."""
    B, H, hd = q.shape
    L, KV, S = k_all.shape[0], k_all.shape[2], k_all.shape[3]
    if H % KV or S % 8 or hd % 8:
        raise NotImplementedError("decode attention needs H%KV==0, S%8==0")
    SB = 128 if S % 128 == 0 else S
    G = H // KV
    q4 = q.reshape(B, KV, G, hd)
    kn = jnp.swapaxes(k_new, 1, 2)  # [B, KV, 1, hd]
    vn = jnp.swapaxes(v_new, 1, 2)

    kb = max(
        1, min(KV, (5 * 1024 * 1024) // max(2 * S * hd + 2 * S * 4, 1), 32)
    )
    while KV % kb:
        kb -= 1

    def ix(b, h, pos, l):
        return (b, h, 0, 0)

    def ixc(b, h, pos, l):
        return (l[0], b, h, 0, 0)

    def ixc_band(b, h, pos, l):
        return (l[0], b, h, jnp.clip(pos[b], 0, S - 1) // 8, 0)

    def ixs(b, h, pos, l):
        return (l[0], b, h, 0, 0)

    def ixs_band(b, h, pos, l):
        return (l[0], b, h, 0, jnp.clip(pos[b], 0, S - 1) // SB)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, KV // kb),
        in_specs=[
            pl.BlockSpec((1, kb, G, hd), ix),
            pl.BlockSpec((1, kb, 1, hd), ix),
            pl.BlockSpec((1, kb, 1, hd), ix),
            pl.BlockSpec((None, 1, kb, S, hd), ixc),
            pl.BlockSpec((None, 1, kb, S, hd), ixc),
            pl.BlockSpec((None, 1, None, kb, S), ixs),
            pl.BlockSpec((None, 1, None, kb, S), ixs),
            pl.BlockSpec((None, 1, kb, 8, hd), ixc_band),
            pl.BlockSpec((None, 1, kb, 8, hd), ixc_band),
            pl.BlockSpec((None, 1, None, kb, SB), ixs_band),
            pl.BlockSpec((None, 1, None, kb, SB), ixs_band),
        ],
        out_specs=[
            pl.BlockSpec((1, kb, G, hd), ix),
            pl.BlockSpec((None, 1, kb, 8, hd), ixc_band),
            pl.BlockSpec((None, 1, kb, 8, hd), ixc_band),
            pl.BlockSpec((None, 1, None, kb, SB), ixs_band),
            pl.BlockSpec((None, 1, None, kb, SB), ixs_band),
        ],
    )
    ks5 = ks_all.reshape(L, B, KV // kb, kb, S)
    vs5 = vs_all.reshape(L, B, KV // kb, kb, S)
    out, k_o, v_o, ks_o, vs_o = pl.pallas_call(
        partial(
            _banded_stacked_kernel, kb=kb, window=int(window), SB=SB
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, KV, G, hd), q.dtype),
            jax.ShapeDtypeStruct((L, B, KV, S, hd), jnp.int8),
            jax.ShapeDtypeStruct((L, B, KV, S, hd), jnp.int8),
            jax.ShapeDtypeStruct((L, B, KV // kb, kb, S), jnp.float32),
            jax.ShapeDtypeStruct((L, B, KV // kb, kb, S), jnp.float32),
        ],
        # flat input indices count the two scalar-prefetch operands
        input_output_aliases={5: 1, 6: 2, 7: 3, 8: 4},
        interpret=interpret,
    )(
        pos.astype(jnp.int32),
        jnp.asarray(layer, jnp.int32).reshape(1),
        q4,
        kn,
        vn,
        k_all,
        v_all,
        ks5,
        vs5,
        k_all,
        v_all,
        ks5,
        vs5,
    )
    return (
        out.reshape(B, H, hd),
        k_o,
        v_o,
        ks_o.reshape(L, B, KV, S),
        vs_o.reshape(L, B, KV, S),
    )


def _band_write_kernel(
    pos_ref, l_ref, kn_ref, vn_ref,
    kb_ref, vb_ref, ksb_ref, vsb_ref,
    ko_ref, vo_ref, kso_ref, vso_ref,
    *, kb, SB, S,
):
    """Quantize this step's k/v rows and write them into the 8-row band
    (and SB-lane scale band) holding each sequence's position. Pure band
    traffic; every cache operand is passed ONCE and aliased band-in →
    band-out, so XLA keeps the full arrays in place (the write+attend
    kernels' duplicate full+band operands forced whole-cache protective
    copies when the cache rode a scan carry — measured 10× at B=32)."""
    b = pl.program_id(0)
    pos = pos_ref[b]
    active = pos < S
    band = jnp.clip(pos, 0, S - 1) // 8 * 8
    sband = jnp.clip(pos, 0, S - 1) // SB * SB
    hd = kn_ref.shape[3]
    in_band = jax.lax.broadcasted_iota(jnp.int32, (8, hd), 0) == pos - band
    in_sband = (
        jax.lax.broadcasted_iota(jnp.int32, (1, SB), 1)[0] == pos - sband
    )
    for j in range(kb):
        kn = kn_ref[0, j, 0].astype(jnp.float32)  # [hd]
        vn = vn_ref[0, j, 0].astype(jnp.float32)
        k_sc = jnp.clip(jnp.max(jnp.abs(kn)) / 127.0, 1e-8, None)
        v_sc = jnp.clip(jnp.max(jnp.abs(vn)) / 127.0, 1e-8, None)
        kq = jnp.clip(jnp.round(kn / k_sc), -127, 127)
        vq = jnp.clip(jnp.round(vn / v_sc), -127, 127)
        wr = jnp.logical_and(in_band, active)
        ko_ref[0, j] = jnp.where(wr, kq.astype(jnp.int8)[None, :], kb_ref[0, j])
        vo_ref[0, j] = jnp.where(wr, vq.astype(jnp.int8)[None, :], vb_ref[0, j])
        wr_s = jnp.logical_and(in_sband, active)
        kso_ref[0, j] = jnp.where(
            wr_s, k_sc, ksb_ref[0, j].astype(jnp.float32)
        )
        vso_ref[0, j] = jnp.where(
            wr_s, v_sc, vsb_ref[0, j].astype(jnp.float32)
        )


@partial(
    jax.jit,
    static_argnames=("interpret",),
    donate_argnums=(2, 3, 4, 5),
)
def pallas_cache_band_write_stacked(
    k_new, v_new, k_all, v_all, ks_all, vs_all, pos, layer, interpret=False
):
    """Write one decode step's k/v into layer `layer` of the FULL STACKED
    cache [L, B, KV, S, hd] — in place, touching only the position bands.
    k_new/v_new [B, 1, KV, hd] (post-rope); ks_all/vs_all [L, B, KV, S]
    f32. Rows with pos ≥ S write nothing. Returns the updated arrays
    (donated)."""
    B = k_new.shape[0]
    L, KV, S = k_all.shape[0], k_all.shape[2], k_all.shape[3]
    if S % 8 or k_all.shape[4] % 8:
        raise NotImplementedError("cache band write needs S % 8 == 0")
    SB = 128 if S % 128 == 0 else S
    kn = jnp.swapaxes(k_new, 1, 2)  # [B, KV, 1, hd]
    vn = jnp.swapaxes(v_new, 1, 2)
    kb = KV

    def ix(b, pos, l):
        return (b, 0, 0, 0)

    def ixc_band(b, pos, l):
        return (l[0], b, 0, jnp.clip(pos[b], 0, S - 1) // 8, 0)

    def ixs_band(b, pos, l):
        return (l[0], b, 0, 0, jnp.clip(pos[b], 0, S - 1) // SB)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, kb, 1, k_all.shape[4]), ix),
            pl.BlockSpec((1, kb, 1, k_all.shape[4]), ix),
            pl.BlockSpec((None, 1, kb, 8, k_all.shape[4]), ixc_band),
            pl.BlockSpec((None, 1, kb, 8, k_all.shape[4]), ixc_band),
            pl.BlockSpec((None, 1, None, kb, SB), ixs_band),
            pl.BlockSpec((None, 1, None, kb, SB), ixs_band),
        ],
        out_specs=[
            pl.BlockSpec((None, 1, kb, 8, k_all.shape[4]), ixc_band),
            pl.BlockSpec((None, 1, kb, 8, k_all.shape[4]), ixc_band),
            pl.BlockSpec((None, 1, None, kb, SB), ixs_band),
            pl.BlockSpec((None, 1, None, kb, SB), ixs_band),
        ],
    )
    ks5 = ks_all.reshape(L, B, KV // kb, kb, S)
    vs5 = vs_all.reshape(L, B, KV // kb, kb, S)
    k_o, v_o, ks_o, vs_o = pl.pallas_call(
        partial(_band_write_kernel, kb=kb, SB=SB, S=S),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_all.shape, jnp.int8),
            jax.ShapeDtypeStruct(v_all.shape, jnp.int8),
            jax.ShapeDtypeStruct(ks5.shape, jnp.float32),
            jax.ShapeDtypeStruct(vs5.shape, jnp.float32),
        ],
        # each cache operand passed once: band view in, band view out,
        # full buffer aliased (prefetch operands count from 0)
        input_output_aliases={4: 0, 5: 1, 6: 2, 7: 3},
        interpret=interpret,
    )(
        pos.astype(jnp.int32),
        jnp.asarray(layer, jnp.int32).reshape(1),
        kn,
        vn,
        k_all,
        v_all,
        ks5,
        vs5,
    )
    return (
        k_o, v_o,
        ks_o.reshape(L, B, KV, S), vs_o.reshape(L, B, KV, S),
    )


def _attn_stacked_kernel(pos_ref, l_ref, *refs, bb, kb, window):
    _decode_attn_kernel(pos_ref, *refs, bb=bb, kb=kb, window=window)


@partial(jax.jit, static_argnames=("window", "interpret"))
def pallas_decode_attention_stacked(
    q, k_all, v_all, ks_all, vs_all, pos, layer, window: int = 0,
    interpret=False,
):
    """Read-only int8-cache decode attention against the FULL STACKED
    cache [L, B, KV, S, hd], layer chosen by a prefetched index — the
    attention half of the scan-carry cache path (zero staging copies;
    pair with pallas_cache_band_write_stacked). Same math as
    pallas_decode_attention."""
    B, H, hd = q.shape
    L, KV, S = k_all.shape[0], k_all.shape[2], k_all.shape[3]
    if H % KV or S % 8 or hd % 8:
        raise NotImplementedError("decode attention needs H%KV==0, S%8==0")
    G = H // KV
    q4 = q.reshape(B, KV, G, hd)
    bb, kb = _pick_blocks(B, KV, S, hd, 2 * S * hd, 2 * S * 4)

    def ix(b, h, pos, l):
        return (b, h, 0, 0)

    def ixc(b, h, pos, l):
        return (l[0], b, h, 0, 0)

    def ixs(b, h, pos, l):
        return (l[0], b, h, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // bb, KV // kb),
        in_specs=[
            pl.BlockSpec((bb, kb, G, hd), ix),
            pl.BlockSpec((None, bb, kb, S, hd), ixc),
            pl.BlockSpec((None, bb, kb, S, hd), ixc),
            pl.BlockSpec((None, bb, None, kb, S), ixs),
            pl.BlockSpec((None, bb, None, kb, S), ixs),
        ],
        out_specs=pl.BlockSpec((bb, kb, G, hd), ix),
    )

    out = pl.pallas_call(
        partial(_attn_stacked_kernel, bb=bb, kb=kb, window=int(window)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KV, G, hd), q.dtype),
        interpret=interpret,
    )(
        pos.astype(jnp.int32),
        jnp.asarray(layer, jnp.int32).reshape(1),
        q4,
        k_all,
        v_all,
        ks_all.reshape(L, B, KV // kb, kb, S),
        vs_all.reshape(L, B, KV // kb, kb, S),
    )
    return out.reshape(B, H, hd)
