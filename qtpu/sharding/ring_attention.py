"""Sequence/context parallelism: ring attention over a `seq` mesh axis.

The reference has no notion of sequence parallelism (SURVEY §2.3: fixed
2048-token eval blocks) and SURVEY §5.7 scopes it out of parity — this is
the beyond-reference completion of the parallelism inventory: prefill/eval
attention for sequences longer than one device's memory, TPU-native form
(blockwise ring: KV shards rotate around the ICI ring via `ppermute`
while each device's Q shard accumulates online-softmax partials; no
all-gather of the full sequence ever materializes).

Math (blockwise/flash form): device i holds Q_i, K_i, V_i (the sequence
axis sharded over `seq`). At ring step t it attends Q_i against the KV
shard that started on device (i − t) mod n, keeping running
(max m, denom l, accumulator acc) per query row; after n steps
out = acc / l equals exact softmax attention. Within a ring step the KV
shard is consumed in `chunk`-key blocks (a second online-softmax level),
so the live score tile is [B, KV, G, S_local, chunk] — per-device memory
is O(S_local·chunk + S_local·hd), never O(S_local²). Causality skips
whole future shards (and, under a sliding window, whole expired shards)
at the compute level via `lax.cond` — the ring still rotates, the FLOPs
are not spent.

GQA keeps K/V in their [KV] head layout and contracts per group via
einsum (no H/KV-fold `jnp.repeat` materialization). Collectives ride the
`seq` axis ring (ICI-adjacent on TPU meshes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_NEG = -1e30


def _chunk_update(m, l, acc, q5, k_c, v_c, q_pos, k_pos, window: int):
    """One online-softmax update of running (m, l, acc) with a KV chunk.

    q5 [B, KV, G, Sq, hd]; k_c/v_c [B, C, KV, hd]; q_pos [Sq], k_pos [C]
    global positions. m/l [B, KV, G, Sq, 1], acc [B, KV, G, Sq, hd] (f32).
    """
    hd = q5.shape[-1]
    scores = jnp.einsum(
        "bkgqd,bckd->bkgqc", q5, k_c, preferred_element_type=jnp.float32
    ) / jnp.sqrt(float(hd))
    valid = k_pos[None, :] <= q_pos[:, None]  # [Sq, C]
    if window > 0:
        valid &= k_pos[None, :] > q_pos[:, None] - window
    scores = jnp.where(valid[None, None, None], scores, _NEG)
    bm = jnp.max(scores, axis=-1, keepdims=True)
    m_new = jnp.maximum(m, bm)
    alpha = jnp.exp(m - m_new)
    p = jnp.exp(scores - m_new)  # [B, KV, G, Sq, C]
    l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc * alpha + jnp.einsum(
        "bkgqc,bckd->bkgqd",
        p.astype(v_c.dtype),
        v_c,
        preferred_element_type=jnp.float32,
    )
    return m_new, l, acc


def _ring_body(
    q, k, v, n: int, axis: str, S_local: int, window: int, chunk: int
):
    """Runs on every `seq` shard inside shard_map. q [B, Sq, H, hd],
    k/v [B, Sk, KV, hd] (local shards)."""
    idx = jax.lax.axis_index(axis)
    q_pos = idx * S_local + jnp.arange(S_local)

    B, Sq, H, hd = q.shape
    KV = k.shape[2]
    G = H // KV
    q5 = jnp.transpose(
        q.reshape(B, Sq, KV, G, hd), (0, 2, 3, 1, 4)
    )  # [B, KV, G, Sq, hd]
    m = jnp.full((B, KV, G, Sq, 1), _NEG, jnp.float32)
    l = jnp.zeros((B, KV, G, Sq, 1), jnp.float32)
    acc = jnp.zeros((B, KV, G, Sq, hd), jnp.float32)
    perm = [(i, (i + 1) % n) for i in range(n)]
    NC = S_local // chunk

    def ring_step(t, carry):
        m, l, acc, k_blk, v_blk = carry
        src = (idx - t) % n  # which shard's KV this is
        k0 = src * S_local

        def chunk_step(c, mla):
            m, l, acc = mla
            k_c = jax.lax.dynamic_slice_in_dim(k_blk, c * chunk, chunk, 1)
            v_c = jax.lax.dynamic_slice_in_dim(v_blk, c * chunk, chunk, 1)
            k_pos = k0 + c * chunk + jnp.arange(chunk)
            return _chunk_update(m, l, acc, q5, k_c, v_c, q_pos, k_pos, window)

        # block-level skips: a shard entirely AFTER this device's queries
        # (causality), or entirely BEFORE the sliding window, contributes
        # nothing — keep the rotation, skip the flops
        skip = k0 > q_pos[-1]
        if window > 0:
            skip |= (k0 + S_local - 1) <= (idx * S_local - window)
        m, l, acc = jax.lax.cond(
            skip,
            lambda mla: mla,
            lambda mla: jax.lax.fori_loop(0, NC, chunk_step, mla),
            (m, l, acc),
        )
        # rotate KV to the next device for the next step (the last
        # rotation returns the shards home — harmless, keeps the loop
        # shape static)
        k_blk = jax.lax.ppermute(k_blk, axis, perm)
        v_blk = jax.lax.ppermute(v_blk, axis, perm)
        return m, l, acc, k_blk, v_blk

    m, l, acc, _, _ = jax.lax.fori_loop(0, n, ring_step, (m, l, acc, k, v))
    out = acc / jnp.maximum(l, 1e-30)  # [B, KV, G, Sq, hd]
    return (
        jnp.transpose(out, (0, 3, 1, 2, 4))
        .astype(q.dtype)
        .reshape(B, Sq, H * hd)
    )


def _pick_chunk(S_local: int, chunk: int | None) -> int:
    """Largest divisor of S_local that is <= the requested/default chunk."""
    c = min(S_local, 512 if chunk is None else int(chunk))
    while S_local % c:
        c -= 1
    return c


@partial(
    jax.jit, static_argnames=("mesh", "axis", "window", "chunk")
)
def ring_attention(
    q,
    k,
    v,
    mesh: Mesh,
    axis: str = "seq",
    window: int = 0,
    chunk: int | None = None,
):
    """Causal attention with the SEQUENCE axis sharded over `axis`.

    q [B, S, H, hd], k/v [B, S, KV, hd] — S sharded over mesh axis
    `axis` (equal shards); other mesh axes may shard B/heads via GSPMD.
    Returns [B, S, H·hd] with the same sequence sharding. Exact (online
    blockwise softmax at ring-step AND `chunk`-key granularity).
    O(S_local²·n) time minus skipped future shards;
    O(S_local·chunk + S_local·hd) memory per device — the full local
    score tile never materializes, so S_local is bounded by the KV/Q
    shard residency, not by a score tensor.
    """
    try:
        from jax import shard_map
    except ImportError:  # pre-0.8 JAX
        from jax.experimental.shard_map import shard_map

    n = mesh.shape[axis]
    S = q.shape[1]
    if S % n:
        raise ValueError(f"sequence length {S} must divide over {axis}={n}")
    if q.shape[2] % k.shape[2]:
        raise ValueError("H must be a multiple of KV heads")
    S_local = S // n
    c = _pick_chunk(S_local, chunk)
    spec = P(None, axis, None, None)
    # manual only over the ring axis; other mesh axes (data/model) stay
    # GSPMD-auto so batch/head shardings compose
    kw = (
        {"axis_names": frozenset({axis})}
        if len(mesh.axis_names) > 1
        else {}
    )
    body = lambda q, k, v: _ring_body(
        q, k, v, n=n, axis=axis, S_local=S_local, window=window, chunk=c
    )
    try:  # jax >= 0.8 names the replication check check_vma
        fn = shard_map(
            body,
            mesh=mesh,
            in_specs=(spec, spec, spec),
            out_specs=P(None, axis, None),
            check_vma=False,
            **kw,
        )
    except TypeError:  # older spelling
        fn = shard_map(
            body,
            mesh=mesh,
            in_specs=(spec, spec, spec),
            out_specs=P(None, axis, None),
            check_rep=False,
            **kw,
        )
    return fn(q, k, v)


@partial(
    jax.jit, static_argnames=("cfg", "mesh", "axis", "qmeta", "chunk")
)
def _seq_forward_jit(params, ids, cfg, mesh, axis, qmeta, chunk):
    from qtpu.models import forward

    attn = lambda q, k, v, window: ring_attention(
        q, k, v, mesh, axis=axis, window=window, chunk=chunk
    )
    return forward(params, ids, cfg, qmeta=qmeta, attn_impl=attn)


def seq_sharded_forward(
    params, input_ids, cfg, mesh: Mesh, axis: str = "seq", qmeta=None,
    chunk: int | None = None,
):
    """Full-sequence model forward with the sequence axis sharded over
    `axis` — prefill/eval for S beyond one device's memory.

    Runs the standard stacked-layer forward (models.llama.forward) with
    every attention replaced by ring_attention; activations stay sharded
    [B, S/n, ·] per device throughout (norms/matmuls are position-local,
    GSPMD keeps their sharding), so peak activation memory per device is
    O(S/n). Returns logits [B, S, V] sequence-sharded."""
    ids = jax.device_put(input_ids, NamedSharding(mesh, P(None, axis)))
    return _seq_forward_jit(params, ids, cfg, mesh, axis, qmeta, chunk)


def seq_sharded_nll(
    params, input_ids, cfg, mesh: Mesh, axis: str = "seq", qmeta=None,
    chunk: int | None = None,
):
    """Mean next-token NLL over one long sequence, computed with the
    seq-sharded forward (the eval entry for S beyond one chip)."""
    logits = seq_sharded_forward(
        params, input_ids, cfg, mesh, axis=axis, qmeta=qmeta, chunk=chunk
    )
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = input_ids[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)
