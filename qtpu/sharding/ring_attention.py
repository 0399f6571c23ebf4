"""Sequence/context parallelism: ring attention over a `seq` mesh axis.

The reference has no notion of sequence parallelism (SURVEY §2.3: fixed
2048-token eval blocks) and SURVEY §5.7 scopes it out of parity — this is
the beyond-reference completion of the parallelism inventory: prefill
attention for sequences longer than one device's memory, TPU-native form
(blockwise ring: KV shards rotate around the ICI ring via `ppermute`
while each device's Q shard accumulates online-softmax partials; no
all-gather of the full sequence ever materializes).

Math (blockwise/flash form): device i holds Q_i, K_i, V_i (the sequence
axis sharded over `seq`). At ring step t it attends Q_i against the KV
shard that started on device (i − t) mod n, keeping running
(max m, denom l, accumulator acc) per query row; after n steps
out = acc / l equals exact softmax attention. Causality is enforced with
GLOBAL positions reconstructed from the shard index — shard t of KV is
masked entirely when it lies after the query shard (the blockwise
skip), so the ring does no flops on fully-masked blocks' scores beyond
the dot itself.

GQA is supported (KV heads broadcast over the query-head groups).
Collectives ride the `seq` axis ring (ICI-adjacent on TPU meshes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _local_attn_block(q, k, v, q_pos, k_pos, window: int):
    """Partial attention of q [B, Sq, H, hd] against one KV block
    [B, Sk, KV, hd] with global positions q_pos [Sq], k_pos [Sk].
    Returns (scores_max [B, H, Sq, 1], exp_sums [B, H, Sq, 1],
    acc [B, H, Sq, hd]) — unnormalized blockwise-softmax partials."""
    B, Sq, H, hd = q.shape
    KV = k.shape[2]
    if KV != H:
        rep = H // KV
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(float(hd))
    valid = k_pos[None, :] <= q_pos[:, None]  # [Sq, Sk]
    if window > 0:
        valid &= k_pos[None, :] > q_pos[:, None] - window
    scores = jnp.where(valid[None, None], scores, -1e30)
    m = jnp.max(scores, axis=-1, keepdims=True)  # [B, H, Sq, 1]
    e = jnp.exp(scores - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    acc = jnp.einsum("bhqk,bkhd->bhqd", e.astype(v.dtype), v).astype(
        jnp.float32
    )
    return m, l, acc


def _ring_body(q, k, v, n: int, axis: str, S_local: int, window: int):
    """Runs on every `seq` shard inside shard_map."""
    idx = jax.lax.axis_index(axis)
    q_pos = idx * S_local + jnp.arange(S_local)

    B, Sq, H, hd = q.shape
    m = jnp.full((B, H, Sq, 1), -1e30, jnp.float32)
    l = jnp.zeros((B, H, Sq, 1), jnp.float32)
    acc = jnp.zeros((B, H, Sq, hd), jnp.float32)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(t, carry):
        m, l, acc, k_blk, v_blk = carry
        src = (idx - t) % n  # which shard's KV this is
        k_pos = src * S_local + jnp.arange(S_local)
        bm, bl, bacc = _local_attn_block(q, k_blk, v_blk, q_pos, k_pos, window)
        m_new = jnp.maximum(m, bm)
        alpha = jnp.exp(m - m_new)
        beta = jnp.exp(bm - m_new)
        l = l * alpha + bl * beta
        acc = acc * alpha + bacc * beta
        # rotate KV to the next device for the next step (the last
        # rotation returns the shards home — harmless, keeps the loop
        # shape static)
        k_blk = jax.lax.ppermute(k_blk, axis, perm)
        v_blk = jax.lax.ppermute(v_blk, axis, perm)
        return m_new, l, acc, k_blk, v_blk

    m, l, acc, _, _ = jax.lax.fori_loop(0, n, step, (m, l, acc, k, v))
    out = acc / jnp.maximum(l, 1e-30)
    return jnp.einsum("bhqd->bqhd", out).astype(q.dtype).reshape(
        B, Sq, H * hd
    )


@partial(jax.jit, static_argnames=("mesh", "axis", "window"))
def ring_attention(q, k, v, mesh: Mesh, axis: str = "seq", window: int = 0):
    """Causal attention with the SEQUENCE axis sharded over `axis`.

    q [B, S, H, hd], k/v [B, S, KV, hd] — S sharded over mesh axis
    `axis` (equal shards); other mesh axes may shard B/heads via GSPMD.
    Returns [B, S, H·hd] with the same sequence sharding. Exact (online
    blockwise softmax), O(S_local²·n) time, O(S_local) memory per device.
    """
    try:
        from jax import shard_map
    except ImportError:  # pre-0.8 JAX
        from jax.experimental.shard_map import shard_map

    n = mesh.shape[axis]
    S = q.shape[1]
    if S % n:
        raise ValueError(f"sequence length {S} must divide over {axis}={n}")
    S_local = S // n
    spec = P(None, axis, None, None)
    # manual only over the ring axis; other mesh axes (data/model) stay
    # GSPMD-auto so batch/head shardings compose
    kw = (
        {"axis_names": frozenset({axis})}
        if len(mesh.axis_names) > 1
        else {}
    )
    fn = shard_map(
        lambda q, k, v: _ring_body(
            q, k, v, n=n, axis=axis, S_local=S_local, window=window
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=P(None, axis, None),
        check_vma=False,
        **kw,
    )
    return fn(q, k, v)
