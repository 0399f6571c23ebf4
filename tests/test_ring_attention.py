"""Sequence/context parallelism: ring attention over a `seq` mesh axis ==
single-device causal attention (exact blockwise softmax), including the
chunked inner loop, a genuinely long sequence (32k over 8 devices), and
the seq-sharded model forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from qtpu.models.ops import causal_attention
from qtpu.sharding.ring_attention import ring_attention

pytestmark = pytest.mark.slow


def _qkv(B=2, S=128, H=8, KV=4, hd=32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, S, H, hd), jnp.float32) * 0.3
    k = jax.random.normal(ks[1], (B, S, KV, hd), jnp.float32) * 0.3
    v = jax.random.normal(ks[2], (B, S, KV, hd), jnp.float32) * 0.3
    return q, k, v


@pytest.mark.parametrize("n", [2, 4, 8])
def test_ring_matches_causal(n):
    q, k, v = _qkv()
    S = q.shape[1]
    mask = (jnp.arange(S)[None, :] <= jnp.arange(S)[:, None])[None, None]
    ref = causal_attention(q, k, v, mask)
    mesh = Mesh(np.asarray(jax.devices()[:n]).reshape(n), ("seq",))
    out = ring_attention(q, k, v, mesh, axis="seq")
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-5


@pytest.mark.parametrize("chunk", [8, 16, 64])
def test_ring_chunked_matches_causal(chunk):
    """The chunked inner loop (chunk < S_local) is exact."""
    q, k, v = _qkv(S=256)
    S = q.shape[1]
    mask = (jnp.arange(S)[None, :] <= jnp.arange(S)[:, None])[None, None]
    ref = causal_attention(q, k, v, mask)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("seq",))
    out = ring_attention(q, k, v, mesh, axis="seq", chunk=chunk)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-5


def test_ring_composes_with_data_axis():
    q, k, v = _qkv()
    S = q.shape[1]
    mask = (jnp.arange(S)[None, :] <= jnp.arange(S)[:, None])[None, None]
    ref = causal_attention(q, k, v, mask)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "seq"))
    out = ring_attention(q, k, v, mesh, axis="seq")
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-5


def test_ring_sliding_window():
    q, k, v = _qkv()
    S = q.shape[1]
    causal = jnp.arange(S)[None, :] <= jnp.arange(S)[:, None]
    band = jnp.arange(S)[None, :] > jnp.arange(S)[:, None] - 48
    ref = causal_attention(q, k, v, (causal & band)[None, None], window=48)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("seq",))
    out = ring_attention(q, k, v, mesh, axis="seq", window=48)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-5


def test_ring_rejects_uneven_split():
    q, k, v = _qkv(S=100)
    # 104 % 8 != 0 -> no even shard
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("seq",))
    with pytest.raises(ValueError):
        ring_attention(q, k, v, mesh, axis="seq")


def _blockwise_ref(q, k, v, C=512):
    """Independent single-device blockwise-softmax causal attention
    (O(S·C) memory) for long-S references where the dense [S, S] score
    tensor would not fit."""
    B, S, H, hd = q.shape
    KV = k.shape[2]
    G = H // KV
    q5 = jnp.transpose(q.reshape(B, S, KV, G, hd), (0, 2, 3, 1, 4))
    m = jnp.full((B, KV, G, S, 1), -1e30, jnp.float32)
    l = jnp.zeros((B, KV, G, S, 1), jnp.float32)
    acc = jnp.zeros((B, KV, G, S, hd), jnp.float32)
    q_pos = jnp.arange(S)

    def step(c, mla):
        m, l, acc = mla
        k_c = jax.lax.dynamic_slice_in_dim(k, c * C, C, 1)
        v_c = jax.lax.dynamic_slice_in_dim(v, c * C, C, 1)
        s = jnp.einsum(
            "bkgqd,bckd->bkgqc", q5, k_c, preferred_element_type=jnp.float32
        ) / jnp.sqrt(float(hd))
        k_pos = c * C + jnp.arange(C)
        s = jnp.where(
            (k_pos[None, :] <= q_pos[:, None])[None, None, None], s, -1e30
        )
        bm = jnp.max(s, axis=-1, keepdims=True)
        mn = jnp.maximum(m, bm)
        p = jnp.exp(s - mn)
        a = jnp.exp(m - mn)
        return (
            mn,
            l * a + jnp.sum(p, -1, keepdims=True),
            acc * a
            + jnp.einsum(
                "bkgqc,bckd->bkgqd",
                p.astype(v_c.dtype),
                v_c,
                preferred_element_type=jnp.float32,
            ),
        )

    m, l, acc = jax.lax.fori_loop(0, S // C, step, (m, l, acc))
    out = acc / jnp.maximum(l, 1e-30)
    return (
        jnp.transpose(out, (0, 3, 1, 2, 4)).astype(q.dtype).reshape(B, S, H * hd)
    )


def test_ring_32k_long_sequence():
    """S=32768 over 8 devices: equality against an independent blockwise
    reference, and per-device temp memory stays O(S_local·chunk) — far
    below the O(S_local²) score tensor the pre-r5 implementation
    materialized."""
    B, S, H, KV, hd = 1, 32768, 2, 1, 32
    n, chunk = 8, 512
    # the blockwise reference itself is validated against dense attention
    # at a dense-feasible S first
    qs, ks_, vs = _qkv(B=1, S=1024, H=H, KV=KV, hd=hd, seed=2)
    mask = (jnp.arange(1024)[None, :] <= jnp.arange(1024)[:, None])[None, None]
    dense = causal_attention(qs, ks_, vs, mask)
    blk = _blockwise_ref(qs, ks_, vs, C=256)
    assert float(jnp.max(jnp.abs(blk - dense))) < 1e-5

    q, k, v = _qkv(B=B, S=S, H=H, KV=KV, hd=hd, seed=3)
    ref = jax.jit(_blockwise_ref, static_argnames=("C",))(q, k, v, C=2048)
    mesh = Mesh(np.asarray(jax.devices()[:n]).reshape(n), ("seq",))
    out = ring_attention(q, k, v, mesh, axis="seq", chunk=chunk)
    assert float(jnp.max(jnp.abs(out - ref))) < 2e-5

    # peak-memory accounting from the compiled executable: temp buffers
    # must be far below one device's dense score tile
    # (S_local² = 4096² f32 = 64 MB per (B·H))
    lowered = ring_attention.lower(
        q, k, v, mesh=mesh, axis="seq", window=0, chunk=chunk
    )
    try:
        mem = lowered.compile().memory_analysis()
        temp = getattr(mem, "temp_size_in_bytes", None)
    except Exception:
        temp = None
    if temp is not None:
        S_local = S // n
        dense_tile = B * H * S_local * S_local * 4
        assert temp < dense_tile // 2, (
            f"temp {temp} should be far below the dense score tile "
            f"{dense_tile}"
        )


def test_seq_sharded_forward_matches_plain():
    """The seq-sharded model forward (ring attention inside the standard
    stacked-layer forward) == the plain single-device forward."""
    from qtpu.models import TINY_TEST, forward, init_params
    from qtpu.sharding.ring_attention import (
        seq_sharded_forward,
        seq_sharded_nll,
    )

    cfg = TINY_TEST
    params = init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 128), 0, cfg.vocab_size)
    ref = forward(params, ids, cfg)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("seq",))
    out = seq_sharded_forward(params, ids, cfg, mesh)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert err / scale < 2e-2, (err, scale)

    nll = seq_sharded_nll(params, ids, cfg, mesh)
    logp = jax.nn.log_softmax(ref[:, :-1].astype(jnp.float32), -1)
    ref_nll = float(
        jnp.mean(
            -jnp.take_along_axis(logp, ids[:, 1:][..., None], -1)[..., 0]
        )
    )
    assert abs(float(nll) - ref_nll) < 5e-3, (float(nll), ref_nll)
