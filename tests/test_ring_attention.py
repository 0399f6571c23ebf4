"""Sequence/context parallelism: ring attention over a `seq` mesh axis ==
single-device causal attention (exact blockwise softmax)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from qtpu.models.ops import causal_attention
from qtpu.sharding.ring_attention import ring_attention

pytestmark = pytest.mark.slow


def _qkv(B=2, S=128, H=8, KV=4, hd=32):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
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
