"""KV-cache storage: bf16 or really-quantized INT8 (a serving subsystem the
reference does not have — SURVEY §0 "no serving loop, no KV-cache").

INT8 mode stores K/V as int8 with one f32 scale per (layer, batch, position,
kv-head) — per-token-per-head symmetric absmax quantization, the standard
accuracy/compression sweet spot for KV. Memory: 8 bits + 4/hd bits per
element vs 16 bf16 (≈2× KV capacity per HBM byte → ~2× max batch/context).

Layout: k/v [L, B, S_max, KV_heads, hd]; under tensor parallelism the
KV-head axis shards over the `model` mesh axis alongside the attention
heads.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class KVCache:
    k: jnp.ndarray  # [L, B, S, KV, hd] bf16 or int8
    v: jnp.ndarray
    k_scale: jnp.ndarray | None  # [L, B, S, KV] f32 (int8 mode)
    v_scale: jnp.ndarray | None
    length: jnp.ndarray  # [B] int32 — tokens filled per sequence

    def tree_flatten(self):
        return (self.k, self.v, self.k_scale, self.v_scale, self.length), ()

    @classmethod
    def tree_unflatten(cls, _, dyn):
        return cls(*dyn)

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def max_len(self) -> int:
        return self.k.shape[2]


def init_cache(
    cfg, batch: int, max_len: int, dtype=jnp.bfloat16, quantized: bool = False
) -> KVCache:
    L, KV, hd = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
    shape = (L, batch, max_len, KV, hd)
    if quantized:
        return KVCache(
            k=jnp.zeros(shape, jnp.int8),
            v=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.zeros(shape[:-1], jnp.float32),
            v_scale=jnp.zeros(shape[:-1], jnp.float32),
            length=jnp.zeros((batch,), jnp.int32),
        )
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        k_scale=None,
        v_scale=None,
        length=jnp.zeros((batch,), jnp.int32),
    )


def quantize_kv(x: jnp.ndarray):
    """[..., hd] → (int8 values, f32 scale over the trailing head dim)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.clip(absmax / 127.0, 1e-8, None)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127)
    return q.astype(jnp.int8), scale


def dequantize_kv(q: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.bfloat16):
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)


def cache_layer_write(layer_kv, new_k, new_v, start: jnp.ndarray, quantized: bool):
    """Write [B, S_new, KV, hd] keys/values into one layer's cache slices at
    position `start` (scalar or per-batch [B]). Returns updated layer_kv
    tuple (k, v, k_scale, v_scale)."""
    k_c, v_c, ks_c, vs_c = layer_kv
    if quantized:
        qk, sk = quantize_kv(new_k)
        qv, sv = quantize_kv(new_v)
        write_k, write_v = qk, qv
    else:
        write_k, write_v = new_k.astype(k_c.dtype), new_v.astype(v_c.dtype)
        sk = sv = None

    if jnp.ndim(start) == 0:
        k_c = jax.lax.dynamic_update_slice_in_dim(k_c, write_k, start, axis=1)
        v_c = jax.lax.dynamic_update_slice_in_dim(v_c, write_v, start, axis=1)
        if quantized:
            ks_c = jax.lax.dynamic_update_slice_in_dim(ks_c, sk, start, axis=1)
            vs_c = jax.lax.dynamic_update_slice_in_dim(vs_c, sv, start, axis=1)
    else:
        # per-sequence positions (continuous batching): vmap over batch
        def wr(c, w, s):
            return jax.lax.dynamic_update_slice_in_dim(c, w, s, axis=0)

        k_c = jax.vmap(wr)(k_c, write_k, start)
        v_c = jax.vmap(wr)(v_c, write_v, start)
        if quantized:
            ks_c = jax.vmap(wr)(ks_c, sk, start)
            vs_c = jax.vmap(wr)(vs_c, sv, start)
    return k_c, v_c, ks_c, vs_c
