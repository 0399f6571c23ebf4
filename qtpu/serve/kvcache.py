"""KV-cache storage: bf16 or really-quantized INT8 (a serving subsystem the
reference does not have — SURVEY §0 "no serving loop, no KV-cache").

INT8 mode stores K/V as int8 with one f32 scale per (layer, batch, kv-head,
position) — per-token-per-head symmetric absmax quantization, the standard
accuracy/compression sweet spot for KV. Memory: 8 bits + 4/hd bits per
element vs 16 bf16 (≈2× KV capacity per HBM byte → ~2× max batch/context).

Layout: k/v [L, B, KV_heads, S_max, hd] — KV-head-major so one head's whole
sequence is a contiguous [S, hd] tile, which is what the Pallas int8
decode-attention kernel blocks on (an S-minor layout would put the 4-wide
KV axis in the sublane position, below the TPU tile floor). Under tensor
parallelism the KV-head axis shards over the `model` mesh axis alongside
the attention heads.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class KVCache:
    """Two storage formats:

    * stacked (default): k/v are single [L, B, KV, S, hd] arrays — the
      layout the layer-scan forward consumes as scan xs/ys.
    * per-layer (per_layer=True): k/v are TUPLES of L [B, KV, S, hd]
      arrays — each layer's cache is its own XLA buffer, updated
      functionally by that layer's attention kernel with no scan xs
      slice / ys stack in between. Requires the unrolled-layer forward.
      This is the LONG-CONTEXT format: standalone buffers are what the
      S-blocked flash decode kernel updates in place (one 2048-row block
      written per step — kernels.pallas_kv_attention). At short S the
      stacked layout wins end-to-end (r4 engine A/B on v5e: 867 vs
      554 tok/s mixed load — the layer scan amortizes launch overhead
      the unrolled forward pays L times, outweighing its cache staging).
    """

    k: object  # [L, B, KV, S, hd] bf16/int8, or tuple of L [B, KV, S, hd]
    v: object
    k_scale: object | None  # [L, B, KV, S] f32 (int8 mode) or tuple
    v_scale: object | None
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
    def per_layer(self) -> bool:
        return isinstance(self.k, (tuple, list))

    @property
    def num_layers(self) -> int:
        return len(self.k) if self.per_layer else self.k.shape[0]

    @property
    def max_len(self) -> int:
        return self.k[0].shape[2] if self.per_layer else self.k.shape[3]

    def layer(self, l):
        """(k, v, k_scale, v_scale) of layer l (index static for tuples)."""
        sel = lambda c: None if c is None else c[l]
        return sel(self.k), sel(self.v), sel(self.k_scale), sel(self.v_scale)


def init_cache(
    cfg,
    batch: int,
    max_len: int,
    dtype=jnp.bfloat16,
    quantized: bool = False,
    per_layer: bool = False,
) -> KVCache:
    L, KV, hd = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
    max_len = max_len + (-max_len) % 8  # sublane-aligned S for kernels
    shape = (batch, KV, max_len, hd)

    def alloc(shp, dt):
        if per_layer:
            return tuple(jnp.zeros(shp, dt) for _ in range(L))
        return jnp.zeros((L,) + shp, dt)

    if quantized:
        return KVCache(
            k=alloc(shape, jnp.int8),
            v=alloc(shape, jnp.int8),
            k_scale=alloc(shape[:-1], jnp.float32),
            v_scale=alloc(shape[:-1], jnp.float32),
            length=jnp.zeros((batch,), jnp.int32),
        )
    return KVCache(
        k=alloc(shape, dtype),
        v=alloc(shape, dtype),
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
    """Write new keys/values [B, T, KV, hd] into one layer's cache
    ([B, KV, S, hd] layout) at per-sequence positions `start` [B] (or a
    scalar). Returns updated (k, v, k_scale, v_scale)."""
    k_c, v_c, ks_c, vs_c = layer_kv
    if quantized:
        qk, sk = quantize_kv(new_k)  # [B, T, KV, hd], [B, T, KV]
        qv, sv = quantize_kv(new_v)
        write_k, write_v = qk, qv
    else:
        write_k, write_v = new_k.astype(k_c.dtype), new_v.astype(v_c.dtype)
        sk = sv = None

    # [B, T, KV, ...] → cache layout [B, KV, T, ...]
    write_k = jnp.swapaxes(write_k, 1, 2)
    write_v = jnp.swapaxes(write_v, 1, 2)
    if quantized:
        sk = jnp.swapaxes(sk, 1, 2)
        sv = jnp.swapaxes(sv, 1, 2)

    if jnp.ndim(start) == 0:
        start = jnp.full((k_c.shape[0],), start, jnp.int32)

    T = write_k.shape[2]
    if T == 1:
        # Decode hot path: a vmapped dynamic_update_slice with per-sequence
        # starts lowers to an XLA scatter — measured 68 µs/layer on v5e
        # (the LARGEST per-layer cost of a decode step, above attention and
        # all four packed matmuls combined). A masked select writes the one
        # new row as a fused elementwise pass over the cache instead
        # (positions ≥ S silently don't write; serving sizes the cache so
        # live positions are always < S).
        hit = jnp.arange(k_c.shape[2])[None, :] == start[:, None]  # [B, S]
        row = hit[:, None, :, None]
        k_c = jnp.where(row, write_k, k_c)
        v_c = jnp.where(row, write_v, v_c)
        if quantized:
            ks_c = jnp.where(hit[:, None, :], sk, ks_c)
            vs_c = jnp.where(hit[:, None, :], sv, vs_c)
        return k_c, v_c, ks_c, vs_c

    # rows with start ≥ S are INACTIVE (the same convention as the T = 1
    # masked write): a plain dynamic_update_slice would clamp the start
    # and corrupt the tail of an inactive row's cache, so those rows keep
    # their old contents. Active rows use in-place DUS (per-row traffic
    # only); the select is per-row too, so inactive rows cost one copy of
    # themselves — the batched-prefill caller gathers only the rows it
    # prefills, so this stays O(rows-written), not O(full cache).
    S = k_c.shape[2]
    active = start < S

    def wr(c, w, s, a):  # c [KV, S, ...], w [KV, T, ...]
        upd = jax.lax.dynamic_update_slice_in_dim(c, w, s, axis=1)
        return jnp.where(a, upd, c)

    k_c = jax.vmap(wr)(k_c, write_k, start, active)
    v_c = jax.vmap(wr)(v_c, write_v, start, active)
    if quantized:
        ks_c = jax.vmap(wr)(ks_c, sk, start, active)
        vs_c = jax.vmap(wr)(vs_c, sv, start, active)
    return k_c, v_c, ks_c, vs_c
