"""Functional GPT-2 family decoder (LayerNorm+bias, learned positions,
fused QKV, GELU MLP) — second architecture family, same conventions as
qtpu.models.llama: stacked layer params, lax.scan over layers, capture
modes returning per-channel stats instead of hooks, [in, out] linears
(with biases, which llama lacks).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from qtpu.models.config import ModelConfig
from qtpu.models.ops import (
    causal_attention,
    channel_stats,
    input_hessian,
    layer_norm,
    linear,
)

LAYER_SITES = ("c_attn", "attn_out", "mlp_fc", "mlp_proj")
INPUT_SITES = ("attn_in", "o_in", "mlp_in", "proj_in", "head_in")
SITE_OF_INPUT = {
    "attn_in": ("c_attn",),
    "o_in": ("attn_out",),
    "mlp_in": ("mlp_fc",),
    "proj_in": ("mlp_proj",),
    "head_in": ("lm_head",),
}

# tensor parallelism: these sites shard their INPUT dim (row-parallel,
# XLA psums the partial outputs); all other sites shard the output dim
ROW_PARALLEL_SITES = ("attn_out", "mlp_proj")


def init_params(cfg: ModelConfig, key, dtype=jnp.bfloat16) -> dict:
    k = jax.random.split(key, 8)
    D, F, V, L, P = (
        cfg.hidden_size,
        cfg.intermediate_size,
        cfg.vocab_size,
        cfg.num_layers,
        cfg.max_seq_len,
    )

    def w(key, *shape, scale=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    embed = w(k[0], V, D)
    params = {
        "embed": embed,
        "pos_embed": w(k[1], P, D),
        "layers": {
            "ln1_w": jnp.ones((L, D), dtype),
            "ln1_b": jnp.zeros((L, D), dtype),
            "ln2_w": jnp.ones((L, D), dtype),
            "ln2_b": jnp.zeros((L, D), dtype),
            "c_attn": {"w": w(k[2], L, D, 3 * D), "b": jnp.zeros((L, 3 * D), dtype)},
            "attn_out": {"w": w(k[3], L, D, D), "b": jnp.zeros((L, D), dtype)},
            "mlp_fc": {"w": w(k[4], L, D, F), "b": jnp.zeros((L, F), dtype)},
            "mlp_proj": {"w": w(k[5], L, F, D), "b": jnp.zeros((L, D), dtype)},
        },
        "final_norm_w": jnp.ones((D,), dtype),
        "final_norm_b": jnp.zeros((D,), dtype),
        # GPT-2 ties lm_head to the embedding; keep an explicit site so it
        # can be quantized independently (reference quantizes every Linear)
        "lm_head": {"w": embed.T},
    }
    return params


def _collect(x, capture):
    mean_abs, max_abs = channel_stats(x)
    out = {"mean_abs": mean_abs, "max_abs": max_abs}
    if capture == "hessian":
        out["hessian"] = input_hessian(x)
    return out


def _layer_fwd(x, lp, cfg: ModelConfig, mask, capture, qmeta):
    B, S, D = x.shape
    H, hd = cfg.num_heads, cfg.head_dim
    stats = {}
    qm = (lambda s: None) if qmeta is None else (lambda s: qmeta.get(s))

    h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], cfg.norm_eps)
    if capture != "none":
        stats["attn_in"] = _collect(h, capture)
    qkv = linear(h, lp["c_attn"], qm("c_attn"))  # [B,S,3D]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, S, H, hd)
    k = k.reshape(B, S, H, hd)
    v = v.reshape(B, S, H, hd)
    attn = causal_attention(q, k, v, mask)
    if capture != "none":
        stats["o_in"] = _collect(attn, capture)
    x = x + linear(attn, lp["attn_out"], qm("attn_out"))

    h = layer_norm(x, lp["ln2_w"], lp["ln2_b"], cfg.norm_eps)
    if capture != "none":
        stats["mlp_in"] = _collect(h, capture)
    a = jax.nn.gelu(
        linear(h, lp["mlp_fc"], qm("mlp_fc")).astype(jnp.float32), approximate=True
    ).astype(x.dtype)
    if capture != "none":
        stats["proj_in"] = _collect(a, capture)
    x = x + linear(a, lp["mlp_proj"], qm("mlp_proj"))
    return x, (stats if capture != "none" else None)


def _layer_fwd_cached(x, lp, layer_kv, start, mask, cfg: ModelConfig, qmeta):
    """One GPT-2 layer with KV-cache read/write (same contract as
    qtpu.models.llama._layer_fwd_cached)."""
    from qtpu.models.llama import _cached_attention
    from qtpu.serve.kvcache import cache_layer_write

    B, T, D = x.shape
    H, hd = cfg.num_heads, cfg.head_dim
    qm = (lambda s: None) if qmeta is None else (lambda s: qmeta.get(s))
    quantized = layer_kv[2] is not None

    h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], cfg.norm_eps)
    qkv = linear(h, lp["c_attn"], qm("c_attn"))
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, T, H, hd)
    k = k.reshape(B, T, H, hd)
    v = v.reshape(B, T, H, hd)
    layer_kv = cache_layer_write(layer_kv, k, v, start, quantized)
    attn = _cached_attention(q, layer_kv, mask, cfg)
    x = x + linear(attn, lp["attn_out"], qm("attn_out"))

    h = layer_norm(x, lp["ln2_w"], lp["ln2_b"], cfg.norm_eps)
    a = jax.nn.gelu(
        linear(h, lp["mlp_fc"], qm("mlp_fc")).astype(jnp.float32), approximate=True
    ).astype(x.dtype)
    x = x + linear(a, lp["mlp_proj"], qm("mlp_proj"))
    return x, layer_kv


@partial(jax.jit, static_argnames=("cfg", "qmeta"))
def forward_with_cache(params, input_ids, positions, cache, cfg: ModelConfig, qmeta=None):
    """Incremental GPT-2 forward for serving (prefill + decode)."""
    from qtpu.serve.kvcache import KVCache

    qmeta_d = dict(qmeta) if qmeta is not None else None
    B, T = input_ids.shape
    S = cache.max_len
    x = (params["embed"][input_ids] + params["pos_embed"][positions]).astype(
        params["embed"].dtype
    )
    kpos = jnp.arange(S)
    mask = kpos[None, None, :] <= positions[:, :, None]
    start = positions[:, 0]

    def body(x, xs):
        lp, kc, vc, ksc, vsc = xs
        x, layer_kv = _layer_fwd_cached(
            x, lp, (kc, vc, ksc, vsc), start, mask, cfg, qmeta_d
        )
        return x, layer_kv

    x, (k_new, v_new, ks_new, vs_new) = jax.lax.scan(
        body, x, (params["layers"], cache.k, cache.v, cache.k_scale, cache.v_scale)
    )
    x = layer_norm(x, params["final_norm_w"], params["final_norm_b"], cfg.norm_eps)
    qmh = None if qmeta_d is None else qmeta_d.get("lm_head")
    logits = linear(x, params["lm_head"], qmh).astype(jnp.float32)
    new_cache = KVCache(
        k=k_new,
        v=v_new,
        k_scale=ks_new,
        v_scale=vs_new,
        length=jnp.maximum(cache.length, positions[:, -1] + 1),
    )
    return logits, new_cache


@partial(jax.jit, static_argnames=("cfg", "capture", "qmeta"))
def forward(
    params: dict,
    input_ids: jnp.ndarray,
    cfg: ModelConfig,
    capture: str = "none",
    qmeta=None,
):
    qmeta_d = dict(qmeta) if qmeta is not None else None
    B, S = input_ids.shape
    t0 = (input_ids[0, 0] * 0).astype(jnp.int32)
    positions = jnp.arange(S) + t0  # traced → no baked [S,S] constants
    x = (
        params["embed"][input_ids] + params["pos_embed"][positions][None]
    ).astype(params["embed"].dtype)
    mask = (jnp.arange(S)[None, :] <= positions[:, None])[None, None, :, :]

    def body(x, lp):
        return _layer_fwd(x, lp, cfg, mask, capture, qmeta_d)

    x, layer_stats = jax.lax.scan(body, x, params["layers"])
    x = layer_norm(x, params["final_norm_w"], params["final_norm_b"], cfg.norm_eps)
    qmh = None if qmeta_d is None else qmeta_d.get("lm_head")
    logits = linear(x, params["lm_head"], qmh).astype(jnp.float32)
    if capture == "none":
        return logits
    layer_stats = dict(layer_stats)
    layer_stats["head_in"] = _collect(x, capture)
    return logits, layer_stats
