"""Functional OPT family decoder (pre-LN, learned positions with HF's
offset-2 convention, separate Q/K/V/out projections with biases, ReLU MLP)
— third architecture family; same conventions as qtpu.models.llama.
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

LAYER_SITES = ("q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2")
INPUT_SITES = ("attn_in", "o_in", "mlp_in", "fc2_in", "head_in")
SITE_OF_INPUT = {
    "attn_in": ("q_proj", "k_proj", "v_proj"),
    "o_in": ("out_proj",),
    "mlp_in": ("fc1",),
    "fc2_in": ("fc2",),
    "head_in": ("lm_head",),
}

# tensor parallelism: these sites shard their INPUT dim (row-parallel,
# XLA psums the partial outputs); all other sites shard the output dim
ROW_PARALLEL_SITES = ("out_proj", "fc2")

# HF OPT's learned positional embedding indexes position + 2
# (modeling_opt.OPTLearnedPositionalEmbedding)
POS_OFFSET = 2


def init_params(cfg: ModelConfig, key, dtype=jnp.bfloat16) -> dict:
    k = jax.random.split(key, 10)
    D, F, V, L, P = (
        cfg.hidden_size,
        cfg.intermediate_size,
        cfg.vocab_size,
        cfg.num_layers,
        cfg.max_seq_len + POS_OFFSET,
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
            "q_proj": {"w": w(k[2], L, D, D), "b": jnp.zeros((L, D), dtype)},
            "k_proj": {"w": w(k[3], L, D, D), "b": jnp.zeros((L, D), dtype)},
            "v_proj": {"w": w(k[4], L, D, D), "b": jnp.zeros((L, D), dtype)},
            "out_proj": {"w": w(k[5], L, D, D), "b": jnp.zeros((L, D), dtype)},
            "fc1": {"w": w(k[6], L, D, F), "b": jnp.zeros((L, F), dtype)},
            "fc2": {"w": w(k[7], L, F, D), "b": jnp.zeros((L, D), dtype)},
        },
        "final_norm_w": jnp.ones((D,), dtype),
        "final_norm_b": jnp.zeros((D,), dtype),
        "lm_head": {"w": embed.T},
    }
    return params


def _collect(x, capture):
    mean_abs, max_abs = channel_stats(x)
    out = {"mean_abs": mean_abs, "max_abs": max_abs}
    if capture == "hessian":
        out["hessian"] = input_hessian(x)
    return out


def _qkv(h, lp, cfg: ModelConfig, qm):
    """Q/K/V projections; a fused "qkv_proj" packed site (see
    quant.apply.fuse_packed_sites) runs one wide matmul and splits.
    OPT is MHA (no GQA), so the three slices are all [.., D]."""
    B, T = h.shape[:2]
    H, hd = cfg.num_heads, cfg.head_dim
    D = H * hd
    if "qkv_proj" in lp:
        qkv = linear(h, lp["qkv_proj"], qm("qkv_proj"))
        q, k, v = jnp.split(qkv, [D, 2 * D], axis=-1)
    else:
        q = linear(h, lp["q_proj"], qm("q_proj"))
        k = linear(h, lp["k_proj"], qm("k_proj"))
        v = linear(h, lp["v_proj"], qm("v_proj"))
    return (
        q.reshape(B, T, H, hd),
        k.reshape(B, T, H, hd),
        v.reshape(B, T, H, hd),
    )


def _layer_fwd(x, lp, cfg: ModelConfig, mask, capture, qmeta):
    B, S, D = x.shape
    H, hd = cfg.num_heads, cfg.head_dim
    stats = {}
    qm = (lambda s: None) if qmeta is None else (lambda s: qmeta.get(s))

    h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], cfg.norm_eps)
    if capture != "none":
        stats["attn_in"] = _collect(h, capture)
    q, k, v = _qkv(h, lp, cfg, qm)
    attn = causal_attention(q, k, v, mask)
    if capture != "none":
        stats["o_in"] = _collect(attn, capture)
    x = x + linear(attn, lp["out_proj"], qm("out_proj"))

    h = layer_norm(x, lp["ln2_w"], lp["ln2_b"], cfg.norm_eps)
    if capture != "none":
        stats["mlp_in"] = _collect(h, capture)
    a = jnp.maximum(linear(h, lp["fc1"], qm("fc1")), 0)  # ReLU
    if capture != "none":
        stats["fc2_in"] = _collect(a, capture)
    x = x + linear(a, lp["fc2"], qm("fc2"))
    return x, (stats if capture != "none" else None)


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
    pos = positions + POS_OFFSET
    x = (params["embed"][input_ids] + params["pos_embed"][pos][None]).astype(
        params["embed"].dtype
    )
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


def _layer_fwd_cached(x, lp, layer_kv, start, mask, cfg: ModelConfig, qmeta):
    from qtpu.models.llama import _cached_attention
    from qtpu.serve.kvcache import cache_layer_write

    B, T, D = x.shape
    H, hd = cfg.num_heads, cfg.head_dim
    qm = (lambda s: None) if qmeta is None else (lambda s: qmeta.get(s))
    quantized = layer_kv[2] is not None

    h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], cfg.norm_eps)
    q, k, v = _qkv(h, lp, cfg, qm)
    layer_kv = cache_layer_write(layer_kv, k, v, start, quantized)
    attn = _cached_attention(q, layer_kv, mask, cfg)
    x = x + linear(attn, lp["out_proj"], qm("out_proj"))

    h = layer_norm(x, lp["ln2_w"], lp["ln2_b"], cfg.norm_eps)
    a = jnp.maximum(linear(h, lp["fc1"], qm("fc1")), 0)
    x = x + linear(a, lp["fc2"], qm("fc2"))
    return x, layer_kv


@partial(jax.jit, static_argnames=("cfg", "qmeta"))
def forward_with_cache(params, input_ids, positions, cache, cfg: ModelConfig, qmeta=None):
    """Incremental OPT forward for serving (prefill + decode)."""
    from qtpu.serve.kvcache import KVCache

    qmeta_d = dict(qmeta) if qmeta is not None else None
    B, T = input_ids.shape
    S = cache.max_len
    x = (
        params["embed"][input_ids]
        + params["pos_embed"][positions + POS_OFFSET]
    ).astype(params["embed"].dtype)
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
