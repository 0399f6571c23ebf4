"""Mixtral-style sparse-MoE decoder (llama attention + routed SwiGLU experts).

The reference reaches MoE checkpoints through AutoModelForCausalLM
(quantization_utils.py:48-89) and its hooks quantize every nn.Linear —
including each expert's w1/w2/w3 and the router (quantization_utils.py:
238-245). Here the expert weights are stacked [L, E, ...] pytree leaves, the
router is a normal linear site, and routing is the dense "soft dispatch"
form: every expert runs on every token and the top-k routing weights (zero
elsewhere) combine the outputs. That trades FLOPs (E/k overcompute) for a
fully static, MXU-shaped einsum with no gather/scatter — and it is exactly
the form expert parallelism wants: shard the E axis over the mesh's `model`
axis and the combine contraction becomes one psum (each device computes only
its local experts; no token all-to-all).

Calibration is reference-faithful for the experts: a torch hook on expert e
sees only the tokens routed to it, so the captured `exp_down_in` statistics
are masked by the routing decision (per-expert mean/max over routed tokens
only), shaped [E, C] per layer.

Attention (RMSNorm/RoPE/GQA, KV cache, sliding window) is shared with
qtpu.models.llama.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from qtpu.models.config import ModelConfig
from qtpu.models.llama import _cached_attention, _collect, _qkv
from qtpu.models.ops import (
    apply_rope,
    causal_attention,
    linear,
    rms_norm,
    rope_tables,
)

LAYER_SITES = (
    "q_proj",
    "k_proj",
    "v_proj",
    "o_proj",
    "router",
    "exp_gate",
    "exp_up",
    "exp_down",
    # Qwen2-MoE only (absent on Mixtral models — consumers skip absent
    # sites): the always-on shared expert and its sigmoid gate
    "sh_gate",
    "sh_up",
    "sh_down",
    "sh_router",
)
INPUT_SITES = (
    "attn_in", "o_in", "mlp_in", "exp_down_in", "sh_down_in", "head_in"
)
SITE_OF_INPUT = {
    "attn_in": ("q_proj", "k_proj", "v_proj"),
    "o_in": ("o_proj",),
    "mlp_in": ("router", "exp_gate", "exp_up", "sh_gate", "sh_up", "sh_router"),
    "exp_down_in": ("exp_down",),
    "sh_down_in": ("sh_down",),
    "head_in": ("lm_head",),
}
ROW_PARALLEL_SITES = ("o_proj", "sh_down")
# sites with a [L, E, ...] expert axis: quantizers flatten L·E, the mesh
# shards E over `model` (expert parallelism)
EXPERT_SITES = ("exp_gate", "exp_up", "exp_down")
# input sites whose stats carry a per-expert axis ([.., L, E, C])
EXPERT_INPUT_SITES = ("exp_down_in",)
# the router ([D, E], E ~ 8-64) and the shared-expert sigmoid gate
# ([D, 1]) are far too narrow for the MXU-tiled packed kernels and
# negligible in size — pack_model keeps them dense
PACK_DENSE_SITES = ("router", "sh_router")


def init_params(cfg: ModelConfig, key, dtype=jnp.bfloat16) -> dict:
    """Random-init MoE params; same layout contract as llama.init_params
    plus router [L, D, E] and expert sites [L, E, ...]."""
    assert cfg.num_experts > 1, "arch='moe' needs num_experts > 1"
    k = jax.random.split(key, 20)
    D, F, V, L, E = (
        cfg.hidden_size,
        cfg.intermediate_size,
        cfg.vocab_size,
        cfg.num_layers,
        cfg.num_experts,
    )
    Q, KV = cfg.q_dim, cfg.kv_dim

    def w(key, *shape, scale=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    params = {
        "embed": w(k[0], V, D),
        "layers": {
            "attn_norm": jnp.ones((L, D), dtype),
            "mlp_norm": jnp.ones((L, D), dtype),
            "q_proj": {"w": w(k[1], L, D, Q)},
            "k_proj": {"w": w(k[2], L, D, KV)},
            "v_proj": {"w": w(k[3], L, D, KV)},
            "o_proj": {"w": w(k[4], L, Q, D)},
            "router": {"w": w(k[5], L, D, E)},
            "exp_gate": {"w": w(k[6], L, E, D, F)},
            "exp_up": {"w": w(k[7], L, E, D, F)},
            "exp_down": {"w": w(k[8], L, E, F, D)},
        },
        "final_norm": jnp.ones((D,), dtype),
        "lm_head": {"w": w(k[9], D, V)},
    }
    Fs = cfg.shared_expert_intermediate_size
    if Fs > 0:  # Qwen2-MoE shared expert + sigmoid gate
        params["layers"]["sh_gate"] = {"w": w(k[10], L, D, Fs)}
        params["layers"]["sh_up"] = {"w": w(k[11], L, D, Fs)}
        params["layers"]["sh_down"] = {"w": w(k[12], L, Fs, D)}
        params["layers"]["sh_router"] = {"w": w(k[13], L, D, 1)}
    if cfg.attention_bias:  # Qwen2: bias on q/k/v only
        for kk, (site, n) in zip(
            k[16:19], (("q_proj", Q), ("k_proj", KV), ("v_proj", KV))
        ):
            params["layers"][site]["b"] = w(kk, L, n)
    return params


def _expert_matmul(x, p: dict, meta, per_expert_input: bool, layer=None):
    """x [B,S,K] (shared input) or [B,S,E,K] (per-expert input) against an
    expert site [E, K, N] (or layer-stacked [L, E, K, N] with `layer` a
    traced index) → [B,S,E,N]. SmoothQuant/AWQ "smooth" input vectors are
    per expert [E, K].

    Dense sites run one einsum over E. Packed affine sites run ONE grouped
    Pallas launch for all E experts (kernels.pallas_moe_matmul, grid over
    (E, M, N) tiles) so every expert's weights stream from HBM exactly
    once per step at packed width — dense soft-dispatch touches every
    expert's weights each step, so NOT materializing them in bf16 is the
    whole bandwidth story. Codebook/W8A8/perm expert variants fall back to
    one fused call per expert through ops.linear (E is static and small;
    in-jit launches are cheap)."""
    if "w" in p:
        w = p["w"] if layer is None else p["w"][layer]  # [E, K, N]
        if "smooth" in p:
            s = p["smooth"] if layer is None else p["smooth"][layer]
            x = (x[..., None, :] if not per_expert_input else x) * s.astype(
                x.dtype
            )
            per_expert_input = True
        if per_expert_input:
            return jnp.einsum("bsek,ekn->bsen", x, w.astype(x.dtype))
        return jnp.einsum("bsk,ekn->bsen", x, w.astype(x.dtype))

    if "smooth" in p:
        s = p["smooth"] if layer is None else p["smooth"][layer]  # [E, K]
        x = (x[..., None, :] if not per_expert_input else x) * s.astype(x.dtype)
        per_expert_input = True
        p = {k: v for k, v in p.items() if k != "smooth"}

    B, S = x.shape[:2]
    E = p["data"].shape[1] if p["data"].ndim == 4 else p["data"].shape[0]
    grouped_ok = (
        meta is not None
        and len(meta) == 4
        and "codebook" not in p
        and "perm" not in p
        and jax.default_backend() == "tpu"
    )
    if grouped_ok:
        try:
            from qtpu.kernels.pallas_moe_matmul import pallas_moe_quantized_matmul

            K = meta[2]
            x2 = (
                jnp.moveaxis(x, 2, 0).reshape(E, B * S, K)
                if per_expert_input
                else x.reshape(B * S, K)
            )
            out = pallas_moe_quantized_matmul(
                x2,
                p["data"],
                p["scales"],
                p.get("zeros"),
                meta,
                layer=layer,
                per_expert_input=per_expert_input,
            )  # [E, B·S, N]
            return jnp.moveaxis(out.reshape(E, B, S, -1), 0, 2)
        except NotImplementedError:
            pass

    if layer is not None:
        p = jax.tree_util.tree_map(lambda a: a[layer], p)
    outs = []
    for e in range(E):
        pe = jax.tree_util.tree_map(lambda a: a[e], p)
        xe = x[..., e, :] if per_expert_input else x
        outs.append(linear(xe, pe, meta))
    return jnp.stack(outs, axis=2)


def _routing_weights(h, lp, cfg: ModelConfig, qm, layer=None):
    """Dense [B,S,E] combine weights (zeros outside each token's top-k) —
    the Mixtral router: full softmax over E, top-k, optional renorm."""
    logits = linear(h, lp["router"], qm("router"), layer=layer).astype(
        jnp.float32
    )
    probs = jax.nn.softmax(logits, axis=-1)  # [B,S,E]
    topv, topi = jax.lax.top_k(probs, cfg.num_experts_per_tok)
    if cfg.norm_topk_prob:
        topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
    onehot = jax.nn.one_hot(topi, cfg.num_experts, dtype=probs.dtype)
    return jnp.einsum("bsk,bske->bse", topv, onehot)


def _routed_stats(act, route_w, capture: str):
    """Per-expert input stats over ROUTED tokens only — what a torch hook
    on expert e's down-projection would see. act [B,S,E,F], route_w
    [B,S,E] → stats arrays [E, F] (hessian [E, F, F])."""
    m = (route_w > 0).astype(jnp.float32)  # [B,S,E]
    a = jnp.abs(act.astype(jnp.float32)) * m[..., None]
    cnt = jnp.maximum(jnp.sum(m, axis=(0, 1)), 1.0)  # [E]
    out = {
        "mean_abs": jnp.sum(a, axis=(0, 1)) / cnt[:, None],
        "max_abs": jnp.max(a, axis=(0, 1)),
    }
    if capture == "hessian":
        xm = act.astype(jnp.float32) * m[..., None]
        out["hessian"] = jnp.einsum("bsef,bseg->efg", xm, xm)
    return out


def _moe_mlp_gathered(h, lp, cfg: ModelConfig, qm, layer):
    """Decode-time CAPACITY-GATHERED expert MLP — one kernel slot per
    routed (token, expert) pair, weights delivered by scalar-prefetch
    expert index (kernels.pallas_moe_gathered_matmul).

    The latency regime dense soft-dispatch cannot serve: at B·top_k < E
    the grouped kernel streams ALL E experts' weights per step; here HBM
    weight traffic is B·top_k/E of that. Numerics match the dense path
    (same per-site kernel math; combine in f32). Raises
    NotImplementedError for non-gatherable sites (caller falls back)."""
    from qtpu.kernels.pallas_moe_matmul import pallas_moe_gathered_matmul

    B, S, D = h.shape
    k = cfg.num_experts_per_tok
    for site in ("exp_gate", "exp_up", "exp_down"):
        p = lp[site]
        if "w" in p or "codebook" in p or "perm" in p:
            raise NotImplementedError("gathered MoE path needs packed affine")
        if qm(site) is None or len(qm(site)) != 4:
            raise NotImplementedError("gathered MoE path needs qmeta")

    logits = linear(h, lp["router"], qm("router"), layer=layer).astype(
        jnp.float32
    )
    probs = jax.nn.softmax(logits, axis=-1)  # [B,1,E]
    topv, topi = jax.lax.top_k(probs, k)
    if cfg.norm_topk_prob:
        topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
    Gs = B * k
    eidx = topi.reshape(Gs)
    xrows = jnp.repeat(h.reshape(B, D), k, axis=0)  # [Gs, D]

    def gmm(x, site):
        p = lp[site]
        if "smooth" in p:
            s = p["smooth"] if layer is None else p["smooth"][layer]
            x = x * s[eidx].astype(x.dtype)
        return pallas_moe_gathered_matmul(
            x, eidx, p["data"], p["scales"], p.get("zeros"), qm(site),
            layer=layer,
        )

    g = gmm(xrows, "exp_gate")
    u = gmm(xrows, "exp_up")
    act = jax.nn.silu(g.astype(jnp.float32)).astype(h.dtype) * u
    d = gmm(act, "exp_down")  # [Gs, D]
    out = jnp.sum(
        topv.reshape(B, k)[..., None] * d.astype(jnp.float32).reshape(B, k, D),
        axis=1,
    )
    return out.astype(h.dtype).reshape(B, S, D)


def _moe_mlp(h, lp, cfg: ModelConfig, qm, capture: str = "none", layer=None):
    """Routed expert MLP. Returns (out [B,S,D], exp_down_in stats|None).
    layer: traced index into [L, ...]-stacked params (decode weight
    delivery through the scalar-prefetch grouped kernel), or None when lp
    is already this layer's slice."""
    B, S = h.shape[:2]
    if (
        S == 1
        and capture == "none"
        and B * cfg.num_experts_per_tok < cfg.num_experts
        and "sh_gate" not in lp
        and jax.default_backend() == "tpu"
        and os.environ.get("QTPU_MOE_GATHERED", "1") == "1"
    ):
        try:
            out = _moe_mlp_gathered(h, lp, cfg, qm, layer)
            return out, None, None
        except NotImplementedError:
            pass
    route_w = _routing_weights(h, lp, cfg, qm, layer)  # [B,S,E] f32
    g = _expert_matmul(h, lp["exp_gate"], qm("exp_gate"), False, layer)
    u = _expert_matmul(h, lp["exp_up"], qm("exp_up"), False, layer)
    act = jax.nn.silu(g.astype(jnp.float32)).astype(h.dtype) * u  # [B,S,E,F]
    d = _expert_matmul(act, lp["exp_down"], qm("exp_down"), True, layer)
    out = jnp.einsum(
        "bse,bsed->bsd", route_w, d.astype(jnp.float32)
    ).astype(h.dtype)
    stats = _routed_stats(act, route_w, capture) if capture != "none" else None
    sh_stats = None
    if "sh_gate" in lp:  # Qwen2-MoE always-on shared expert, sigmoid-gated
        sg = linear(h, lp["sh_gate"], qm("sh_gate"), layer=layer)
        su = linear(h, lp["sh_up"], qm("sh_up"), layer=layer)
        sact = jax.nn.silu(sg.astype(jnp.float32)).astype(h.dtype) * su
        if capture != "none":
            sh_stats = _collect(sact, capture)
        sd = linear(sact, lp["sh_down"], qm("sh_down"), layer=layer)
        gate = jax.nn.sigmoid(
            linear(h, lp["sh_router"], qm("sh_router"), layer=layer).astype(
                jnp.float32
            )
        )
        out = out + (gate * sd.astype(jnp.float32)).astype(h.dtype)
    return out, stats, sh_stats


def _layer_fwd(x, lp, cfg: ModelConfig, rope, mask, capture: str, qmeta):
    cos, sin = rope
    stats = {}
    qm = (lambda s: None) if qmeta is None else (lambda s: qmeta.get(s))

    h = rms_norm(x, lp["attn_norm"], cfg.norm_eps)
    if capture != "none":
        stats["attn_in"] = _collect(h, capture)
    q, k, v = _qkv(h, lp, cfg, qm)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    win = cfg.sliding_window if 0 < cfg.sliding_window < x.shape[1] else 0
    attn = causal_attention(q, k, v, mask, window=win)
    if capture != "none":
        stats["o_in"] = _collect(attn, capture)
    x = x + linear(attn, lp["o_proj"], qm("o_proj"))

    h = rms_norm(x, lp["mlp_norm"], cfg.norm_eps)
    if capture != "none":
        stats["mlp_in"] = _collect(h, capture)
    mlp, down_stats, sh_stats = _moe_mlp(h, lp, cfg, qm, capture)
    if capture != "none":
        stats["exp_down_in"] = down_stats
        if sh_stats is not None:
            stats["sh_down_in"] = sh_stats
    x = x + mlp
    return x, (stats if capture != "none" else None)


@partial(jax.jit, static_argnames=("cfg", "capture", "qmeta"))
def forward(
    params: dict,
    input_ids: jnp.ndarray,
    cfg: ModelConfig,
    capture: str = "none",
    qmeta=None,
):
    """Full-sequence causal forward; same contract as llama.forward, with
    capture stats additionally carrying per-expert `exp_down_in` arrays
    ([L, E, F])."""
    qmeta_d = dict(qmeta) if qmeta is not None else None
    B, S = input_ids.shape
    x = params["embed"][input_ids].astype(params["embed"].dtype)
    t0 = (input_ids[0, 0] * 0).astype(jnp.int32)
    positions = jnp.arange(S) + t0
    rope = rope_tables(positions, cfg.head_dim, cfg.rope_theta)
    mask = jnp.arange(S)[None, :] <= positions[:, None]
    if 0 < cfg.sliding_window < S:
        mask &= jnp.arange(S)[None, :] > positions[:, None] - cfg.sliding_window
    mask = mask[None, None, :, :]

    def body(x, lp):
        return _layer_fwd(x, lp, cfg, rope, mask, capture, qmeta_d)

    x, layer_stats = jax.lax.scan(body, x, params["layers"])
    x = rms_norm(x, params["final_norm"], cfg.norm_eps)
    qmh = None if qmeta_d is None else qmeta_d.get("lm_head")
    logits = linear(x, params["lm_head"], qmh).astype(jnp.float32)
    if capture == "none":
        return logits
    layer_stats = dict(layer_stats)
    layer_stats["head_in"] = _collect(x, capture)
    return logits, layer_stats


def _layer_fwd_cached(x, layers, l, norms, layer_kv, start, rope, mask, cfg,
                      qmeta, cache_in_place: bool = False):
    """One decoder layer with KV-cache read/write. Two weight-delivery
    modes, mirroring llama._layer_fwd_cached: l is None → `layers` is this
    layer's sliced params (scan xs staging); l a traced index → `layers`
    is the full [L, ...]-stacked dict read through scalar-prefetch kernels
    (ops.linear for attention sites, the grouped MoE kernel for [L, E, ..]
    expert sites — zero staging copies)."""
    from qtpu.models.llama import _write_and_attend

    attn_norm, mlp_norm = norms
    cos, sin = rope
    qm = (lambda s: None) if qmeta is None else (lambda s: qmeta.get(s))

    h = rms_norm(x, attn_norm, cfg.norm_eps)
    q, k, v = _qkv(h, layers, cfg, qm, layer=l)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    attn, layer_kv = _write_and_attend(
        q, k, v, layer_kv, start, mask, cfg, in_place=cache_in_place
    )
    x = x + linear(attn, layers["o_proj"], qm("o_proj"), layer=l)

    h = rms_norm(x, mlp_norm, cfg.norm_eps)
    mlp, _, _ = _moe_mlp(h, layers, cfg, qm, layer=l)
    return x + mlp, layer_kv


@partial(jax.jit, static_argnames=("cfg", "qmeta"))
def forward_with_cache(params, input_ids, positions, cache, cfg, qmeta=None):
    """Incremental forward for serving (prefill + decode); same contract as
    llama.forward_with_cache. Weight delivery at decode (T = 1, packed
    affine sites) reads the stacked [L, ...] / [L, E, ...] arrays directly
    through scalar-prefetch kernels; prefill keeps scan-xs staging (each
    layer's expert weights prefetched a scan step ahead)."""
    from qtpu.models.llama import _use_stacked_weights
    from qtpu.serve.kvcache import KVCache

    qmeta_d = dict(qmeta) if qmeta is not None else None
    B, T = input_ids.shape
    S = cache.max_len
    x = params["embed"][input_ids].astype(params["embed"].dtype)
    rope = rope_tables(positions, cfg.head_dim, cfg.rope_theta)
    kpos = jnp.arange(S)
    mask = kpos[None, None, :] <= positions[:, :, None]
    if 0 < cfg.sliding_window < S:
        mask &= kpos[None, None, :] > positions[:, :, None] - cfg.sliding_window
    start = positions[:, 0]

    layers = params["layers"]
    L = cache.num_layers
    if cache.per_layer:
        # per-layer cache buffers → unrolled layer loop (see llama)
        new_kv = []
        for l in range(L):
            lp = jax.tree_util.tree_map(lambda a: a[l], layers)
            x, lkv = _layer_fwd_cached(
                x, lp, None, (lp["attn_norm"], lp["mlp_norm"]),
                cache.layer(l), start, rope, mask, cfg, qmeta_d,
                cache_in_place=cache.per_layer,
            )
            new_kv.append(lkv)
        k_new, v_new, ks_new, vs_new = (
            None if new_kv[0][i] is None else tuple(t[i] for t in new_kv)
            for i in range(4)
        )
        x = rms_norm(x, params["final_norm"], cfg.norm_eps)
        qmh = None if qmeta_d is None else qmeta_d.get("lm_head")
        logits = linear(x, params["lm_head"], qmh).astype(jnp.float32)
        return logits, KVCache(
            k=k_new,
            v=v_new,
            k_scale=ks_new,
            v_scale=vs_new,
            length=jnp.maximum(cache.length, positions[:, -1] + 1),
        )
    cache_xs = (cache.k, cache.v, cache.k_scale, cache.v_scale)
    if _use_stacked_weights(layers, L, T, qmeta_d):
        def body(x, xs):
            l, an, mn, kc, vc, ksc, vsc = xs
            return _layer_fwd_cached(
                x, layers, l, (an, mn), (kc, vc, ksc, vsc), start, rope,
                mask, cfg, qmeta_d,
            )

        xs = (
            jnp.arange(L, dtype=jnp.int32),
            layers["attn_norm"],
            layers["mlp_norm"],
        ) + cache_xs
    else:
        def body(x, xs):
            lp, kc, vc, ksc, vsc = xs
            return _layer_fwd_cached(
                x, lp, None, (lp["attn_norm"], lp["mlp_norm"]),
                (kc, vc, ksc, vsc), start, rope, mask, cfg, qmeta_d,
            )

        xs = (layers,) + cache_xs

    x, (k_new, v_new, ks_new, vs_new) = jax.lax.scan(body, x, xs)
    x = rms_norm(x, params["final_norm"], cfg.norm_eps)
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
