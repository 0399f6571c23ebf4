"""Functional Llama-family decoder (RMSNorm + RoPE + GQA + SwiGLU).

Replaces the reference's HF torch model (loaded at
quantization_utils.py:48-89) with a pure-function JAX model: params are a
pytree with all layers STACKED on a leading axis and the forward is a
`lax.scan` over layers — one traced layer body regardless of depth, which
keeps compile time flat and makes per-layer quantization a `vmap`.

Calibration "hooks" are capture modes of the forward (SURVEY §7.1): the
reference's forward hooks (quantization_utils.py:226-245) become explicitly
returned per-layer channel statistics; `capture="hessian"` additionally
returns per-site XᵀX for true GPTQ.

Param layout (linears are [in, out], quantization groups tile the input
axis — the same channels the reference groups over):
  embed        [V, D]
  layers/attn_norm [L, D]          layers/mlp_norm [L, D]
  layers/q_proj {"w": [L, D, H·hd]}   (or packed; see qtpu.models.ops.linear)
  layers/k_proj, v_proj [L, D, KV·hd]; o_proj [L, H·hd, D]
  layers/gate_proj, up_proj [L, D, F]; down_proj [L, F, D]
  final_norm   [D]
  lm_head      {"w": [D, V]}
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from qtpu.models.config import ModelConfig
from qtpu.models.ops import (
    apply_rope,
    causal_attention,
    channel_stats,
    input_hessian,
    linear,
    rms_norm,
    rope_tables,
)

# linear sites per llama layer; stats are collected per *input site* (q/k/v
# share one input, gate/up share one) and fanned out to per-linear names by
# the calibration layer to mirror reference naming.
LAYER_SITES = (
    "q_proj",
    "k_proj",
    "v_proj",
    "o_proj",
    "gate_proj",
    "up_proj",
    "down_proj",
)
INPUT_SITES = ("attn_in", "o_in", "mlp_in", "down_in", "head_in")
SITE_OF_INPUT = {
    "attn_in": ("q_proj", "k_proj", "v_proj"),
    "o_in": ("o_proj",),
    "mlp_in": ("gate_proj", "up_proj"),
    "down_in": ("down_proj",),
    "head_in": ("lm_head",),
}

# tensor parallelism: these sites shard their INPUT dim (row-parallel,
# XLA psums the partial outputs); all other sites shard the output dim
ROW_PARALLEL_SITES = ("o_proj", "down_proj")


def init_params(cfg: ModelConfig, key, dtype=jnp.bfloat16) -> dict:
    """Random-normal initialized params (std 0.02, like GPT-style init).
    Offline stand-in for HF checkpoints (downloads are unavailable here);
    real weights come via qtpu.models.hf_import."""
    k = jax.random.split(key, 12)
    D, F, V, L = (
        cfg.hidden_size,
        cfg.intermediate_size,
        cfg.vocab_size,
        cfg.num_layers,
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
            "gate_proj": {"w": w(k[5], L, D, F)},
            "up_proj": {"w": w(k[6], L, D, F)},
            "down_proj": {"w": w(k[7], L, F, D)},
        },
        "final_norm": jnp.ones((D,), dtype),
        "lm_head": {"w": w(k[8], D, V)},
    }
    if cfg.attention_bias:  # Qwen2: bias on q/k/v only
        for kk, (site, n) in zip(
            k[9:12], (("q_proj", Q), ("k_proj", KV), ("v_proj", KV))
        ):
            params["layers"][site]["b"] = w(kk, L, n)
    return params


def _layer_fwd(
    x, lp, cfg: ModelConfig, rope, mask, capture: str, qmeta, attn_impl=None
):
    """One decoder layer. Returns (x_out, stats dict or None).

    qmeta: None, or a dict site → (bits, group, K, N) for sites whose
    params are packed (static at trace time). attn_impl: optional
    (q, k, v, window) -> [B, S, H·hd] attention override (mask is None
    then — e.g. sharding.ring_attention for seq-parallel prefill)."""
    cos, sin = rope
    B, S, D = x.shape
    stats = {}
    qm = (lambda s: None) if qmeta is None else (lambda s: qmeta.get(s))

    h = rms_norm(x, lp["attn_norm"], cfg.norm_eps)
    if capture != "none":
        stats["attn_in"] = _collect(h, capture)
    q, k, v = _qkv(h, lp, cfg, qm)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    win = cfg.sliding_window if 0 < cfg.sliding_window < x.shape[1] else 0
    if attn_impl is None:
        attn = causal_attention(q, k, v, mask, window=win)
    else:
        attn = attn_impl(q, k, v, win)
    if capture != "none":
        stats["o_in"] = _collect(attn, capture)
    x = x + linear(attn, lp["o_proj"], qm("o_proj"))

    h = rms_norm(x, lp["mlp_norm"], cfg.norm_eps)
    if capture != "none":
        stats["mlp_in"] = _collect(h, capture)
    gate, up = _gate_up(h, lp, cfg, qm)
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
    if capture != "none":
        stats["down_in"] = _collect(act, capture)
    x = x + linear(act, lp["down_proj"], qm("down_proj"))
    return x, (stats if capture != "none" else None)


def _qkv(h, lp, cfg: ModelConfig, qm, layer=None):
    """Q/K/V projections; a fused "qkv_proj" packed site (see
    quant.apply.fuse_packed_sites) runs one wide matmul and splits.
    layer: stacked-params index (see ops.linear)."""
    B, T = h.shape[:2]
    Q, KV = cfg.q_dim, cfg.kv_dim
    if "qkv_proj" in lp:
        qkv = linear(h, lp["qkv_proj"], qm("qkv_proj"), layer=layer)
        q, k, v = jnp.split(qkv, [Q, Q + KV], axis=-1)
    else:
        q = linear(h, lp["q_proj"], qm("q_proj"), layer=layer)
        k = linear(h, lp["k_proj"], qm("k_proj"), layer=layer)
        v = linear(h, lp["v_proj"], qm("v_proj"), layer=layer)
    return (
        q.reshape(B, T, cfg.num_heads, cfg.head_dim),
        k.reshape(B, T, cfg.num_kv_heads, cfg.head_dim),
        v.reshape(B, T, cfg.num_kv_heads, cfg.head_dim),
    )


def _gate_up(h, lp, cfg: ModelConfig, qm, layer=None):
    if "gateup_proj" in lp:
        gu = linear(h, lp["gateup_proj"], qm("gateup_proj"), layer=layer)
        return jnp.split(gu, [cfg.intermediate_size], axis=-1)
    return linear(h, lp["gate_proj"], qm("gate_proj"), layer=layer), linear(
        h, lp["up_proj"], qm("up_proj"), layer=layer
    )


def _collect(x, capture: str):
    mean_abs, max_abs = channel_stats(x)
    out = {"mean_abs": mean_abs, "max_abs": max_abs}
    if capture == "hessian":
        out["hessian"] = input_hessian(x)
    return out


def _delivery_mode(layers, L: int, T: int = 1) -> str:
    """Weight-delivery policy (see _layer_fwd_cached / forward_with_cache).

    "staged": per-layer weight slices as scan xs (XLA stages a copy one
    iteration ahead). "stacked": scalar-prefetch kernels read the [L, ...]
    arrays in place, zero copies. "unrolled": L inlined layer bodies with
    static slices.

    Returns "unrolled" | "staged" | "stacked". Full-model decode measured
    on v5e (TinyLlama W4, scanned 50-step blocks, ms/step,
    tools/exp_stepmatrix.py + results/decode_budget.json):

      packed sites: stacked 2.12 (with the fused-MLP megakernel; 2.24
      without) < staged 2.29 < per-layer-unrolled 2.57. The xs staging
      copy costs ~0.53 ms/step and the step is fully serial (no overlap
      benefit to hide it), so zero-copy scalar-prefetch kernels win —
      packed decode defaults to STACKED.
      dense bf16: the stacked body would dynamic-slice [L, K, N] bf16
      leaves (a real copy per layer, no scalar-prefetch kernel to read
      them in place), so dense keeps STAGED.

    QTPU_DECODE_DELIVERY overrides (one of the three strings; or the
    legacy QTPU_STACKED_WEIGHTS 1/0 for stacked/staged)."""
    import os

    env = os.environ.get("QTPU_DECODE_DELIVERY")
    if env in ("unrolled", "staged", "stacked"):
        return env
    env = os.environ.get("QTPU_STACKED_WEIGHTS")
    if env is not None:
        return "stacked" if env == "1" else "staged"
    packed = any(
        isinstance(site, dict) and "data" in site for site in layers.values()
    )
    if packed:
        return "stacked"
    per_layer = sum(
        a.nbytes
        for site in layers.values()
        if isinstance(site, dict)
        for a in jax.tree_util.tree_leaves(site)
    ) // max(L, 1)
    if per_layer > 56 * 1024 * 1024:
        return "stacked"
    return "staged"


def _use_stacked_weights(layers, L: int, T: int = 1, qmeta_d=None) -> bool:
    return _delivery_mode(layers, L, T) == "stacked"


def _cached_attention(q, layer_kv, mask, cfg: ModelConfig, pos=None):
    """q [B,T,H,hd] against a full cache layer [B,KV,S,hd] (bf16 or int8 +
    [B,KV,S] scales). mask [B,T,S] True=attend; pos [B] = the query's
    absolute position (T = 1 callers pass it so banded masks need no
    mask-row reconstruction).

    Decode (T=1, int8 cache) dispatches to the Pallas kernel on TPU, which
    reads the int8 K/V directly (no bf16 KV materialization) and applies
    the sliding-window band in-kernel; other shapes take the XLA path
    below.
    """
    from qtpu.serve.kvcache import dequantize_kv

    k_c, v_c, ks_c, vs_c = layer_kv
    B, T, H, hd = q.shape
    KV = k_c.shape[1]

    if (
        T == 1
        and ks_c is not None
        and jax.default_backend() == "tpu"
        and H % KV == 0
    ):
        try:
            from qtpu.kernels.pallas_kv_attention import pallas_decode_attention

            if pos is None:
                # mask[:, 0, :] encodes "key position ≤ query position";
                # only valid for pure-causal masks
                if 0 < cfg.sliding_window < k_c.shape[2]:
                    raise NotImplementedError("banded mask needs pos")
                pos = jnp.sum(mask[:, 0, :].astype(jnp.int32), axis=-1) - 1
            win = (
                cfg.sliding_window
                if 0 < cfg.sliding_window < k_c.shape[2]
                else 0
            )
            out = pallas_decode_attention(
                q[:, 0], k_c, v_c, ks_c, vs_c, pos, window=win
            )
            return out.reshape(B, 1, H * hd)
        except NotImplementedError:
            pass

    if ks_c is not None:
        K = dequantize_kv(k_c, ks_c, q.dtype)
        V = dequantize_kv(v_c, vs_c, q.dtype)
    else:
        K, V = k_c, v_c
    if KV != H:
        rep = H // KV
        K = jnp.repeat(K, rep, axis=1)
        V = jnp.repeat(V, rep, axis=1)
    scores = jnp.einsum(
        "bqhd,bhkd->bhqk", q, K, preferred_element_type=jnp.float32
    ) / jnp.sqrt(float(hd))
    scores = jnp.where(mask[:, None, :, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bqhd", probs, V)
    return out.reshape(B, T, H * hd)


def _write_and_attend(
    q, k, v, layer_kv, start, mask, cfg: ModelConfig, in_place: bool = False
):
    """KV-cache write + attention for one layer. Decode (T = 1, int8
    cache, TPU) fuses both into one Pallas pass
    (pallas_decode_attention_write): the separate masked-select write and
    the attention kernel each stream the whole [S, hd] cache tile
    (measured ~0.49 + ~0.62 ms/step on v5e at TinyLlama B=8), and the
    fused kernel halves that traffic via input/output-aliased tiles.
    in_place=True (per-layer cache buffers, no scan ys) uses the BANDED
    kernel instead: the cache buffers are aliased in place and only the
    8-row band holding each sequence's position is written back — at long
    contexts the write traffic drops ~S/8-fold. Other shapes: plain
    write + _cached_attention."""
    from qtpu.serve.kvcache import cache_layer_write

    B, T, H, hd = q.shape
    KV = k.shape[2]
    quantized = layer_kv[2] is not None
    if T == 1 and jax.default_backend() == "tpu" and H % KV == 0:
        try:
            from qtpu.kernels.pallas_kv_attention import (
                pallas_decode_attention_write,
                pallas_decode_attention_write_bf16,
            )

            k_c, v_c, ks_c, vs_c = layer_kv
            win = (
                cfg.sliding_window
                if 0 < cfg.sliding_window < k_c.shape[2]
                else 0
            )
            if quantized and in_place and k_c.shape[2] % 2048 == 0:
                # long-context per-layer path: S-blocked online-softmax
                # kernel, cache updated in place (one SBLK block written)
                from qtpu.kernels.pallas_kv_attention import (
                    pallas_decode_attention_flash,
                )

                out, k_c, v_c, ks_c, vs_c = pallas_decode_attention_flash(
                    q[:, 0], k, v, k_c, v_c, ks_c, vs_c, start, window=win
                )
            elif quantized:
                out, k_c, v_c, ks_c, vs_c = pallas_decode_attention_write(
                    q[:, 0], k, v, k_c, v_c, ks_c, vs_c, start, window=win
                )
            else:
                out, k_c, v_c = pallas_decode_attention_write_bf16(
                    q[:, 0], k, v, k_c, v_c, start, window=win
                )
            return out.reshape(B, 1, H * hd), (k_c, v_c, ks_c, vs_c)
        except NotImplementedError:
            pass
    layer_kv = cache_layer_write(layer_kv, k, v, start, quantized)
    attn = _cached_attention(
        q, layer_kv, mask, cfg, pos=(start if T == 1 else None)
    )
    return attn, layer_kv


def _mlp_block(x, layers, l, mlp_norm, cfg: ModelConfig, qm):
    """norm → SwiGLU MLP → residual. Decode on TPU with a packed fused
    gateup+down pair dispatches to the single-launch Pallas MLP kernel
    (norm, both dequant-matmuls, silu·mul and the residual in ONE program
    streaming every MLP weight byte exactly once — see
    kernels/pallas_fused_mlp.py); every other shape/packing runs the
    composed ops below."""
    import os

    mgu, md = qm("gateup_proj"), qm("down_proj")
    gu = layers.get("gateup_proj") if isinstance(layers, dict) else None
    dn = layers.get("down_proj") if isinstance(layers, dict) else None
    if (
        jax.default_backend() == "tpu"
        and os.environ.get("QTPU_NO_FUSED_MLP") != "1"
        and mgu is not None and md is not None
        and len(mgu) == 4 and len(md) == 4
        and isinstance(gu, dict) and isinstance(dn, dict)
        and set(gu.keys()) == {"data", "scales", "zeros"}
        and set(dn.keys()) == {"data", "scales", "zeros"}
    ):
        try:
            from qtpu.kernels.pallas_fused_mlp import (
                pallas_fused_mlp,
                pallas_fused_mlp_stacked,
            )

            if l is None:
                return pallas_fused_mlp(
                    x, mlp_norm,
                    gu["data"], gu["scales"], gu["zeros"],
                    dn["data"], dn["scales"], dn["zeros"],
                    mgu, md, eps=cfg.norm_eps,
                )
            return pallas_fused_mlp_stacked(
                x, layers["mlp_norm"],
                gu["data"], gu["scales"], gu["zeros"],
                dn["data"], dn["scales"], dn["zeros"],
                mgu, md, l, eps=cfg.norm_eps,
            )
        except NotImplementedError:
            pass
    h = rms_norm(x, mlp_norm, cfg.norm_eps)
    gate, up = _gate_up(h, layers, cfg, qm, layer=l)
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
    return x + linear(act, layers["down_proj"], qm("down_proj"), layer=l)


def _try_carry_scan(x, layers, cache, start, rope, mask, cfg, qmeta_d):
    """Decode layer scan with the int8 KV cache as the scan CARRY instead
    of xs/ys. With the cache as xs/ys, XLA stages every layer's k/v slice
    through dynamic-slice + dynamic-update-slice copies each step —
    profiled at 43% of the whole B=32 decode loop (r5: 297 of 686 ms of
    device time, more than attention or the MLP, and the source of the
    0.7 ms 'unattributed' in results/decode_budget.json B32). Here the
    stacked cache arrays ride the carry and the banded stacked kernel
    (kernels.pallas_kv_attention) reads the layer's tiles via a
    scalar-prefetch index and writes only the 8-row position band in
    place — zero staging traffic. Returns None when the shapes/packing
    don't fit (caller falls back to the xs/ys scan). QTPU_CACHE_CARRY=0
    disables."""
    import os

    if (
        os.environ.get("QTPU_CACHE_CARRY", "1") != "1"
        or jax.default_backend() != "tpu"
        or cache.k_scale is None
        or cache.per_layer
    ):
        return None
    qm = (lambda s: None) if qmeta_d is None else (lambda s: qmeta_d.get(s))
    from qtpu.kernels.pallas_kv_attention import (
        pallas_cache_band_write_stacked,
        pallas_decode_attention_stacked,
    )

    B = x.shape[0]
    L = cache.num_layers
    S = cache.max_len
    win = cfg.sliding_window if 0 < cfg.sliding_window < S else 0
    cos, sin = rope

    def body(carry, xs):
        xc, kc, vc, ksc, vsc = carry
        l, an, mn = xs
        qkv3 = _fused_norm_qkv(xc, layers, l, cfg, qm)
        if qkv3 is None:
            h = rms_norm(xc, an, cfg.norm_eps)
            q, k, v = _qkv(h, layers, cfg, qm, layer=l)
        else:
            q, k, v = qkv3
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        # band write (in place, band traffic only), then read-only attend
        # over the updated cache — two kernels so every cache operand is
        # passed exactly once per kernel and the carry stays un-copied
        kc, vc, ksc, vsc = pallas_cache_band_write_stacked(
            k, v, kc, vc, ksc, vsc, start, l
        )
        out = pallas_decode_attention_stacked(
            q[:, 0], kc, vc, ksc, vsc, start, l, window=win
        )
        attn = out.reshape(B, 1, -1)
        xc = _o_proj_resid(attn, xc, layers, l, qm)
        xc = _mlp_block(xc, layers, l, mn, cfg, qm)
        return (xc, kc, vc, ksc, vsc), None

    try:
        (xo, k_new, v_new, ks_new, vs_new), _ = jax.lax.scan(
            body,
            (x, cache.k, cache.v, cache.k_scale, cache.v_scale),
            (
                jnp.arange(L, dtype=jnp.int32),
                layers["attn_norm"],
                layers["mlp_norm"],
            ),
        )
    except NotImplementedError:
        return None
    return xo, (k_new, v_new, ks_new, vs_new)


def _layer_fwd_cached(
    x, layers, l, norms, layer_kv, start, rope, mask, cfg: ModelConfig,
    qmeta, cache_in_place: bool = False,
):
    """One decoder layer with KV-cache read/write.

    Two weight-delivery modes (chosen by forward_with_cache):
    - l is None: `layers` is THIS layer's already-sliced params (scan xs).
      XLA stages each layer's weights in VMEM one scan iteration ahead, so
      the matmul kernels read at VMEM speed — fastest whenever a layer's
      packed weights fit comfortably in VMEM (measured best for 1B-class).
    - l is a traced index: `layers` is the full STACKED params dict and
      weights are read through scalar-prefetch kernels (ops.linear) —
      no staging copy at all, required when per-layer weights are too big
      to double-buffer in VMEM (7B-class and up).
    norms: this layer's (attn_norm, mlp_norm) rows.
    start: [B] write offsets. Returns (x_out, updated layer_kv)."""
    attn_norm, mlp_norm = norms
    cos, sin = rope
    qm = (lambda s: None) if qmeta is None else (lambda s: qmeta.get(s))

    qkv3 = _fused_norm_qkv(x, layers, l, cfg, qm)
    if qkv3 is None:
        h = rms_norm(x, attn_norm, cfg.norm_eps)
        q, k, v = _qkv(h, layers, cfg, qm, layer=l)
    else:
        q, k, v = qkv3
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    attn, layer_kv = _write_and_attend(
        q, k, v, layer_kv, start, mask, cfg, in_place=cache_in_place
    )
    x = _o_proj_resid(attn, x, layers, l, qm)
    x = _mlp_block(x, layers, l, mlp_norm, cfg, qm)
    return x, layer_kv


def _plain_packed(site) -> bool:
    return isinstance(site, dict) and set(site.keys()) == {
        "data",
        "scales",
        "zeros",
    }


def _fused_norm_qkv(x, layers, l, cfg: ModelConfig, qm):
    """Stacked-delivery decode: fold the attention rms_norm into the qkv
    dequant-matmul launch (one kernel instead of norm + matmul, and no
    [B, K] normalized-activation round trip through HBM). Returns
    (q, k, v) reshaped to heads, or None when the fusion does not apply
    (staged delivery, unpacked/smoothed/biased sites, non-TPU).

    OFF by default (QTPU_FUSE_NORM_RESID=1 enables): measured full-step
    2.241 ms/step with both norm+residual fusions vs 2.116 without on v5e
    (TinyLlama W4 B=8, stacked delivery) — within run variance but not a
    win; the XLA elementwise kernels these remove were already cheap."""
    import os

    site = layers.get("qkv_proj") if isinstance(layers, dict) else None
    mq = qm("qkv_proj")
    if (
        l is None
        or mq is None
        or len(mq) != 4
        or not _plain_packed(site)
        or jax.default_backend() != "tpu"
        or os.environ.get("QTPU_FUSE_NORM_RESID") != "1"
    ):
        return None
    try:
        from qtpu.kernels.dequant_matmul import quantized_matmul_stacked

        qkv = quantized_matmul_stacked(
            x, site["data"], site["scales"], site["zeros"], mq, l,
            norm_w=layers["attn_norm"], eps=cfg.norm_eps,
        )
    except NotImplementedError:
        return None
    B, T = x.shape[:2]
    Q, KV = cfg.q_dim, cfg.kv_dim
    q, k, v = jnp.split(qkv, [Q, Q + KV], axis=-1)
    return (
        q.reshape(B, T, cfg.num_heads, cfg.head_dim),
        k.reshape(B, T, cfg.num_kv_heads, cfg.head_dim),
        v.reshape(B, T, cfg.num_kv_heads, cfg.head_dim),
    )


def _o_proj_resid(attn, x, layers, l, qm):
    """x + attn @ W_o, with the residual folded into the o-projection
    kernel under stacked delivery (same launch-count logic as
    _fused_norm_qkv)."""
    import os

    site = layers.get("o_proj") if isinstance(layers, dict) else None
    mo = qm("o_proj")
    if (
        l is not None
        and mo is not None
        and len(mo) == 4
        and _plain_packed(site)
        and jax.default_backend() == "tpu"
        and os.environ.get("QTPU_FUSE_NORM_RESID") == "1"
    ):
        try:
            from qtpu.kernels.dequant_matmul import quantized_matmul_stacked

            return quantized_matmul_stacked(
                attn, site["data"], site["scales"], site["zeros"], mo, l,
                resid=x,
            )
        except NotImplementedError:
            pass
    return x + linear(attn, layers["o_proj"], qm("o_proj"), layer=l)


def _try_boundary_scan(x, layers, cache_xs, start, rope, mask, cfg, qmeta_d):
    """Decode layers scan built on the layer-boundary megakernel: per layer
    TWO launches (attention; o-proj→MLP→next-qkv in one phased grid) instead
    of four, with one uninterrupted weight-DMA stream across the whole
    non-attention span (kernels/pallas_layer_boundary.py).

    OFF by default (QTPU_BOUNDARY=1 enables): measured on v5e TinyLlama W4
    B=8 the megakernel span runs 46.9 µs vs 44.4 µs for the composed
    three-kernel chain, and the full decode step 2.30 vs 2.22 ms — Mosaic
    already overlaps back-to-back launches' weight DMA well enough that
    the phased grid's @pl.when dispatch costs more than the saved
    boundaries. Kept as the measured experiment (and for hardware where
    launch gaps are real). Applies only to fully plain-packed fused-site
    stacked delivery at T=1 on TPU; returns None otherwise (caller runs
    the composed-kernel scan)."""
    import os

    if os.environ.get("QTPU_BOUNDARY") != "1":
        return None
    if jax.default_backend() != "tpu" or qmeta_d is None:
        return None
    if x.shape[1] != 1 or x.dtype != jnp.bfloat16:
        return None
    needed = ("qkv_proj", "o_proj", "gateup_proj", "down_proj")
    for s in needed:
        m = qmeta_d.get(s)
        if m is None or len(m) != 4 or not _plain_packed(layers.get(s)):
            return None
    from qtpu.kernels.dequant_matmul import quantized_matmul_stacked
    from qtpu.kernels.pallas_layer_boundary import (
        pallas_layer_boundary_stacked,
    )

    qkv_site, o_site, gu_site, d_site = (layers[s] for s in needed)
    mq, mo, mgu, md = (qmeta_d[s] for s in needed)
    L = layers["attn_norm"].shape[0]
    B = x.shape[0]
    Q, KV = cfg.q_dim, cfg.kv_dim
    cos, sin = rope

    def split_heads(qkv):
        q, k, v = jnp.split(qkv, [Q, Q + KV], axis=-1)
        return (
            q.reshape(B, 1, cfg.num_heads, cfg.head_dim),
            k.reshape(B, 1, cfg.num_kv_heads, cfg.head_dim),
            v.reshape(B, 1, cfg.num_kv_heads, cfg.head_dim),
        )

    def body(carry, xs):
        xc, qkv = carry
        l, kc, vc, ksc, vsc = xs
        q, k, v = split_heads(qkv)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn, layer_kv = _write_and_attend(
            q, k, v, (kc, vc, ksc, vsc), start, mask, cfg
        )
        y2, qkv_next = pallas_layer_boundary_stacked(
            attn, xc,
            layers["mlp_norm"], layers["attn_norm"],
            o_site["data"], o_site["scales"], o_site["zeros"],
            gu_site["data"], gu_site["scales"], gu_site["zeros"],
            d_site["data"], d_site["scales"], d_site["zeros"],
            qkv_site["data"], qkv_site["scales"], qkv_site["zeros"],
            mo, mgu, md, mq,
            l, jnp.minimum(l + 1, L - 1),
            eps=cfg.norm_eps,
        )
        return (y2, qkv_next), layer_kv

    try:
        # layer 0's qkv (with the attn norm folded into the launch) seeds
        # the rotated chain; thereafter each boundary kernel emits the
        # NEXT layer's qkv
        qkv0 = quantized_matmul_stacked(
            x, qkv_site["data"], qkv_site["scales"], qkv_site["zeros"],
            mq, jnp.int32(0), norm_w=layers["attn_norm"], eps=cfg.norm_eps,
        )
        xs = (jnp.arange(L, dtype=jnp.int32),) + cache_xs
        (x_out, _), kv_new = jax.lax.scan(body, (x, qkv0), xs)
    except NotImplementedError:
        return None
    return x_out, kv_new


@partial(jax.jit, static_argnames=("cfg", "qmeta"))
def forward_with_cache(params, input_ids, positions, cache, cfg: ModelConfig, qmeta=None):
    """Incremental forward for serving: prefill (T = prompt length) and
    decode (T = 1) share this path.

    input_ids [B, T]; positions [B, T] absolute positions per token (each
    sequence may be at a different offset — continuous batching). Writes
    K/V into `cache` (qtpu.serve.kvcache.KVCache) at positions[:, 0] and
    attends over the full cache with a per-sequence causal mask. Returns
    (logits [B, T, V], updated cache).
    """
    from qtpu.serve.kvcache import KVCache

    qmeta_d = dict(qmeta) if qmeta is not None else None
    B, T = input_ids.shape
    S = cache.max_len
    x = params["embed"][input_ids].astype(params["embed"].dtype)
    rope = rope_tables(positions, cfg.head_dim, cfg.rope_theta)
    kpos = jnp.arange(S)
    mask = kpos[None, None, :] <= positions[:, :, None]  # [B, T, S]
    if 0 < cfg.sliding_window < S:
        mask &= kpos[None, None, :] > positions[:, :, None] - cfg.sliding_window
    start = positions[:, 0]

    layers = params["layers"]
    L = cache.num_layers
    mode = _delivery_mode(layers, L, T)
    if cache.per_layer:
        # per-layer cache buffers require the unrolled forward (no scan
        # xs/ys for the cache — each layer's kernel updates its own
        # buffer functionally; see serve.kvcache.KVCache)
        mode = "unrolled"
    if mode == "unrolled":
        # L inlined layer bodies with STATIC weight/cache slices: kernels
        # read each site straight from HBM (no xs staging copy, no
        # scalar-prefetch indirection) and XLA schedules across layer
        # boundaries. Decode-only (T == 1): the body is small, so L-fold
        # trace/compile growth stays manageable.
        new_kv = []
        for l in range(L):
            lp = jax.tree_util.tree_map(lambda a: a[l], layers)
            x, lkv = _layer_fwd_cached(
                x, lp, None, (lp["attn_norm"], lp["mlp_norm"]),
                cache.layer(l), start, rope, mask, cfg, qmeta_d,
                cache_in_place=cache.per_layer,
            )
            new_kv.append(lkv)
        if cache.per_layer:
            k_new, v_new, ks_new, vs_new = (
                None if new_kv[0][i] is None else tuple(t[i] for t in new_kv)
                for i in range(4)
            )
        else:
            k_new, v_new, ks_new, vs_new = (
                None
                if new_kv[0][i] is None
                else jnp.stack([t[i] for t in new_kv])
                for i in range(4)
            )
    else:
        cache_xs = (cache.k, cache.v, cache.k_scale, cache.v_scale)
        boundary = None
        if mode == "stacked" and T == 1:
            boundary = _try_boundary_scan(
                x, layers, cache_xs, start, rope, mask, cfg, qmeta_d
            )
        carry = None
        if boundary is None and mode == "stacked" and T == 1:
            carry = _try_carry_scan(
                x, layers, cache, start, rope, mask, cfg, qmeta_d
            )
        if boundary is not None:
            x, (k_new, v_new, ks_new, vs_new) = boundary
        elif carry is not None:
            x, (k_new, v_new, ks_new, vs_new) = carry
        else:
            if mode == "stacked":
                def body(x, xs):
                    l, an, mn, kc, vc, ksc, vsc = xs
                    x, layer_kv = _layer_fwd_cached(
                        x, layers, l, (an, mn), (kc, vc, ksc, vsc), start,
                        rope, mask, cfg, qmeta_d,
                    )
                    return x, layer_kv

                xs = (
                    jnp.arange(L, dtype=jnp.int32),
                    layers["attn_norm"],
                    layers["mlp_norm"],
                ) + cache_xs
            else:
                def body(x, xs):
                    lp, kc, vc, ksc, vsc = xs
                    x, layer_kv = _layer_fwd_cached(
                        x, lp, None, (lp["attn_norm"], lp["mlp_norm"]),
                        (kc, vc, ksc, vsc), start, rope, mask, cfg, qmeta_d,
                    )
                    return x, layer_kv

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


@partial(jax.jit, static_argnames=("cfg", "capture", "qmeta", "attn_impl"))
def forward(
    params: dict,
    input_ids: jnp.ndarray,
    cfg: ModelConfig,
    capture: str = "none",
    qmeta=None,
    attn_impl=None,
):
    """Full-sequence causal forward.

    input_ids [B, S] → logits [B, S, V]. With capture != "none" also returns
    a stats pytree: {input_site: {stat: [L, ...]}} stacked over layers.
    qmeta: optional tuple of (site, (bits, group, K, N)) pairs for packed
    sites — hashable so it can be a static jit arg. attn_impl: optional
    (q, k, v, window) -> [B, S, H·hd] attention override; no [S, S] mask
    is built then (seq-parallel ring attention derives causality from
    global positions — an S=32k mask would be 1 GB).
    """
    qmeta_d = dict(qmeta) if qmeta is not None else None
    B, S = input_ids.shape
    x = params["embed"][input_ids].astype(params["embed"].dtype)
    # tie the positions to a traced value: ops on static-only inputs run
    # EAGERLY under trace, so a plain arange/tril mask becomes a multi-MB
    # constant baked into the HLO (S=2048 → >4 MB, which overflows this
    # backend's remote-compile request limit); one traced zero keeps the
    # mask and RoPE tables as compact ops instead
    t0 = (input_ids[0, 0] * 0).astype(jnp.int32)
    positions = jnp.arange(S) + t0
    rope = rope_tables(positions, cfg.head_dim, cfg.rope_theta)
    if attn_impl is None:
        mask = jnp.arange(S)[None, :] <= positions[:, None]
        # Mistral/Qwen2 sliding window: key within the last `window`
        # positions. Applied only when it can bind at this S (static), so
        # full-causal models and short sequences keep the unbanded mask +
        # flash kernel.
        if 0 < cfg.sliding_window < S:
            mask &= jnp.arange(S)[None, :] > positions[:, None] - cfg.sliding_window
        mask = mask[None, None, :, :]
    else:
        mask = None

    def body(x, lp):
        x_out, stats = _layer_fwd(
            x, lp, cfg, rope, mask, capture, qmeta_d, attn_impl
        )
        return x_out, stats

    x, layer_stats = jax.lax.scan(body, x, params["layers"])
    x = rms_norm(x, params["final_norm"], cfg.norm_eps)
    qmh = None if qmeta_d is None else qmeta_d.get("lm_head")
    logits = linear(x, params["lm_head"], qmh).astype(jnp.float32)
    if capture == "none":
        return logits
    # lm_head input stats (the reference's hooks see every nn.Linear,
    # including the LM head — quantization_utils.py:238-245)
    layer_stats = dict(layer_stats)
    layer_stats["head_in"] = _collect(x, capture)
    return logits, layer_stats
