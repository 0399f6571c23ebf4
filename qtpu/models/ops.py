"""Shared functional NN ops: norms, RoPE, and the quantization-aware linear.

The linear op is the single device boundary every quantization scheme plugs
into: a layer's params are either {"w": dense [K, N]} or packed
{"data", "scales", "zeros"(opt)} (see qtpu.core.packing), optionally with a
SmoothQuant input-smoothing vector {"smooth": [K]}. Packed weights dispatch
to the fused dequant-matmul (Pallas on TPU, jnp reference elsewhere).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qtpu.kernels.dequant_matmul import quantized_matmul


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * weight.astype(jnp.float32)).astype(x.dtype)


def layer_norm(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float
) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (out * weight.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
        x.dtype
    )


def rope_tables(positions: jnp.ndarray, head_dim: int, theta: float):
    """cos/sin tables for HF-style rotate-half RoPE. positions [S] (or [B,S])
    → cos,sin [..., S, head_dim]."""
    inv_freq = 1.0 / (
        theta
        ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # [S, hd/2]
    emb = jnp.concatenate([angles, angles], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x [..., S, H, hd]; cos/sin [..., S, hd] broadcast over heads."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[..., :, None, :]
    s = sin[..., :, None, :]
    return (x.astype(jnp.float32) * c + rotated.astype(jnp.float32) * s).astype(
        x.dtype
    )


def linear(x: jnp.ndarray, p: dict, site_meta=None, layer=None) -> jnp.ndarray:
    """Quantization-aware linear: y = maybe_smooth(x) @ W.

    p: {"w": [K, N]} dense, or packed {"data", "scales", "zeros"(opt)} with
    site_meta = (bits, group_size, K, N); either may carry "smooth": [K].

    layer: traced int32 index selecting one layer from STACKED [L, ...]
    params. For packed affine sites this takes the scalar-prefetch Pallas
    path (no per-layer weight copy inside a layers scan); every other
    variant dynamic-slices its (much smaller or less hot) leaves.
    """
    if layer is not None:
        if (
            "w" not in p
            and "codebook" not in p
            and "perm" not in p
            and not (site_meta is not None and len(site_meta) == 5)
        ):
            if "smooth" in p:
                x = x * p["smooth"][layer].astype(x.dtype)
            from qtpu.kernels.dequant_matmul import quantized_matmul_stacked

            y = quantized_matmul_stacked(
                x, p["data"], p["scales"], p.get("zeros"), site_meta, layer
            )
            if "b" in p:
                y = y + p["b"][layer].astype(y.dtype)
            return y
        # non-hot variants: slice this layer's leaves, reuse the 2D path
        p = jax.tree_util.tree_map(lambda a: a[layer], p)

    if "smooth" in p:
        x = x * p["smooth"].astype(x.dtype)
    if "perm" in p:
        # actorder-packed GPTQ: weights stored in Hessian-diagonal order,
        # activations gathered into the same order (g_idx-style). Under
        # tensor parallelism this global gather forces an all-gather of the
        # sharded activation axis on row-parallel sites — actorder serving
        # trades that ICI cost for the ordering win; shard-local perms are
        # a future optimization.
        x = jnp.take(x, p["perm"], axis=-1)
    if "w" in p:
        y = x @ p["w"].astype(x.dtype)
    elif "codebook" in p:
        from qtpu.kernels.dequant_matmul import codebook_matmul

        y = codebook_matmul(x, p["data"], p["scales"], p["codebook"], site_meta)
    elif site_meta is not None and len(site_meta) == 5 and site_meta[4] == "a8":
        from qtpu.kernels.int8_matmul import w8a8_matmul

        y = w8a8_matmul(x, p["data"], p["scales"], p["zeros"], site_meta[:4])
    else:
        y = quantized_matmul(
            x, p["data"], p["scales"], p.get("zeros"), site_meta
        )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def causal_attention(q, k, v, mask, window: int = 0):
    """Full-sequence causal attention with GQA. q [B,S,H,hd],
    k/v [B,S,KV,hd], mask [1|B,1,S,S] → [B,S,H·hd].

    On TPU at flash-tileable sizes, dispatches to the Pallas flash kernel
    (O(S·hd) memory, no [H,S,S] score tensor in HBM; GQA heads read their
    shared KV head in the kernel's index map — no repeat; sliding-window
    bands masked in-kernel); otherwise the XLA einsum path below (which
    needs the repeat)."""
    B, S, H, hd = q.shape
    KV = k.shape[2]

    if jax.default_backend() == "tpu" and S % 128 == 0 and H % KV == 0:
        try:
            from qtpu.kernels.pallas_flash_attention import pallas_flash_attention

            out = pallas_flash_attention(
                jnp.swapaxes(q, 1, 2),
                jnp.swapaxes(k, 1, 2),
                jnp.swapaxes(v, 1, 2),
                window=window,
            )
            return jnp.swapaxes(out, 1, 2).reshape(B, S, H * hd)
        except NotImplementedError:
            pass

    if KV != H:
        rep = H // KV
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    scores = jnp.einsum(
        "bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(float(hd))
    scores = jnp.where(mask, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhst,bthd->bshd", probs, v)
    return out.reshape(B, S, H * hd)


def channel_stats(x: jnp.ndarray):
    """(mean|x|, max|x|) per trailing channel — the two collectors of the
    reference (quantization_utils.py:226-236; smooth_quant_quantizer.py:54-74),
    computed inside the jitted forward instead of via hooks."""
    xf = jnp.abs(x.reshape(-1, x.shape[-1]).astype(jnp.float32))
    return jnp.mean(xf, axis=0), jnp.max(xf, axis=0)


def input_hessian(x: jnp.ndarray) -> jnp.ndarray:
    """XᵀX over flattened tokens — the true GPTQ Hessian contribution of one
    batch (the reference only ever builds a mean-abs proxy,
    gptq_quantizer.py:133-144)."""
    xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    return xf.T @ xf
