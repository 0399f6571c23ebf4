"""Synthetic packed models for benchmarks and compile checks.

Builds a packed llama-family model with ONE random weight per site tiled
across the layer stack — throughput and compile checks don't care about
weight uniqueness, and this sidesteps this environment's slow host RNG and
host→device transfer (see bench.py notes) as well as minute-long full-size
init on CPU compile checkers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qtpu.core.packing import quantize_pack
from qtpu.quant.apply import fuse_packed_sites


def tiled_packed_llama(cfg, w_bit: int = 4, group: int = 128, fuse: bool = True):
    """(packed_params, qmeta) for a llama-family ModelConfig."""
    L = cfg.num_layers
    D, F, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    Q, KV = cfg.q_dim, cfg.kv_dim
    keys = jax.random.split(jax.random.PRNGKey(0), 8)

    def tile(a):
        return jnp.broadcast_to(a[None], (L,) + a.shape)

    site_shapes = {
        "q_proj": (D, Q),
        "k_proj": (D, KV),
        "v_proj": (D, KV),
        "o_proj": (Q, D),
        "gate_proj": (D, F),
        "up_proj": (D, F),
        "down_proj": (F, D),
    }
    metas = {}
    layers = {
        "attn_norm": jnp.ones((L, D), jnp.bfloat16),
        "mlp_norm": jnp.ones((L, D), jnp.bfloat16),
    }
    for (site, sh), k in zip(site_shapes.items(), keys[:7]):
        w1 = jax.random.normal(k, sh, jnp.bfloat16) * 0.02
        qt = quantize_pack(w1, w_bit, group)
        layers[site] = {
            "data": tile(qt.data),
            "scales": tile(qt.scales),
            "zeros": tile(qt.zeros),
        }
        metas[site] = (w_bit, group, sh[0], sh[1])
        del w1, qt
    head_w = jax.random.normal(keys[7], (D, V), jnp.bfloat16) * 0.02
    qt = quantize_pack(head_w, w_bit, group)
    del head_w
    packed = {
        "embed": jax.random.normal(jax.random.PRNGKey(9), (V, D), jnp.bfloat16)
        * 0.02,
        "layers": layers,
        "final_norm": jnp.ones((D,), jnp.bfloat16),
        "lm_head": {"data": qt.data, "scales": qt.scales, "zeros": qt.zeros},
    }
    metas["lm_head"] = (w_bit, group, D, V)
    qmeta = tuple(sorted(metas.items()))
    if fuse:
        return fuse_packed_sites(packed, qmeta)
    return packed, qmeta


def tiled_packed_moe(cfg, w_bit: int = 4, group: int = 128):
    """(packed_params, qmeta) for a Mixtral-style MoE ModelConfig: one
    random weight per site tiled over layers; expert sites tiled over
    layers AND experts (throughput doesn't care about weight uniqueness —
    dense soft-dispatch streams every expert's packed weights each step
    regardless)."""
    L, E = cfg.num_layers, cfg.num_experts
    D, F, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    Q, KV = cfg.q_dim, cfg.kv_dim
    keys = jax.random.split(jax.random.PRNGKey(0), 10)

    def tile(a, lead):
        return jnp.broadcast_to(a[None], (lead,) + a.shape) if lead else a

    metas = {}
    layers = {
        "attn_norm": jnp.ones((L, D), jnp.bfloat16),
        "mlp_norm": jnp.ones((L, D), jnp.bfloat16),
        "router": {
            "w": tile(
                jax.random.normal(keys[0], (D, E), jnp.bfloat16) * 0.02, L
            )
        },
    }
    attn_shapes = {
        "q_proj": (D, Q),
        "k_proj": (D, KV),
        "v_proj": (D, KV),
        "o_proj": (Q, D),
    }
    for (site, sh), k in zip(attn_shapes.items(), keys[1:5]):
        w1 = jax.random.normal(k, sh, jnp.bfloat16) * 0.02
        qt = quantize_pack(w1, w_bit, group)
        layers[site] = {
            "data": tile(qt.data, L),
            "scales": tile(qt.scales, L),
            "zeros": tile(qt.zeros, L),
        }
        metas[site] = (w_bit, group, sh[0], sh[1])
    exp_shapes = {
        "exp_gate": (D, F),
        "exp_up": (D, F),
        "exp_down": (F, D),
    }
    for (site, sh), k in zip(exp_shapes.items(), keys[5:8]):
        w1 = jax.random.normal(k, sh, jnp.bfloat16) * 0.02
        qt = quantize_pack(w1, w_bit, group)
        layers[site] = {
            "data": tile(tile(qt.data, E), L),
            "scales": tile(tile(qt.scales, E), L),
            "zeros": tile(tile(qt.zeros, E), L),
        }
        metas[site] = (w_bit, group, sh[0], sh[1])
    head = jax.random.normal(keys[8], (D, V), jnp.bfloat16) * 0.02
    qt = quantize_pack(head, w_bit, group)
    packed = {
        "embed": jax.random.normal(keys[9], (V, D), jnp.bfloat16) * 0.02,
        "layers": layers,
        "final_norm": jnp.ones((D,), jnp.bfloat16),
        "lm_head": {"data": qt.data, "scales": qt.scales, "zeros": qt.zeros},
    }
    metas["lm_head"] = (w_bit, group, D, V)
    return packed, tuple(sorted(metas.items()))


def tiled_w8a8_llama(cfg):
    """(packed_params, qmeta) with per-CHANNEL int8 weights (one group
    spanning K) and 5-tuple ("a8") metas — the true W8A8 serving layout
    (ops.linear dispatches these through the int8-MXU W8A8 kernel with
    dynamic per-token activation quantization)."""
    L = cfg.num_layers
    D, F, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    Q, KV = cfg.q_dim, cfg.kv_dim
    keys = jax.random.split(jax.random.PRNGKey(0), 8)

    def tile(a):
        return jnp.broadcast_to(a[None], (L,) + a.shape)

    site_shapes = {
        "q_proj": (D, Q),
        "k_proj": (D, KV),
        "v_proj": (D, KV),
        "o_proj": (Q, D),
        "gate_proj": (D, F),
        "up_proj": (D, F),
        "down_proj": (F, D),
    }
    metas = {}
    layers = {
        "attn_norm": jnp.ones((L, D), jnp.bfloat16),
        "mlp_norm": jnp.ones((L, D), jnp.bfloat16),
    }
    for (site, sh), k in zip(site_shapes.items(), keys[:7]):
        w1 = jax.random.normal(k, sh, jnp.bfloat16) * 0.02
        qt = quantize_pack(w1, 8, sh[0])  # per-channel: group == K
        layers[site] = {
            "data": tile(qt.data),
            "scales": tile(qt.scales),
            "zeros": tile(qt.zeros),
        }
        metas[site] = (8, sh[0], sh[0], sh[1], "a8")
        del w1, qt
    head_w = jax.random.normal(keys[7], (D, V), jnp.bfloat16) * 0.02
    qt = quantize_pack(head_w, 8, D)
    packed = {
        "embed": jax.random.normal(jax.random.PRNGKey(9), (V, D), jnp.bfloat16)
        * 0.02,
        "layers": layers,
        "final_norm": jnp.ones((D,), jnp.bfloat16),
        "lm_head": {"data": qt.data, "scales": qt.scales, "zeros": qt.zeros},
    }
    metas["lm_head"] = (8, D, D, V, "a8")
    return packed, tuple(sorted(metas.items()))
