"""Extended perf measurements beyond the driver's single bench.py metric.

Writes results/perf_tpu.json with:
  - llama2_7b_w4_decode_tokens_per_s: 7B-class W4-packed decode (the
    bf16 dense 7B does not fit a 16 GB chip alongside activations — packed
    W4 at 3.5 GB does; this is the serving win the reference cannot
    express at all)
  - tinyllama_prefill_tokens_per_s at S=2048 (flash-attention path)

Weights are generated on device, one layer per site tiled (see bench.py
notes on host RNG/transfer rates).
"""

import json
import sys
import time
from pathlib import Path

import numpy as np


def _tiled_packed_model(cfg, w_bit=4, group=128):
    import jax
    import jax.numpy as jnp

    from qtpu.core.packing import quantize_pack
    from qtpu.quant.apply import fuse_packed_sites

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
    return fuse_packed_sites(packed, tuple(sorted(metas.items())))


def decode_tps(packed, qmeta, cfg, B, P, n_small, n_large):
    import jax
    import jax.numpy as jnp

    from qtpu.serve import init_cache
    from qtpu.serve.decode import decode_step, prefill

    prompt = jnp.asarray(
        np.random.default_rng(1).integers(0, cfg.vocab_size, (B, P)), jnp.int32
    )

    def run(n):
        cache = init_cache(cfg, B, P + n_large + 8, quantized=True)
        t0 = time.perf_counter()
        logits, cache = prefill(packed, prompt, cache, cfg, qmeta)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        pos = jnp.full((B,), P, jnp.int32)
        for _ in range(n):
            logits, cache = decode_step(packed, tok, pos, cache, cfg, qmeta)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            pos = pos + 1
        float(jnp.sum(tok))
        return time.perf_counter() - t0

    run(n_small)
    t = (run(n_large) - run(n_small)) / (n_large - n_small)
    return B / max(t, 1e-9)


def prefill_tps(packed, qmeta, cfg, B, S, iters=6):
    import jax
    import jax.numpy as jnp

    from qtpu.models.llama import forward

    ids0 = jnp.asarray(
        np.random.default_rng(2).integers(0, cfg.vocab_size, (B, S)), jnp.int32
    )

    step = jax.jit(
        lambda ids: jnp.argmax(forward(packed, ids, cfg, qmeta=qmeta), -1).astype(
            jnp.int32
        )
    )

    def run(n):
        ids = ids0
        t0 = time.perf_counter()
        for _ in range(n):
            ids = step(ids)
        float(jnp.sum(ids))
        return time.perf_counter() - t0

    run(1)
    t = (run(iters + 1) - run(1)) / iters
    return B * S / max(t, 1e-9)


def main():
    from qtpu.models import LLAMA2_7B, TINYLLAMA_1_1B

    out = {}

    cfg = TINYLLAMA_1_1B
    packed, qmeta = _tiled_packed_model(cfg)
    out["tinyllama_w4_prefill_tokens_per_s_s2048"] = round(
        prefill_tps(packed, qmeta, cfg, B=2, S=2048), 1
    )
    del packed

    cfg7 = LLAMA2_7B
    packed7, qmeta7 = _tiled_packed_model(cfg7)
    out["llama2_7b_w4_decode_tokens_per_s"] = round(
        decode_tps(packed7, qmeta7, cfg7, B=8, P=128, n_small=2, n_large=34), 1
    )

    Path("results").mkdir(exist_ok=True)
    with open("results/perf_tpu.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
