"""Full-step decode time across (cache format x delivery mode x KV dtype)
on the real chip — finds the fastest serving configuration end-to-end.

Each cell: ms/step through the serving decode_multi path (B=8, prompt 128,
50-step blocks, best-of-3 differenced timing per bench.py methodology).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from qtpu.models import TINYLLAMA_1_1B
from qtpu.bench.synth import tiled_packed_llama
from qtpu.serve import init_cache
from qtpu.serve.decode import decode_multi, prefill

cfg = TINYLLAMA_1_1B
B, P = 8, 128
BLOCK = 50


def step_ms(params, qmeta, per_layer, quantized, n_small=1, n_large=6):
    prompt = jnp.asarray(
        np.random.default_rng(1).integers(0, cfg.vocab_size, (B, P)), jnp.int32
    )
    key = jax.random.PRNGKey(0)

    def run(n_blocks):
        cache = init_cache(
            cfg, B, P + n_large * BLOCK + 8, quantized=quantized,
            per_layer=per_layer,
        )
        t0 = time.perf_counter()
        logits, cache = prefill(params, prompt, cache, cfg, qmeta)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        pos = jnp.full((B,), P, jnp.int32)
        for _ in range(n_blocks):
            toks, cache = decode_multi(
                params, tok, pos, cache, None, key, cfg, BLOCK, qmeta
            )
            tok = toks[:, -1]
            pos = pos + BLOCK
        float(jnp.sum(tok))
        return time.perf_counter() - t0

    run(n_small)
    best = float("inf")
    for _ in range(3):
        t_s = run(n_small)
        t_l = run(n_large)
        best = min(best, (t_l - t_s) / ((n_large - n_small) * BLOCK))
    return best * 1e3


def main():
    packed, qmeta = tiled_packed_llama(cfg, 4, 128)
    results = {}
    cells = [
        # (label, delivery_env, per_layer, quantized)
        ("stacked_cache.staged.int8", "staged", False, True),
        ("perlayer_cache.unrolled.int8", None, True, True),
        ("perlayer_cache.unrolled.bf16", None, True, False),
        ("stacked_cache.staged.bf16", "staged", False, False),
        ("stacked_cache.stacked.int8", "stacked", False, True),
        ("perlayer_cache.unrolled.int8.stackedw", "stacked", True, True),
    ]
    only = os.environ.get("QTPU_EXP_ONLY")
    for label, env, per_layer, quant in cells:
        if only and only not in label:
            continue
        if env is None:
            os.environ.pop("QTPU_DECODE_DELIVERY", None)
        else:
            os.environ["QTPU_DECODE_DELIVERY"] = env
        try:
            ms = step_ms(packed, qmeta, per_layer, quant)
            results[label] = round(ms, 3)
            print(json.dumps({label: round(ms, 3), "tok_s": round(B / ms * 1e3, 1)}), flush=True)
        except Exception as e:  # noqa: BLE001 - experiment matrix, record + continue
            results[label] = f"ERROR: {type(e).__name__}: {str(e)[:200]}"
            print(json.dumps({label: results[label]}), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
