"""Experiment: per-step Python-dispatch decode vs multi-step on-device scan.

Measures TinyLlama W4-packed decode tokens/s both ways on the real chip.
"""
import sys, time, json
import numpy as np
import jax
import jax.numpy as jnp

from qtpu.models import TINYLLAMA_1_1B
from qtpu.bench.synth import tiled_packed_llama
from qtpu.serve import init_cache
from qtpu.serve.decode import decode_step, prefill, greedy_generate

cfg = TINYLLAMA_1_1B
B, P = 8, 128
packed, qmeta = tiled_packed_llama(cfg, 4, 128)
prompt = jnp.asarray(np.random.default_rng(1).integers(0, cfg.vocab_size, (B, P)), jnp.int32)

def perstep(n):
    cache = init_cache(cfg, B, P + 300 + 8, quantized=True)
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

def scanned(n):
    cache = init_cache(cfg, B, P + 300 + 8, quantized=True)
    t0 = time.perf_counter()
    toks, cache = greedy_generate(packed, prompt, cache, cfg, n, qmeta)
    float(jnp.sum(toks[:, -1]))
    return time.perf_counter() - t0

# warm up / compile
perstep(2); scanned(2); scanned(250)
best_ps = min((perstep(250) - perstep(2)) / 248 for _ in range(3))
best_sc = min((scanned(250) - scanned(2)) / 248 for _ in range(3))
print(json.dumps({
    "perstep_tok_s": round(B / best_ps, 1),
    "scanned_tok_s": round(B / best_sc, 1),
    "perstep_ms": round(best_ps * 1e3, 3),
    "scanned_ms": round(best_sc * 1e3, 3),
}))
