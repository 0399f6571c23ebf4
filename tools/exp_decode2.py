"""Scanned decode with stacked scalar-prefetch weight delivery."""
import sys, time, json
sys.path.insert(0, "/root/repo")
import os
import numpy as np
import jax, jax.numpy as jnp
from qtpu.models import TINYLLAMA_1_1B
from qtpu.bench.synth import tiled_packed_llama
from qtpu.serve import init_cache
from qtpu.serve.decode import greedy_generate

cfg = TINYLLAMA_1_1B
B, P = 8, 128
packed, qmeta = tiled_packed_llama(cfg, 4, 128)
prompt = jnp.asarray(np.random.default_rng(1).integers(0, cfg.vocab_size, (B, P)), jnp.int32)

def scanned(n):
    cache = init_cache(cfg, B, P + 300 + 8, quantized=True)
    t0 = time.perf_counter()
    toks, cache = greedy_generate(packed, prompt, cache, cfg, n, qmeta)
    float(jnp.sum(toks[:, -1]))
    return time.perf_counter() - t0

scanned(2); scanned(250)
best = min((scanned(250) - scanned(2)) / 248 for _ in range(3))
print(json.dumps({"stacked": os.environ.get("QTPU_STACKED_WEIGHTS"), "ms": round(best*1e3,3), "tok_s": round(B/best,1)}))
