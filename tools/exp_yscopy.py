"""Diagnostic: fused write+attn kernel runs but its cache outputs are
DISCARDED (old cache flows to ys). Wrong results; isolates ys-copy cost."""
import sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

import qtpu.models.llama as llama
_orig = llama._write_and_attend
def patched(q, k, v, layer_kv, start, mask, cfg):
    out, new_kv = _orig(q, k, v, layer_kv, start, mask, cfg)
    return out, layer_kv  # discard cache update
llama._write_and_attend = patched

from qtpu.models import TINYLLAMA_1_1B
from qtpu.bench.synth import tiled_packed_llama
from qtpu.serve import init_cache
from qtpu.serve.decode import greedy_generate

cfg = TINYLLAMA_1_1B
B, P = 8, 128
packed, qmeta = tiled_packed_llama(cfg, 4, 128)
prompt = jnp.asarray(np.random.default_rng(1).integers(0, cfg.vocab_size, (B, P)), jnp.int32)

def run(n):
    cache = init_cache(cfg, B, P + 300 + 8, quantized=True)
    t0 = time.perf_counter()
    toks, cache = greedy_generate(packed, prompt, cache, cfg, n, qmeta)
    float(jnp.sum(toks[:, -1]))
    return time.perf_counter() - t0

run(2); run(250)
best = min((run(250) - run(2)) / 248 for _ in range(3))
print(json.dumps({"exp": "ys_discarded", "ms": round(best*1e3,3), "tok_s": round(B/best,1)}))
