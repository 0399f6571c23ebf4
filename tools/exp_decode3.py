"""decode_multi blocks with configurable weight delivery (env)."""
import sys, time, json, os
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from qtpu.models import TINYLLAMA_1_1B
from qtpu.bench.synth import tiled_packed_llama
from qtpu.serve import init_cache
from qtpu.serve.decode import decode_multi, prefill

cfg = TINYLLAMA_1_1B
B, P, BLOCK = 8, 128, 50
packed, qmeta = tiled_packed_llama(cfg, 4, 128)
prompt = jnp.asarray(np.random.default_rng(1).integers(0, cfg.vocab_size, (B, P)), jnp.int32)
key = jax.random.PRNGKey(0)

def run(n_blocks):
    cache = init_cache(cfg, B, P + 6 * BLOCK + 8, quantized=(os.environ.get("QTPU_KV", "int8") == "int8"), per_layer=(os.environ.get("QTPU_PERLAYER", "0") == "1"))
    t0 = time.perf_counter()
    logits, cache = prefill(packed, prompt, cache, cfg, qmeta)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    pos = jnp.full((B,), P, jnp.int32)
    for _ in range(n_blocks):
        toks, cache = decode_multi(packed, tok, pos, cache, None, key, cfg, BLOCK, qmeta)
        tok = toks[:, -1]
        pos = pos + BLOCK
    float(jnp.sum(tok))
    return time.perf_counter() - t0

run(1); run(6)
best = min((run(6) - run(1)) / 250 for _ in range(3))
print(json.dumps({"mode": os.environ.get("QTPU_STACKED_WEIGHTS", "default"),
                  "ms": round(best*1e3,3), "tok_s": round(B/best,1)}))
