"""Strip one component from the full staged decode program (monkeypatch
BEFORE first trace) to cost it: QTPU_EXP in {noattn, nowrite, nohead, full}."""
import sys, time, json, os
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

mode = os.environ.get("QTPU_EXP", "full")

import qtpu.models.llama as llama
import qtpu.serve.kvcache as kvc

if mode == "noattn":
    def fake_attn(q, layer_kv, mask, cfg, pos=None):
        B, T, H, hd = q.shape
        return q.reshape(B, T, H * hd) * 1e-3
    llama._cached_attention = fake_attn
elif mode == "nowrite":
    orig = kvc.cache_layer_write
    def no_write(layer_kv, new_k, new_v, start, quantized):
        return layer_kv
    kvc.cache_layer_write = no_write
    llama.cache_layer_write = no_write  # in case of direct import
elif mode == "nohead":
    pass  # handled below

from qtpu.models import TINYLLAMA_1_1B
from qtpu.bench.synth import tiled_packed_llama
from qtpu.serve import init_cache
from qtpu.serve.decode import greedy_generate

cfg = TINYLLAMA_1_1B
B, P = 8, 128
packed, qmeta = tiled_packed_llama(cfg, 4, 128)
if mode == "nohead":
    # shrink lm_head to 2048x512 (16x smaller)
    import qtpu.core.packing as pk
    w = jax.random.normal(jax.random.PRNGKey(5), (cfg.hidden_size, 512), jnp.bfloat16)
    qt = pk.quantize_pack(w, 4, 128)
    packed["lm_head"] = {"data": qt.data, "scales": qt.scales, "zeros": qt.zeros}
    qmeta = tuple((k, v if k != "lm_head" else (4, 128, cfg.hidden_size, 512)) for k, v in qmeta)
    cfg = cfg.replace(vocab_size=512)

prompt = jnp.asarray(np.random.default_rng(1).integers(0, cfg.vocab_size, (B, P)), jnp.int32)

def run(n):
    cache = init_cache(cfg, B, P + 300 + 8, quantized=True)
    t0 = time.perf_counter()
    toks, cache = greedy_generate(packed, prompt, cache, cfg, n, qmeta)
    float(jnp.sum(toks[:, -1]))
    return time.perf_counter() - t0

run(2); run(250)
best = min((run(250) - run(2)) / 248 for _ in range(3))
print(json.dumps({"exp": mode, "ms": round(best*1e3,3), "tok_s": round(B/best,1)}))
