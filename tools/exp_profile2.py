"""Stacked scalar-prefetch vs xs-staging matmuls; attention-only cost."""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from functools import partial
from qtpu.models import TINYLLAMA_1_1B
from qtpu.bench.synth import tiled_packed_llama
from qtpu.models.ops import rms_norm, linear, apply_rope, rope_tables

cfg = TINYLLAMA_1_1B
B = 8
packed, qmeta = tiled_packed_llama(cfg, 4, 128)
qmeta_d = dict(qmeta)
qm = lambda s: qmeta_d.get(s)
L = cfg.num_layers

def mm_body(x, lp, l):
    h = rms_norm(x, lp["attn_norm"] if l is None else lp["attn_norm"][l], cfg.norm_eps)
    qkv = linear(h, lp["qkv_proj"], qm("qkv_proj"), layer=l)
    q = qkv[..., :cfg.q_dim]
    x = x + linear(q, lp["o_proj"], qm("o_proj"), layer=l)
    h = rms_norm(x, lp["mlp_norm"] if l is None else lp["mlp_norm"][l], cfg.norm_eps)
    gu = linear(h, lp["gateup_proj"], qm("gateup_proj"), layer=l)
    act = jax.nn.silu(gu[..., :cfg.intermediate_size].astype(jnp.float32)).astype(x.dtype) * gu[..., cfg.intermediate_size:]
    x = x + linear(act, lp["down_proj"], qm("down_proj"), layer=l)
    return x

@partial(jax.jit, static_argnames=("n",))
def matmuls_stacked(layers, x0, n):
    def step(x, _):
        def body(x, l):
            return mm_body(x, layers, l), None
        x, _ = jax.lax.scan(body, x, jnp.arange(L, dtype=jnp.int32))
        return x, None
    x, _ = jax.lax.scan(step, x0, None, length=n)
    return x

def timed(fn, *args):
    def run(n):
        x0 = jnp.ones((B, 1, cfg.hidden_size), jnp.bfloat16) * 0.01
        t0 = time.perf_counter()
        out = fn(*args, x0, n)
        float(jnp.sum(out.astype(jnp.float32)))
        return time.perf_counter() - t0
    run(2)
    return min((run(250) - run(2)) / 248 for _ in range(3)) * 1e3

print(json.dumps({"matmuls_stacked_ms": round(timed(matmuls_stacked, packed["layers"]), 3)}), flush=True)
