"""Component-wise decode step timing (params passed as jit args)."""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from functools import partial
from qtpu.models import TINYLLAMA_1_1B
from qtpu.bench.synth import tiled_packed_llama
from qtpu.models.ops import rms_norm, linear

cfg = TINYLLAMA_1_1B
B = 8
packed, qmeta = tiled_packed_llama(cfg, 4, 128)
qmeta_d = dict(qmeta)
qm = lambda s: qmeta_d.get(s)

@partial(jax.jit, static_argnames=("n",))
def matmuls_only(layers, x0, n):
    def step(x, _):
        def body(x, lp):
            h = rms_norm(x, lp["attn_norm"], cfg.norm_eps)
            qkv = linear(h, lp["qkv_proj"], qm("qkv_proj"))
            q = qkv[..., :cfg.q_dim]
            x = x + linear(q, lp["o_proj"], qm("o_proj"))
            h = rms_norm(x, lp["mlp_norm"], cfg.norm_eps)
            gu = linear(h, lp["gateup_proj"], qm("gateup_proj"))
            act = jax.nn.silu(gu[..., :cfg.intermediate_size].astype(jnp.float32)).astype(x.dtype) * gu[..., cfg.intermediate_size:]
            x = x + linear(act, lp["down_proj"], qm("down_proj"))
            return x, None
        x, _ = jax.lax.scan(body, x, layers)
        return x, None
    x, _ = jax.lax.scan(step, x0, None, length=n)
    return x

@partial(jax.jit, static_argnames=("n",))
def head_only(head, x0, n):
    def step(x, _):
        logits = linear(x[:, 0], head, qm("lm_head")).astype(jnp.float32)
        tok = jnp.argmax(logits, -1)
        return x + tok[:, None, None].astype(x.dtype) * 1e-9, None
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

out = {}
print("packed ready", flush=True)
out["matmuls_ms"] = round(timed(matmuls_only, packed["layers"]), 3)
print(json.dumps(out), flush=True)
out["head_ms"] = round(timed(head_only, packed["lm_head"]), 3)
print(json.dumps(out))
