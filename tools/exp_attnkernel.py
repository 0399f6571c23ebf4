"""Isolate the fused write+attend kernel: chained invocations on ONE
layer's cache, no layer scan, no matmuls → per-invocation kernel cost."""
import sys, time, json, os
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from qtpu.kernels.pallas_kv_attention import (
    pallas_decode_attention_write, pallas_decode_attention_write_bf16,
)

B, H, KV, hd, S = 8, 32, 4, 64, 440
ks = jax.random.split(jax.random.PRNGKey(0), 8)
q0 = jax.random.normal(ks[0], (B, H, hd), jnp.bfloat16)
kn = jax.random.normal(ks[1], (B, 1, KV, hd), jnp.bfloat16)
vn = jax.random.normal(ks[2], (B, 1, KV, hd), jnp.bfloat16)
pos = jnp.full((B,), 200, jnp.int32)

kind = os.environ.get("QTPU_EXP", "int8")

@partial(jax.jit, static_argnames=("n",))
def chain(q0, kc, vc, ksc, vsc, n):
    def step(carry, _):
        q, kc, vc, ksc, vsc = carry
        if kind == "int8":
            out, kc, vc, ksc, vsc = pallas_decode_attention_write(
                q, kn, vn, kc, vc, ksc, vsc, pos)
        else:
            out, kc, vc = pallas_decode_attention_write_bf16(
                q, kn, vn, kc, vc, pos)
        return (out.astype(q.dtype), kc, vc, ksc, vsc), None
    carry, _ = jax.lax.scan(step, (q0, kc, vc, ksc, vsc), None, length=n)
    return carry[0]

def run(n):
    if kind == "int8":
        kc = jnp.zeros((B, KV, S, hd), jnp.int8)
        vc = jnp.zeros((B, KV, S, hd), jnp.int8)
        ksc = jnp.ones((B, KV, S), jnp.float32)
        vsc = jnp.ones((B, KV, S), jnp.float32)
    else:
        kc = jnp.zeros((B, KV, S, hd), jnp.bfloat16)
        vc = jnp.zeros((B, KV, S, hd), jnp.bfloat16)
        ksc = vsc = jnp.zeros((1,), jnp.float32)
    t0 = time.perf_counter()
    out = chain(q0, kc, vc, ksc, vsc, n)
    float(jnp.sum(out.astype(jnp.float32)))
    return time.perf_counter() - t0

run(8); run(2000)
best = min((run(2000) - run(8)) / 1992 for _ in range(3))
print(json.dumps({"kind": kind, "us_per_call": round(best*1e6, 2)}))
