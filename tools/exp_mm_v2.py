"""Packed-matmul unpack-chain variants, measured as the 4-site decode layer
chain (stacked scalar-prefetch delivery, the direct-HBM mode).

Variants (env QTPU_UNPACK): i32 (current split-dots), i8 (int8-native
nibble ops, no i32 round trip).
Usage: python tools/exp_mm_v2.py i32|i8 [B]
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")
os.environ["QTPU_UNPACK"] = sys.argv[1] if len(sys.argv) > 1 else "i32"

import jax
import jax.numpy as jnp

from qtpu.models import TINYLLAMA_1_1B
from qtpu.bench.synth import tiled_packed_llama
from qtpu.models.ops import linear, rms_norm

cfg = TINYLLAMA_1_1B
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
L = cfg.num_layers

packed, qmeta = tiled_packed_llama(cfg, 4, 128)
qmeta_d = dict(qmeta)
qm = qmeta_d.get
layers = packed["layers"]


def mm_body(x, lp, l):
    h = rms_norm(x, lp["attn_norm"][l], cfg.norm_eps)
    qkv = linear(h, lp["qkv_proj"], qm("qkv_proj"), layer=l)
    q = qkv[..., : cfg.q_dim]
    x = x + linear(q, lp["o_proj"], qm("o_proj"), layer=l)
    h = rms_norm(x, lp["mlp_norm"][l], cfg.norm_eps)
    gu = linear(h, lp["gateup_proj"], qm("gateup_proj"), layer=l)
    act = (
        jax.nn.silu(gu[..., : cfg.intermediate_size].astype(jnp.float32)).astype(x.dtype)
        * gu[..., cfg.intermediate_size :]
    )
    x = x + linear(act, lp["down_proj"], qm("down_proj"), layer=l)
    return x


@partial(jax.jit, static_argnames=("n",))
def chain(layers, x0, n):
    def step(x, _):
        def body(x, l):
            return mm_body(x, layers, l), None

        x, _ = jax.lax.scan(body, x, jnp.arange(L, dtype=jnp.int32))
        return x, None

    x, _ = jax.lax.scan(step, x0, None, length=n)
    return x


def run(n):
    x0 = jnp.ones((B, 1, cfg.hidden_size), jnp.bfloat16) * 0.01
    t0 = time.perf_counter()
    out = chain(layers, x0, n)
    float(jnp.sum(out.astype(jnp.float32)))
    return time.perf_counter() - t0


run(2)
best = min((run(60) - run(2)) / 58 for _ in range(3))
print(
    json.dumps(
        {
            "variant": os.environ["QTPU_UNPACK"],
            "B": B,
            "matmuls_ms_per_step": round(best * 1e3, 3),
        }
    )
)
