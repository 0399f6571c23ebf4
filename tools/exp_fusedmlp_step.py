"""A/B the fused-MLP megakernel inside the full serving decode step
(B=8 and B=32, staged delivery, int8 stacked cache — the headline
configuration). Prints ms/step and tok/s with the kernel on and off."""
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
BLOCK = 50


def step_ms(params, qmeta, B, P=128, n_small=1, n_large=6):
    prompt = jnp.asarray(
        np.random.default_rng(1).integers(0, cfg.vocab_size, (B, P)), jnp.int32
    )
    key = jax.random.PRNGKey(0)

    def run(n_blocks):
        cache = init_cache(cfg, B, P + n_large * BLOCK + 8, quantized=True)
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
    for B in (8, 32):
        for fused in (True, False):
            os.environ["QTPU_NO_FUSED_MLP"] = "" if fused else "1"
            # the env flag is read at TRACE time — drop the jit caches so
            # the flip actually retraces
            jax.clear_caches()
            ms = step_ms(packed, qmeta, B)
            print(
                json.dumps(
                    {
                        "B": B,
                        "fused_mlp": fused,
                        "ms_per_step": round(ms, 3),
                        "tok_s": round(B / ms * 1e3, 1),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
