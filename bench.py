"""Headline benchmark: W4 packed decode throughput on TinyLlama-1.1B.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures autoregressive decode tokens/s (batch 8, prompt 128, int8 KV
cache) through the packed-W4 fused dequant-matmul serving path versus the
bf16 dense path on the same chip. The reference publishes no throughput
numbers at all (BASELINE.md "Not published"), so vs_baseline is the speedup
of the quantized path over this machine's own bf16 baseline — decode is
weight-bandwidth-bound, exactly where 4-bit weights pay off.

Decode steps are inherently chained (each consumes the previous token), so
the lazy relay backend cannot elide work; a final host readback fences, and
an N_small vs N_large difference cancels dispatch/readback overhead (see
qtpu.utils.timing.timed_chain notes).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def _decode_time_per_token(params, cfg, qmeta, B, prompt_len, n_small, n_large):
    from qtpu.serve import init_cache
    from qtpu.serve.decode import decode_step, prefill

    prompt = jax.random.randint(
        jax.random.PRNGKey(1), (B, prompt_len), 0, cfg.vocab_size
    )

    def run(n_steps):
        cache = init_cache(cfg, B, prompt_len + n_large + 8, quantized=True)
        t0 = time.perf_counter()
        logits, cache = prefill(params, prompt, cache, cfg, qmeta)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        pos = jnp.full((B,), prompt_len, jnp.int32)
        for _ in range(n_steps):
            logits, cache = decode_step(params, tok, pos, cache, cfg, qmeta)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            pos = pos + 1
        float(jnp.sum(tok))  # host readback = real fence on lazy backends
        return time.perf_counter() - t0

    run(n_small)  # compile both programs
    best = float("inf")
    for _ in range(2):
        t_small = run(n_small)
        t_large = run(n_large)
        best = min(best, (t_large - t_small) / (n_large - n_small))
    return best


def main():
    from qtpu.models import TINYLLAMA_1_1B, init_params
    from qtpu.quant.apply import pack_model

    cfg = TINYLLAMA_1_1B
    B, P = 8, 128
    params = init_params(cfg, jax.random.PRNGKey(0))

    t_dense = _decode_time_per_token(params, cfg, None, B, P, 4, 68)

    packed, qmeta = pack_model(params, "rtn", {"w_bit": 4, "q_group_size": 128})
    del params
    t_packed = _decode_time_per_token(packed, cfg, qmeta, B, P, 4, 68)

    tps_packed = B / t_packed
    tps_dense = B / t_dense
    print(
        json.dumps(
            {
                "metric": "tinyllama_w4_decode_tokens_per_s",
                "value": round(tps_packed, 1),
                "unit": "tokens/s/chip",
                "vs_baseline": round(tps_packed / tps_dense, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
