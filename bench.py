"""Headline benchmark: quantized-serving forward throughput on TinyLlama-1.1B.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures tokens/s of the packed-W4 fused dequant-matmul forward versus the
bf16 dense forward on the same chip. The reference publishes no throughput
numbers at all (BASELINE.md "Not published"), so vs_baseline is the speedup
of the quantized path over this machine's own bf16 baseline — >1.0 means
quantization is a net win at serving time, which is the whole point of real
packed storage.

Timing uses data-dependent chaining + host readback differencing
(qtpu.utils.timing.timed_chain) because on this TPU relay backend
block_until_ready does not actually fence.
"""

import json
import sys

import jax
import jax.numpy as jnp


def main():
    from qtpu.models import TINYLLAMA_1_1B, forward, init_params
    from qtpu.quant.apply import pack_model
    from qtpu.utils.timing import timed_chain

    cfg = TINYLLAMA_1_1B
    B, S = 8, 512
    params = init_params(cfg, jax.random.PRNGKey(0))
    ids0 = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0, cfg.vocab_size)

    def chain_step(qmeta, p):
        def step(ids):
            logits = forward(p, ids, cfg, qmeta=qmeta)
            # feed argmax back as the next input: every weight matmul is on
            # the critical path, so lazy backends cannot elide iterations
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

        return jax.jit(step)

    t_dense = timed_chain(chain_step(None, params), ids0, iters=6)

    packed, qmeta = pack_model(params, "rtn", {"w_bit": 4, "q_group_size": 128})
    del params
    t_packed = timed_chain(chain_step(qmeta, packed), ids0, iters=6)

    toks = B * S
    tps_packed = toks / t_packed
    tps_dense = toks / t_dense
    print(
        json.dumps(
            {
                "metric": "tinyllama_w4_forward_tokens_per_s",
                "value": round(tps_packed, 1),
                "unit": "tokens/s/chip",
                "vs_baseline": round(tps_packed / tps_dense, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
