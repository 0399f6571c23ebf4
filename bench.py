"""Headline benchmark: W4 packed decode throughput on TinyLlama-1.1B.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures autoregressive decode tokens/s (batch 8, prompt 128, int8 KV
cache) through the packed-W4 fused dequant-matmul serving path versus the
bf16 dense path on the same chip. The reference publishes no throughput
numbers at all (BASELINE.md "Not published"), so vs_baseline is the speedup
of the quantized path over this machine's own bf16 baseline — decode is
weight-bandwidth-bound, exactly where 4-bit weights pay off.

Relay-backend realities shape this file (measured, see
.claude/skills/verify/SKILL.md): host→device transfer runs ~13 MB/s and
numpy RNG ~10 MB/s, so params are generated ON DEVICE — per-layer DISTINCT
(full [L, ...] random draws: a broadcast-tiled stack lets XLA stream one
layer's bytes L times from cache, which produced a physically impossible
dense MFU of 1.88 in round 3; both paths must pay real HBM traffic).
block_until_ready does not fence, so timing chains decode steps (inherently
data-dependent) and differences N_small vs N_large runs around a scalar
host readback. The dense weight-stream MFU is asserted <= 1.02 (2% timer
noise over the measured READ-stream roofline; the r3 cheat read 1.88) so
a cheating baseline can never be reported again.
"""

import json
import sys
import time

import numpy as np


def _device_init(cfg):
    """Per-layer DISTINCT random weights, generated on device as full
    [L, ...] draws so both the dense and packed paths stream every layer's
    real bytes from HBM (a broadcast-tiled stack deduplicates to one
    layer's buffer and fakes an impossible dense baseline)."""
    import jax
    import jax.numpy as jnp

    L = cfg.num_layers
    D, F, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    Q, KV = cfg.q_dim, cfg.kv_dim
    keys = jax.random.split(jax.random.PRNGKey(0), 8)

    def w_layers(k, *sh):
        return jax.random.normal(k, (L,) + sh, jnp.bfloat16) * 0.02

    site_shapes = {
        "q_proj": (D, Q),
        "k_proj": (D, KV),
        "v_proj": (D, KV),
        "o_proj": (Q, D),
        "gate_proj": (D, F),
        "up_proj": (D, F),
        "down_proj": (F, D),
    }
    stacked = {
        site: w_layers(k, *sh)
        for (site, sh), k in zip(site_shapes.items(), keys[:7])
    }
    params = {
        "embed": jax.random.normal(keys[7], (V, D), jnp.bfloat16) * 0.02,
        "layers": {
            "attn_norm": jnp.ones((L, D), jnp.bfloat16),
            "mlp_norm": jnp.ones((L, D), jnp.bfloat16),
            **{s: {"w": w} for s, w in stacked.items()},
        },
        "final_norm": jnp.ones((D,), jnp.bfloat16),
        "lm_head": {
            "w": jax.random.normal(jax.random.PRNGKey(9), (D, V), jnp.bfloat16)
            * 0.02
        },
    }
    return params, stacked


def _device_pack(cfg, stacked, lm_head_w, w_bit, group):
    """Pack every layer's weight on device (one jitted vmap per site)."""
    import jax

    from qtpu.core.packing import quantize_pack

    metas = {}
    layers = {}
    for site, w in stacked.items():
        qt = jax.jit(
            jax.vmap(lambda x: quantize_pack(x, w_bit, group))
        )(w)
        layers[site] = {
            "data": qt.data,
            "scales": qt.scales,
            "zeros": qt.zeros,
        }
        metas[site] = (w_bit, group, w.shape[1], w.shape[2])
    qt = quantize_pack(lm_head_w, w_bit, group)
    head = {"data": qt.data, "scales": qt.scales, "zeros": qt.zeros}
    metas["lm_head"] = (w_bit, group, lm_head_w.shape[0], lm_head_w.shape[1])
    return layers, head, tuple(sorted(metas.items()))


def _decode_time_per_token(params, cfg, qmeta, B, prompt_len, n_small, n_large):
    """Tokens/s through the SERVING decode path: blocks of `BLOCK` steps per
    compiled program (qtpu.serve.decode.decode_multi — the unit the
    continuous batcher drives), one host dispatch per block. Per-step
    Python dispatch measured ~0.76 ms/step on this relay backend (~27% of
    a whole step), so benchmarking the per-step loop understated the
    framework; serving amortizes it and so does this."""
    import jax
    import jax.numpy as jnp

    from qtpu.serve import init_cache
    from qtpu.serve.decode import decode_multi, prefill

    BLOCK = 50
    prompt = jnp.asarray(
        np.random.default_rng(1).integers(0, cfg.vocab_size, (B, prompt_len)),
        jnp.int32,
    )
    temps = None  # static all-greedy: no per-step sampling program
    key = jax.random.PRNGKey(0)

    def run(n_blocks):
        cache = init_cache(
            cfg, B, prompt_len + n_large * BLOCK + 8, quantized=True
        )
        t0 = time.perf_counter()
        logits, cache = prefill(params, prompt, cache, cfg, qmeta)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        pos = jnp.full((B,), prompt_len, jnp.int32)
        for b in range(n_blocks):
            toks, cache = decode_multi(
                params, tok, pos, cache, temps, key, cfg, BLOCK, qmeta
            )
            tok = toks[:, -1]
            pos = pos + BLOCK
        float(jnp.sum(tok))  # host readback = real fence on lazy backends
        return time.perf_counter() - t0

    run(n_small)  # compile prefill + decode programs
    best = float("inf")
    for _ in range(3):  # relay timing jitter is ±10%; take best-of-3
        t_small = run(n_small)
        t_large = run(n_large)
        best = min(best, (t_large - t_small) / ((n_large - n_small) * BLOCK))
    return max(best, 1e-9)


def _measure_hbm_gbps():
    """Read+write copy-chain bandwidth — the roofline denominator for the
    MFU numbers (VERDICT r2 task #6). ~15 s including compile."""
    import time as _t
    from functools import partial

    import jax
    import jax.numpy as jnp

    x = jnp.zeros((256, 1024, 1024), jnp.int8)  # 256 MB

    @partial(jax.jit, static_argnames=("n",))
    def chain(x, n):
        def body(c, _):
            return c + 1, None

        c, _ = jax.lax.scan(body, x, None, length=n)
        return c

    def run(n):
        t0 = _t.perf_counter()
        float(jnp.sum(chain(x, n)[0, 0, :8].astype(jnp.float32)))
        return _t.perf_counter() - t0

    run(2)
    best = min((run(40) - run(2)) / 38 for _ in range(3))
    copy_gbps = (2 * x.nbytes / 1e9) / best

    # READ-ONLY stream: decode streams weights without writing them back,
    # and a pure-read stream beats the read+write copy loop on v5e — with
    # only the copy number as denominator the dense path (which IS at its
    # roofline) measured an "impossible" MFU of 1.000-1.01. The xor with
    # the carry keeps the reduce un-hoistable; XLA fuses it into the
    # reduction, so nothing is written.
    @partial(jax.jit, static_argnames=("n",))
    def chain_r(x, n):
        def body(s, _):
            v = jnp.sum(jnp.bitwise_xor(x, s), dtype=jnp.int32)
            return (v & 1).astype(jnp.int8), None

        s, _ = jax.lax.scan(body, jnp.int8(0), None, length=n)
        return s

    def run_r(n):
        t0 = _t.perf_counter()
        float(chain_r(x, n))
        return _t.perf_counter() - t0

    run_r(2)
    best_r = min((run_r(40) - run_r(2)) / 38 for _ in range(3))
    read_gbps = (x.nbytes / 1e9) / best_r
    return max(copy_gbps, read_gbps)


def _streamed_bytes(params):
    """Bytes a decode step must stream for weights: all layer leaves +
    lm_head (+final norm; embed row-gather is negligible)."""
    import jax

    return sum(
        a.nbytes for a in jax.tree_util.tree_leaves(params["layers"])
    ) + sum(a.nbytes for a in jax.tree_util.tree_leaves(params["lm_head"]))


def main():
    from qtpu.models import TINYLLAMA_1_1B

    cfg = TINYLLAMA_1_1B
    B, P = 8, 128

    params, singles = _device_init(cfg)
    layers_packed, head_packed, qmeta = _device_pack(
        cfg, singles, params["lm_head"]["w"], 4, 128
    )
    packed = {
        "embed": params["embed"],
        "layers": {
            "attn_norm": params["layers"]["attn_norm"],
            "mlp_norm": params["layers"]["mlp_norm"],
            **layers_packed,
        },
        "final_norm": params["final_norm"],
        "lm_head": head_packed,
    }
    from qtpu.quant.apply import fuse_packed_sites

    packed, qmeta = fuse_packed_sites(packed, qmeta)  # qkv + gate/up fused

    t_packed = _decode_time_per_token(packed, cfg, qmeta, B, P, 1, 6)
    t_dense = _decode_time_per_token(params, cfg, None, B, P, 1, 6)

    tps_packed = B / t_packed
    tps_dense = B / t_dense
    # weight-stream MFU: fraction of the time the step's weight bytes
    # would take at the measured copy bandwidth (1.0 = every step is pure
    # weight streaming at full HBM speed — the decode speed-of-light)
    gbps = _measure_hbm_gbps()
    mfu_packed = (_streamed_bytes(packed) / 1e9 / gbps) / t_packed
    mfu_dense = (_streamed_bytes(params) / 1e9 / gbps) / t_dense
    # A weight-stream fraction above 1.0 is physically impossible (the step
    # finished faster than its own weight bytes could move at measured HBM
    # speed) — it means a path is not streaming real bytes (e.g. a
    # broadcast-deduplicated weight stack). Refuse to report such a run.
    # 1.02: the dense path runs AT the measured read roofline, so pure
    # timer/bandwidth session noise can land an honest run epsilon over
    # 1.0 (observed 1.000-1.01); the r3 cheat this guards against read
    # 1.88. Anything past 2% is still refused.
    assert mfu_dense <= 1.02, (
        f"impossible dense MFU {mfu_dense:.3f} — dense path is not "
        "streaming real weight bytes; benchmark invalid"
    )
    assert mfu_packed <= 1.02, (
        f"impossible packed MFU {mfu_packed:.3f} — packed path is not "
        "streaming real weight bytes; benchmark invalid"
    )
    print(
        json.dumps(
            {
                "metric": "tinyllama_w4_decode_tokens_per_s",
                "value": round(tps_packed, 1),
                "unit": "tokens/s/chip",
                "vs_baseline": round(tps_packed / tps_dense, 4),
                "mfu_weight_stream": round(mfu_packed, 4),
                "mfu_weight_stream_dense": round(mfu_dense, 4),
                "hbm_gbps_measured": round(gbps, 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
