#!/usr/bin/env python
"""Profile the continuous batcher's engine step under the bench mixed load:
where does wall-clock go (prefill programs / decode programs / host)?

Run on the chip:  timeout 3000 python tools/exp_batcher.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    from qtpu.bench.synth import tiled_packed_llama
    from qtpu.models import TINYLLAMA_1_1B
    from qtpu.serve import batching
    from qtpu.serve.batching import ContinuousBatcher

    cfg = TINYLLAMA_1_1B
    packed, qmeta = tiled_packed_llama(cfg, 4, 128)

    acc = {"fused": 0.0, "decode": 0.0,
           "n_fused": 0, "n_decode": 0}

    orig_fs = batching._fused_step
    orig_dm = batching.decode_multi

    def timed_fs(*a, **k):
        t0 = time.perf_counter()
        firsts, toks, cache = orig_fs(*a, **k)
        jax.device_get((firsts, toks))  # the engine reads these anyway
        acc["fused"] += time.perf_counter() - t0
        acc["n_fused"] += 1
        return firsts, toks, cache

    def timed_dm(*a, **k):
        t0 = time.perf_counter()
        toks, cache = orig_dm(*a, **k)
        np.asarray(toks)
        acc["decode"] += time.perf_counter() - t0
        acc["n_decode"] += 1
        return toks, cache

    batching._fused_step = timed_fs
    batching.decode_multi = timed_dm

    def load(eng, n):
        rng = np.random.default_rng(0)
        for _ in range(n):
            plen = int(rng.integers(16, 384))
            eng.submit(
                rng.integers(0, cfg.vocab_size, (plen,), dtype=np.int64),
                max_new_tokens=64,
            )

    def fresh():
        return ContinuousBatcher(
            packed, cfg, qmeta=qmeta, max_batch=8, max_seq_len=512,
            kv_dtype="int8", decode_block=16, prefill_chunk=128,
        )

    warm = fresh()
    load(warm, 24)
    warm.run()
    for k in acc:
        acc[k] = 0

    eng = fresh()
    load(eng, 24)
    t0 = time.perf_counter()
    eng.run()
    dt = time.perf_counter() - t0
    m = eng.metrics()
    tot = m["total_tokens"]
    print(f"total {dt:.3f}s, {tot} tokens, {tot/dt:.1f} tok/s")
    print(f"fused steps: {acc['fused']:.3f}s over {acc['n_fused']} "
          f"({1e3*acc['fused']/max(acc['n_fused'],1):.1f} ms each)")
    print(f"pure decode: {acc['decode']:.3f}s over {acc['n_decode']} blocks "
          f"({1e3*acc['decode']/max(acc['n_decode'],1):.1f} ms each)")
    print(f"other (host/sched): {dt - acc['fused'] - acc['decode']:.3f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
