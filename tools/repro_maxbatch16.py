"""Minimized repro for the max_batch=16 TPU compiler crash (r4 note).

Builds the continuous batcher at max_batch=16 on the 1.1B-shape packed
model and drives one admission + decode block — the configuration that
crashed the TPU compiler during r4 serving tuning (max_batch=12 is the
shipped default). Run on the chip:

    timeout 1800 python tools/repro_maxbatch16.py [max_batch]

Prints OK + throughput if it now compiles, or the captured compiler error
(the artifact for an upstream issue report).
"""
import sys
import traceback

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from qtpu.models import TINYLLAMA_1_1B
    from qtpu.bench.synth import tiled_packed_llama
    from qtpu.serve.batching import ContinuousBatcher

    cfg = TINYLLAMA_1_1B
    packed, qmeta = tiled_packed_llama(cfg, 4, 128)
    try:
        b = ContinuousBatcher(
            packed, cfg, qmeta=qmeta, max_batch=mb, max_seq_len=512,
            kv_dtype="int8", decode_block=16, prefill_chunk=256,
        )
        rng = np.random.default_rng(0)
        for _ in range(mb + 4):
            b.submit(
                rng.integers(0, cfg.vocab_size, size=64), max_new_tokens=16
            )
        reqs = b.run()
        m = b.metrics()
        print(
            f"OK max_batch={mb}: {len(reqs)} requests, "
            f"{m['total_tokens']} tokens, "
            f"{m.get('tokens_per_s', 0):.1f} tok/s"
        )
        return 0
    except Exception:
        print(f"CRASH max_batch={mb}:")
        traceback.print_exc()
        return 1


if __name__ == "__main__":
    sys.exit(main())
