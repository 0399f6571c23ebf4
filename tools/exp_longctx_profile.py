"""Long-context decode-step attribution (r5): name the 1.8-2.5 ms of
unattributed per-step time in results/decode_budget.json long_context
(B4/S16k, B2/S64k) — the per-layer flash-decode path.

jax.profiler trace around the REAL decode_multi program at the budget's
shapes, parsed from the chrome-trace JSON (per-op device durations).

Usage (chip): timeout 3000 python -u tools/exp_longctx_profile.py [B] [S]
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from qtpu.models import TINYLLAMA_1_1B
from qtpu.bench.synth import tiled_packed_llama

cfg = TINYLLAMA_1_1B
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
S = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
BLOCK = 25

packed, qmeta = tiled_packed_llama(cfg, 4, 128)


def make_run():
    from qtpu.serve import init_cache
    from qtpu.serve.decode import decode_multi, prefill

    P = 96
    pad = S - 160
    prompt = jnp.asarray(
        np.random.default_rng(1).integers(0, cfg.vocab_size, (B, P)),
        jnp.int32,
    )
    key = jax.random.PRNGKey(0)
    start = jnp.full((B,), pad, jnp.int32)

    def run(n_blocks):
        St = pad + P + 5 * BLOCK + 8
        St += (-St) % 2048
        cache = init_cache(cfg, B, St, quantized=True, per_layer=True)
        logits, cache = prefill(
            packed, prompt, cache, cfg, qmeta, start=start
        )
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        pos = jnp.full((B,), pad + P, jnp.int32)
        for _ in range(n_blocks):
            toks, cache = decode_multi(
                packed, tok, pos, cache, None, key, cfg, BLOCK, qmeta
            )
            tok = toks[:, -1]
            pos = pos + 1
        float(jnp.sum(tok))

    return run


out = {"B": B, "S": S}
run = make_run()
run(1)  # warm/compile

t0 = time.perf_counter(); run(1); a = time.perf_counter() - t0
t0 = time.perf_counter(); run(5); b = time.perf_counter() - t0
out["full_step_ms"] = round((b - a) / (4 * BLOCK) * 1e3, 3)
print(json.dumps(out), flush=True)

trace_dir = "/tmp/qtpu_longctx_trace"
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
run(2)
jax.profiler.stop_trace()

events = defaultdict(float)
pid_names = {}
total = 0.0
for path in glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True):
    with gzip.open(path, "rt") as f:
        tr = json.load(f)
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev.get("pid")] = ev.get("args", {}).get("name", "")
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pname = pid_names.get(ev.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        events[ev.get("name", "?")] += ev.get("dur", 0.0)
        total += ev.get("dur", 0.0)

top = sorted(events.items(), key=lambda kv: -kv[1])[:30]
out["device_total_us"] = round(total, 1)
out["device_tracks"] = sorted(set(pid_names.values()))[:10]
print(json.dumps(out), flush=True)
for name, us in top:
    print(json.dumps({"op": name[:110], "us": round(us, 1)}), flush=True)
