"""B=32 decode-step attribution (VERDICT r5 task #2): name the 0.7 ms of
unattributed step time in results/decode_budget.json B32.

Two instruments:
  1. jax.profiler trace around the REAL fused decode_multi program,
     parsed from the chrome-trace JSON (per-op device durations, top-K).
  2. Ablation timings of jit variants of the same step structure:
     full / no-head / no-attention / tiny-S (S-dependence of the carry).

Usage: python tools/exp_b32_profile.py [B] [S]
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from qtpu.models import TINYLLAMA_1_1B
from qtpu.bench.synth import tiled_packed_llama

cfg = TINYLLAMA_1_1B
B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
S = int(sys.argv[2]) if len(sys.argv) > 2 else 440
BLOCK = 50

packed, qmeta = tiled_packed_llama(cfg, 4, 128)


def make_run(S_run):
    from qtpu.serve import init_cache
    from qtpu.serve.decode import decode_multi, prefill

    prompt = jnp.asarray(
        np.random.default_rng(1).integers(0, cfg.vocab_size, (B, 96)), jnp.int32
    )
    key = jax.random.PRNGKey(0)

    def run(n_blocks):
        cache = init_cache(cfg, B, S_run, quantized=True)
        logits, cache = prefill(packed, prompt, cache, cfg, qmeta)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        pos = jnp.full((B,), 96, jnp.int32)
        for _ in range(n_blocks):
            toks, cache = decode_multi(
                packed, tok, pos, cache, None, key, cfg, BLOCK, qmeta
            )
            tok = toks[:, -1]
            pos = pos + 1  # stay within cache for any n_blocks
        float(jnp.sum(tok))

    return run


def timed(run, n_small=1, n_large=6, repeats=3):
    run(n_small)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter(); run(n_small); a = time.perf_counter() - t0
        t0 = time.perf_counter(); run(n_large); b = time.perf_counter() - t0
        best = min(best, (b - a) / (n_large - n_small))
    return best / BLOCK * 1e3  # ms per decode step


out = {"B": B, "S": S}
run = make_run(S)
out["full_step_ms"] = round(timed(run), 3)
print(json.dumps(out), flush=True)

# S-dependence: tiny cache (attention + cache traffic ~S; matmuls fixed)
for s_alt in (128, 1024):
    out[f"full_step_ms_S{s_alt}"] = round(timed(make_run(s_alt)), 3)
    print(json.dumps(out), flush=True)

# profiler trace of the real program
trace_dir = "/tmp/qtpu_b32_trace"
os.system(f"rm -rf {trace_dir}")
run(1)  # warm
jax.profiler.start_trace(trace_dir)
run(3)
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
