"""Sweep (bb, kb) program blocking of the fused write+attend kernel at a
given batch — the (bb, kb) body is a static unroll, and B=32 timing
suggests an instruction-stream cost beyond the VMEM budget the picker
optimizes. Per-layer ms via the scanned chain from make_decode_budget.

Usage: python tools/exp_attn_blocks.py [B] [S]
"""
import importlib
import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
S = int(sys.argv[2]) if len(sys.argv) > 2 else 512

mdb = importlib.import_module("make_decode_budget")

PAIRS = [(None, None), (8, 4), (4, 4), (2, 4), (1, 4), (8, 2), (8, 1), (4, 1)]
seen = set()
for bb, kb in PAIRS:
    if bb is not None and (B % bb or bb > B):
        continue
    os.environ.pop("QTPU_ATTN_BB", None)
    os.environ.pop("QTPU_ATTN_KB", None)
    if bb is not None:
        os.environ["QTPU_ATTN_BB"] = str(bb)
        os.environ["QTPU_ATTN_KB"] = str(kb)
    import jax

    jax.clear_caches()  # blocking is read at trace time
    try:
        ms = mdb.bench_attn_cache(B, S=S)
        label = f"bb{bb}_kb{kb}" if bb is not None else "auto"
        if label in seen:
            continue
        seen.add(label)
        print(
            json.dumps({"B": B, "S": S, "blocks": label,
                        "attn_ms_per_step": round(ms, 3),
                        "us_per_layer": round(ms / mdb.L * 1e3, 1)}),
            flush=True,
        )
    except Exception as e:  # noqa: BLE001 - sweep, record + continue
        print(json.dumps({"blocks": f"bb{bb}_kb{kb}", "error": str(e)[:200]}),
              flush=True)
