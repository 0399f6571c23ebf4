"""W4 nibble-unpack floor microbench → results/w4_unpack_floor.json
(VERDICT r5 task #1c: prove where the VPU-unpack floor is, variant by
variant, at the decode gateup shape).

Times the STACKED delivery kernel (the serving path) at the decode
gateup site [8, 2048] × [2048, 11264] g128 under each QTPU_UNPACK
variant, plus two synthetic bounds:
  copy      — pure HBM copy bandwidth (jnp add chain on a big int8 array)
  no-unpack — same kernel structure but the MXU consumes the RAW packed
              bytes with no field isolation at all (wrong math, right
              traffic): the hard floor of "2 split dots + 1 convert"

Each variant row: isolated µs/call, effective packed GB/s, % of copy.
Run per-variant in a FRESH process (one Mosaic lowering failure poisons
later compiles): this script execs itself per variant.
"""
import json
import os
import subprocess
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

VARIANTS = ("i32", "lomix", "vtrick", "nounpack")
OUT = "/root/repo/results/w4_unpack_floor.json"


def run_variant(variant: str) -> dict:
    os.environ["QTPU_UNPACK"] = "i32" if variant in ("nounpack",) else variant
    if variant == "nounpack":
        os.environ["QTPU_NOUNPACK_TIMING"] = "1"
    import jax
    import jax.numpy as jnp

    from qtpu.models import TINYLLAMA_1_1B
    from qtpu.bench.synth import tiled_packed_llama
    from qtpu.kernels.dequant_matmul import quantized_matmul_stacked

    cfg = TINYLLAMA_1_1B
    L = cfg.num_layers
    packed, qmeta = tiled_packed_llama(cfg, 4, 128)
    site = packed["layers"]["gateup_proj"]
    meta = dict(qmeta)["gateup_proj"]
    K = meta[2]
    x0 = jnp.ones((8, K), jnp.bfloat16) * 0.01

    @partial(jax.jit, static_argnames=("n",))
    def chain(site, x, n):
        def body(c, i):
            y = quantized_matmul_stacked(
                c, site["data"], site["scales"], site["zeros"], meta, i % L
            )
            return (y[:, :K] * jnp.bfloat16(1e-3)).astype(jnp.bfloat16), None
        c, _ = jax.lax.scan(body, x, jnp.arange(n, dtype=jnp.int32))
        return c

    def run(n):
        float(jnp.sum(chain(site, x0, n).astype(jnp.float32)))

    def timed(n_small=2, n_large=4002, repeats=3):
        run(n_small)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter(); run(n_small); a = time.perf_counter() - t0
            t0 = time.perf_counter(); run(n_large); b = time.perf_counter() - t0
            best = min(best, (b - a) / (n_large - n_small))
        return best

    sec = timed()
    bytes_per = (
        site["data"].nbytes + site["scales"].nbytes + site["zeros"].nbytes
    ) / L
    return {
        "us_per_call": round(sec * 1e6, 2),
        "effective_gbps": round(bytes_per / sec / 1e9, 1),
        "bytes_per_call": int(bytes_per),
    }


def measure_copy() -> dict:
    import jax
    import jax.numpy as jnp

    x = jnp.zeros((256, 1024, 1024), jnp.int8)

    @partial(jax.jit, static_argnames=("n",))
    def chain(x, n):
        def body(c, _):
            return c + 1, None
        c, _ = jax.lax.scan(body, x, None, length=n)
        return c

    def run(n):
        float(jnp.sum(chain(x, n)[0, 0, :8].astype(jnp.float32)))

    run(2)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); run(2); a = time.perf_counter() - t0
        t0 = time.perf_counter(); run(40); b = time.perf_counter() - t0
        best = min(best, (b - a) / 38)
    return {"effective_gbps": round(2 * x.nbytes / best / 1e9, 1)}


if __name__ == "__main__":
    if len(sys.argv) > 1:
        what = sys.argv[1]
        res = measure_copy() if what == "copy" else run_variant(what)
        print("RESULT " + json.dumps({what: res}))
        sys.exit(0)

    rows = {}
    for what in ("copy",) + VARIANTS:
        p = subprocess.run(
            [sys.executable, __file__, what],
            capture_output=True, text=True, timeout=1800,
        )
        line = next(
            (l for l in p.stdout.splitlines() if l.startswith("RESULT ")), None
        )
        if line:
            rows.update(json.loads(line[len("RESULT "):]))
            print(line, flush=True)
        else:
            rows[what] = {"error": (p.stderr or p.stdout)[-400:]}
            print(json.dumps({what: "FAILED"}), flush=True)

    copy_gbps = rows.get("copy", {}).get("effective_gbps")
    for k, v in rows.items():
        if isinstance(v, dict) and "effective_gbps" in v and copy_gbps:
            v["pct_of_copy"] = round(100 * v["effective_gbps"] / copy_gbps, 1)
    out = {
        "shape": "decode gateup [8,2048]x[2048,11264] g128, stacked delivery",
        "note": (
            "'nounpack' feeds raw packed bytes to the split dots (wrong "
            "math, identical traffic/structure) — the hard floor of any "
            "in-kernel nibble isolation scheme; 'copy' is pure HBM "
            "read+write bandwidth. The gap copy->nounpack is the "
            "irreducible cost of 2 half-group MXU dots + 1 convert at "
            "M=8; nounpack->variant is the VPU field-isolation cost."
        ),
        "variants": rows,
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"ok": True, "out": OUT}))
