#!/usr/bin/env python
"""GPTQ calibration cost at scale (VERDICT r3 #8): measure per-site
prepare + sweep on 7B-shaped sites on the real chip, record the
chunked-map memory ceiling, and project full-model calibration time for
the 7B and 70B BASELINE configs. Writes results/gptq_calib_budget.json.

Run on the chip:  timeout 3000 python tools/exp_gptq_budget.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=3):
    """First call compiles; then best-of-reps with a scalar readback."""
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0][:1].astype(jnp.float32)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(
            jnp.sum(jax.tree_util.tree_leaves(out)[0][:1].astype(jnp.float32))
        )
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from qtpu.quant.gptq import (
        build_proxy_hessian,
        gptq_column_sweep,
        gptq_prepare_factor,
        gptq_prepare_factor_lowrank,
    )

    out = {
        "note": (
            "Measured on one v5e chip (relay). prepare = Hessian ->"
            " Cholesky factor U; sweep = error-compensated column sweep"
            " (blocksize 128, W4 g128). lowrank = O(C*S^2) Woodbury"
            " prepare from S=32 proxy stat vectors (the default for"
            " proxy-Hessian GPTQ); dense = O(C^3) factorization of a"
            " materialized Hessian (true-Hessian capture path)."
        ),
        "sites": {},
    }
    S = 32
    key = jax.random.PRNGKey(0)

    # 7B-Llama site geometry ([out, in]; Hessian is [in, in])
    sites_7b = {
        "qkv/gate-up (C=4096)": (4096, 4096),
        "o_proj (C=4096, N=4096)": (4096, 4096),
        "down_proj (C=11008)": (4096, 11008),
        "gate/up sweep (N=11008, C=4096)": (11008, 4096),
    }
    seen_C = {}
    for name, (N, C) in sites_7b.items():
        k1, k2, key = jax.random.split(key, 3)
        row = {}
        if C not in seen_C:
            v = jnp.abs(jax.random.normal(k1, (S, C), jnp.float32))
            H = build_proxy_hessian(v)
            t_dense = timeit(
                jax.jit(lambda H: gptq_prepare_factor(H, 0.01)), H
            )
            t_low = timeit(
                jax.jit(lambda v: gptq_prepare_factor_lowrank(v, 0.01)), v
            )
            seen_C[C] = {"prepare_dense_s": t_dense, "prepare_lowrank_s": t_low}
        row.update(seen_C[C])
        W = jax.random.normal(k2, (N, C), jnp.float32) * 0.02
        v = jnp.abs(jax.random.normal(k1, (S, C), jnp.float32))
        U = gptq_prepare_factor_lowrank(v, 0.01)

        def sweep(W, U):
            out = gptq_column_sweep(W, U, 4, 128, 128)
            return out[0]

        row["sweep_s"] = timeit(jax.jit(sweep), W, U)
        row["shape_out_in"] = [N, C]
        out["sites"][name] = row

    # chunked-map ceiling (quant/apply.py chunk formula): layers per chunk
    # holding one [chunk, C, C] factor + [chunk, N, C] weights in f32x4
    def chunk_of(K, N):
        return max(1, min(8, int(1.5e9 // (K * K * 16 + K * N * 16))))

    out["chunked_map"] = {
        "formula": "max(1, min(8, 1.5e9 // (C*C*16 + C*N*16)))",
        "7B qkv (4096,4096)": chunk_of(4096, 4096),
        "7B down (11008,4096)": chunk_of(11008, 4096),
        "70B qkv (8192,10240)": chunk_of(8192, 10240),
        "70B down (28672,8192)": chunk_of(28672, 8192),
    }

    # full-model projections: per layer = 4 input-site prepares + 7 site
    # sweeps (Llama); 70B scales the sweep by out*in and the prepare by
    # C (lowrank) resp. C^3 (dense)
    def proj(layers, site_list, prepares):
        sweep = 0.0
        for N, C in site_list:
            base = out["sites"]["gate/up sweep (N=11008, C=4096)"]["sweep_s"]
            sweep += base * (N * C) / (11008 * 4096)
        prep = 0.0
        for C in prepares:
            base_c = 4096 if C <= 8192 else 11008
            b = seen_C[base_c]["prepare_lowrank_s"]
            prep += b * C / base_c
        return layers * (sweep + prep)

    sites_7b_list = [(4096, 4096)] * 3 + [(4096, 4096)] + [(11008, 4096)] * 2 + [(4096, 11008)]
    out["projection_s"] = {
        "llama7b_w4_g128_lowrank": round(
            proj(32, sites_7b_list, [4096, 4096, 4096, 11008]), 1
        ),
        "llama70b_w4_g128_lowrank": round(
            proj(
                80,
                [(8192, 8192), (1024, 8192), (1024, 8192), (8192, 8192)]
                + [(28672, 8192)] * 2
                + [(8192, 28672)],
                [8192, 8192, 8192, 28672],
            ),
            1,
        ),
    }
    with open("/root/repo/results/gptq_calib_budget.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
