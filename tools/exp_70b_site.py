"""Execute ONE 70B-shaped GPTQ site end-to-end on the chip (VERDICT r5
task #9): the C=28672 down_proj — capture → low-rank prepare → sweep →
packed export — recording wall time per phase and peak HBM. Catches the
memory ceilings the projections in results/gptq_calib_budget.json cannot
(the U factor alone is C² f32 = 3.29 GB at this site).

Appends a "measured_70b_site" section to results/gptq_calib_budget.json.

Run (chip): timeout 3000 python tools/exp_70b_site.py
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def peak_mb():
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        for k in ("peak_bytes_in_use", "peak_bytes"):
            if k in stats:
                return round(stats[k] / 1e6, 1)
    except Exception:
        pass
    return None


def live_mb():
    """Resident device bytes across live jax arrays — the fallback memory
    accounting when the relay backend exposes no memory_stats() (peak_mb
    returns None there). Understates transient peaks inside a program but
    bounds the steady-state footprint between phases."""
    try:
        return round(
            sum(a.nbytes for a in jax.live_arrays()) / 1e6, 1
        )
    except Exception:
        return None


def main():
    from qtpu.models.ops import channel_stats
    from qtpu.core.packing import quantize_pack
    from qtpu.quant.gptq import (
        gptq_column_sweep,
        gptq_prepare_factor_lowrank,
    )

    N, C, S = 8192, 28672, 32
    row = {"site": "70B down_proj", "N": N, "C": C, "proxy_rows": S}
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)

    # phase 0: capture — the per-channel stats a calibration forward
    # produces for this input site (proxy-Hessian mode: S mean-abs rows).
    # Data generation is timed separately: it stands in for the model
    # forward, whose cost results/gptq_calib_budget.json already budgets.
    t0 = time.perf_counter()
    acts = jax.random.normal(k1, (S, 512, C), jnp.bfloat16)  # [S, T, C]
    acts.block_until_ready()
    row["datagen_s"] = round(time.perf_counter() - t0, 3)
    stats1 = jax.jit(lambda a: channel_stats(a[None])[0])
    stats1(acts[0]).block_until_ready()  # compile outside the timing
    t0 = time.perf_counter()
    vecs = [stats1(acts[i]) for i in range(S)]  # [C] per sample
    v = jnp.stack(vecs).astype(jnp.float32)  # [S, C]
    float(jnp.sum(v))
    row["capture_s"] = round(time.perf_counter() - t0, 3)
    del acts
    row["peak_mb_after_capture"] = peak_mb()
    row["live_mb_after_capture"] = live_mb()

    # phase 1: O(C·S²) low-rank prepare → U [C, C] (3.29 GB f32)
    prep = jax.jit(lambda v: gptq_prepare_factor_lowrank(v, 0.01))
    U = prep(v)
    float(jnp.sum(U[:1, :8]))
    t0 = time.perf_counter()
    U = prep(v)
    float(jnp.sum(U[:1, :8]))
    row["prepare_lowrank_s"] = round(time.perf_counter() - t0, 3)
    row["peak_mb_after_prepare"] = peak_mb()
    row["live_mb_after_prepare"] = live_mb()

    # phase 2: error-compensated column sweep over the full [N, C] site
    W = jax.random.normal(k2, (N, C), jnp.float32) * 0.02

    def sweep(W, U):
        return gptq_column_sweep(W, U, 4, 128, 128)

    sw = jax.jit(sweep)
    Q = sw(W, U)
    float(jnp.sum(Q[:1, :8]))
    t0 = time.perf_counter()
    Q = sw(W, U)
    float(jnp.sum(Q[:1, :8]))
    row["sweep_s"] = round(time.perf_counter() - t0, 3)
    row["peak_mb_after_sweep"] = peak_mb()
    row["live_mb_after_sweep"] = live_mb()

    # phase 3: packed int4 export ([C, N] orientation, group-halves)
    pk = jax.jit(lambda Q: quantize_pack(Q.T.astype(jnp.float32), 4, 128))
    qt = pk(Q)
    float(jnp.sum(qt.data[:1, :8].astype(jnp.float32)))
    t0 = time.perf_counter()
    qt = pk(Q)
    float(jnp.sum(qt.data[:1, :8].astype(jnp.float32)))
    row["pack_export_s"] = round(time.perf_counter() - t0, 3)
    row["peak_mb"] = peak_mb()
    row["live_mb"] = live_mb()
    row["packed_mb"] = round(
        (qt.data.nbytes + qt.scales.nbytes + qt.zeros.nbytes) / 1e6, 1
    )
    row["total_s"] = round(
        row["capture_s"] + row["prepare_lowrank_s"] + row["sweep_s"]
        + row["pack_export_s"], 3,
    )

    path = "/root/repo/results/gptq_calib_budget.json"
    with open(path) as f:
        data = json.load(f)
    data["measured_70b_site"] = row
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps(row, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
