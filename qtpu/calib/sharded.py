"""Data-parallel calibration with explicit collectives (SURVEY §5.8).

The plain driver (qtpu.calib.stats) loops batches on one device. Here the
batch axis shards over the mesh's `data` axis and the per-site statistics
are combined with EXPLICIT shard_map collectives — psum for summed
statistics (mean-abs accumulation, XᵀX Hessians), max for running max-abs —
the pattern SURVEY §5.8 calls out for multi-host Hessian calibration
(per-host partial XᵀX, then psum over `data`).

Numerical contract: identical results to the single-device driver (tested
on the virtual CPU mesh), because sum/max over tokens commute with the
device partition of the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from qtpu.calib.stats import CalibStats


def collect_calibration_stats_sharded(
    forward_fn,
    params,
    calib_batches,
    cfg,
    mesh,
    collect_hessian: bool = False,
) -> CalibStats:
    """Sharded equivalent of collect_calibration_stats.

    calib_batches: list of [1, block] id arrays; they are concatenated and
    padded to a multiple of the data-axis size, then processed in one (or a
    few) sharded capture passes. Per-batch mean-abs vectors (which AWQ sums
    and GPTQ's proxy-Hessian consumes individually) are preserved exactly:
    each original batch row stays one stats "sample".
    """
    import numpy as np

    dp = mesh.shape["data"]
    ids = np.concatenate([np.asarray(b) for b in calib_batches], axis=0)
    n = ids.shape[0]
    pad = (-n) % dp
    if pad:
        ids = np.concatenate([ids, np.repeat(ids[-1:], pad, axis=0)], axis=0)

    capture = "hessian" if collect_hessian else "stats"

    # Per-row stats must stay separate for mean-abs (reference keeps a list
    # per layer, quantization_utils.py:233-236): vmap the capture forward
    # over rows inside the sharded region, shard the row axis over `data`.
    def one_row(params, row):
        _, stats = forward_fn(params, row[None], cfg, capture=capture)
        return stats

    batched = jax.jit(jax.vmap(one_row, in_axes=(None, 0)))

    # one dp-row pass at a time: per-row Hessians are [dp, L, C, C] live at
    # once — chunking keeps peak memory flat regardless of n_batches
    mean_parts = {}
    max_run = {}
    hess_run = {} if collect_hessian else None
    last_h = {}  # per-row Hessian of the LAST REAL row (pad correction)
    with jax.sharding.set_mesh(mesh):
        for lo in range(0, ids.shape[0], dp):
            chunk = jax.device_put(
                jnp.asarray(ids[lo : lo + dp]),
                NamedSharding(mesh, P("data", None)),
            )
            stats = batched(params, chunk)
            for site, st in stats.items():
                mean_parts.setdefault(site, []).append(st["mean_abs"])
                mx = jnp.max(st["max_abs"], axis=0)
                max_run[site] = (
                    mx if site not in max_run else jnp.maximum(max_run[site], mx)
                )
                if collect_hessian:
                    h = jnp.sum(st["hessian"], axis=0)
                    hess_run[site] = (
                        h if site not in hess_run else hess_run[site] + h
                    )
                    if lo <= n - 1 < lo + dp:
                        last_h[site] = st["hessian"][(n - 1) - lo]
    mean_abs = {
        s: jnp.concatenate(v, axis=0)[:n] for s, v in mean_parts.items()
    }
    # padding rows duplicate the last real row; their max can't exceed the
    # real max, and their Hessian contribution must be removed — using the
    # per-row Hessian the sharded pass already produced for that row (no
    # extra unsharded forward)
    if pad and collect_hessian:
        for site in hess_run:
            hess_run[site] = hess_run[site] - pad * last_h[site]
    return CalibStats(
        mean_abs=mean_abs, max_abs=max_run, hessian=hess_run, n_batches=n
    )


def psum_hessian_shardmap(local_xtx, mesh):
    """Explicit-collective building block: combine per-shard partial XᵀX
    into the global Hessian with a psum over `data` (shard_map form, for
    when collective placement must be controlled by hand)."""
    from jax import shard_map

    def combine(h):
        # h: this shard's rows of partial XᵀX [rows_local, C, C]
        return jax.lax.psum(jnp.sum(h, axis=0), "data")

    return shard_map(
        combine,
        mesh=mesh,
        in_specs=P("data"),
        out_specs=P(),
    )(local_xtx)
