"""Calibration statistics collection (reference C6 + C7 + true Hessians).

The reference collects stats through torch forward hooks over a Python loop
of calibration batches (quantization_utils.py:204-262 for per-batch mean-abs
lists; smooth_quant_quantizer.py:33-104 for running max-abs). Here the model
forward *returns* per-input-site stats (capture modes, qtpu.models.llama)
and this module drives the batch loop, accumulating on device:

  mean_abs[site]: [n_batches, L, C]  — one vector per batch, like the
                   reference's per-layer lists (AWQ sums them; GPTQ's proxy
                   Hessian consumes them individually)
  max_abs[site]:  [L, C]             — running max over batches (SmoothQuant)
  hessian[site]:  [L, C, C]          — Σ XᵀX accumulated (true GPTQ); only
                   with collect_hessian=True

Under data parallelism the batch loop shards over the `data` mesh axis and
stats are combined with psum/max collectives (see qtpu.sharding).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from qtpu.models.llama import SITE_OF_INPUT


@dataclass
class CalibStats:
    """Aggregated calibration statistics keyed by input site."""

    mean_abs: dict  # site -> [n_batches, L, C] (head_in: [n_batches, C])
    max_abs: dict  # site -> [L, C] (head_in: [C])
    hessian: dict | None  # site -> [L, C, C] or None
    n_batches: int

    def importance(self, input_site: str) -> jnp.ndarray:
        """AWQ importance: sum of per-batch mean-abs vectors
        (awq_quantizer.py:57)."""
        return jnp.sum(self.mean_abs[input_site].astype(jnp.float32), axis=0)

    def for_linear_site(self, linear_site: str) -> str:
        """Input-site key feeding a given linear site."""
        for in_site, linears in SITE_OF_INPUT.items():
            if linear_site in linears:
                return in_site
        raise KeyError(linear_site)


def collect_calibration_stats(
    forward_fn,
    params,
    calib_batches,
    cfg,
    collect_hessian: bool = False,
    verbose: bool = False,
) -> CalibStats:
    """Run the capture forward over calibration batches and aggregate.

    calib_batches: iterable of [1, block] (or [B, block]) int32 id arrays.
    forward_fn: models.llama.forward-compatible callable.
    """
    capture = "hessian" if collect_hessian else "stats"
    mean_list = {}
    max_run = {}
    hess_run = {} if collect_hessian else None

    for i, ids in enumerate(calib_batches):
        ids = jnp.asarray(ids)
        _, stats = forward_fn(params, ids, cfg, capture=capture)
        for site, st in stats.items():
            mean_list.setdefault(site, []).append(st["mean_abs"])
            if site not in max_run:
                max_run[site] = st["max_abs"]
            else:
                max_run[site] = jnp.maximum(max_run[site], st["max_abs"])
            if collect_hessian:
                if site not in hess_run:
                    hess_run[site] = st["hessian"]
                else:
                    hess_run[site] = hess_run[site] + st["hessian"]
        if verbose and (i + 1) % 8 == 0:
            print(f"  calibration batch {i + 1}/{len(calib_batches)}")

    mean_abs = {s: jnp.stack(v) for s, v in mean_list.items() if v}
    return CalibStats(
        mean_abs=mean_abs,
        max_abs=max_run,
        hessian=hess_run,
        n_batches=len(calib_batches),
    )
