"""AWQ — activation-aware weight quantization (reference C9).

Behavioral model (awq_quantizer.py:22-84): channel importance = sum over
calibration batches of mean-abs input activation; the top
max(1, ceil(C·protect_ratio)) input channels are scaled up by
`scale_factor` before RTN quantization and scaled back down after, which
shrinks their relative quantization error.

Improvement over the reference: the reference's scale-factor search is a
stub returning the grid midpoint (awq_quantizer.py:114-126). Here
`awq_search_scale_factor` is a real importance-weighted reconstruction-error
grid search, run as a jitted scan over candidates. Reference-parity behavior
(fixed scale factor) is the default.

Weights here are in reference orientation [out_features, in_features]; the
model-level apply layer handles transposition from qtpu's [K, N] layout.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from qtpu.quant.rtn import pseudo_quantize


def _protection_scale_vec(
    importance: jnp.ndarray, protect_ratio: float, scale_factor
) -> jnp.ndarray:
    """Per-input-channel multiplier: scale_factor on the top-k important
    channels, 1 elsewhere. k = max(1, int(C * protect_ratio)) as in
    awq_quantizer.py:60-61."""
    C = importance.shape[0]
    n_protect = max(1, int(C * protect_ratio))
    _, idx = jax.lax.top_k(importance.astype(jnp.float32), n_protect)
    vec = jnp.ones((C,), jnp.float32).at[idx].set(scale_factor)
    return vec


@partial(jax.jit, static_argnames=("n_bit", "q_group_size", "protect_ratio"))
def awq_quantize(
    w_oi: jnp.ndarray,
    importance: jnp.ndarray,
    n_bit: int,
    q_group_size: int,
    protect_ratio: float = 0.01,
    scale_factor=2.0,
) -> jnp.ndarray:
    """AWQ fake-quantize one [out, in] weight given per-in-channel
    importance. scale_factor may be a Python float or a traced scalar."""
    orig_dtype = w_oi.dtype
    vec = _protection_scale_vec(importance, protect_ratio, scale_factor)
    w = w_oi.astype(jnp.float32) * vec[None, :]
    w = pseudo_quantize(w, n_bit=n_bit, q_group_size=q_group_size)
    w = w / vec[None, :]
    return w.astype(orig_dtype)


@partial(
    jax.jit,
    static_argnames=(
        "n_bit",
        "q_group_size",
        "protect_ratio",
        "scale_range",
        "n_grid",
    ),
)
def awq_search_scale_factor(
    w_oi: jnp.ndarray,
    importance: jnp.ndarray,
    n_bit: int,
    q_group_size: int,
    protect_ratio: float = 0.01,
    scale_range: tuple = (1.0, 2.0),
    n_grid: int = 20,
) -> jnp.ndarray:
    """Grid-search the protection scale factor minimizing the
    importance-weighted reconstruction error Σ_c imp_c · Σ_o (ŵ_oc − w_oc)²
    — the real search the reference stubs out. Returns the best scalar."""
    lo, hi = scale_range
    candidates = jnp.asarray(
        np.linspace(lo, hi, n_grid, dtype=np.float32)
    )
    wf = w_oi.astype(jnp.float32)
    imp = importance.astype(jnp.float32)

    def step(carry, sf):
        best_err, best_sf = carry
        w_q = awq_quantize(
            wf, imp, n_bit, q_group_size, protect_ratio, sf
        ).astype(jnp.float32)
        err = jnp.sum(jnp.sum((w_q - wf) ** 2, axis=0) * imp)
        take = err < best_err
        return (
            jnp.where(take, err, best_err),
            jnp.where(take, sf, best_sf),
        ), None

    init = (jnp.inf, candidates[0])
    (_, best_sf), _ = jax.lax.scan(step, init, candidates)
    return best_sf
