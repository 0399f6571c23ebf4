"""SmoothQuant — activation→weight difficulty migration (reference C13).

Behavioral model (smooth_quant_quantizer.py:112-323): per linear layer,
s = clamp(act_max, 1e−5)^α / clamp(weight_col_max, 1e−5)^(1−α) over input
channels; W ← W / s; the network stays numerically equivalent because the
activation is multiplied by s before the matmul (the reference does this
with a forward pre-hook, :178-199; here the smoothing vector is a
first-class param consumed by the functional linear op — or folded into the
preceding normalization scale at serving time). Weights are then RTN
pseudo-quantized.

Improvement over the reference: the α search is a stub there
(smooth_quant_quantizer.py:360-371); here `search_alpha` really evaluates
the importance-weighted W-reconstruction error over an α grid. A W8A8
dynamic per-tensor activation-quantization path lives in the serving layer.

Weights are in reference orientation [out, in].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from qtpu.quant.rtn import pseudo_quantize


def compute_smoothing_scales(
    act_max: jnp.ndarray, w_oi: jnp.ndarray, alpha: float
) -> jnp.ndarray:
    """s = clamp(act_max,1e−5)^α / clamp(max_o |W|,1e−5)^(1−α), per input
    channel (smooth_quant_quantizer.py:156-166)."""
    a = jnp.clip(act_max.astype(jnp.float32), 1e-5, None)
    wmax = jnp.clip(
        jnp.max(jnp.abs(w_oi.astype(jnp.float32)), axis=0), 1e-5, None
    )
    s = jnp.power(a, alpha) / jnp.power(wmax, 1.0 - alpha)
    return jnp.clip(s, 1e-5, None)


def smooth_weights(w_oi: jnp.ndarray, smoothing_scale: jnp.ndarray) -> jnp.ndarray:
    """W' = W · diag(s⁻¹) over input channels."""
    return (w_oi.astype(jnp.float32) / smoothing_scale[None, :]).astype(w_oi.dtype)


def reverse_smoothing(w_oi: jnp.ndarray, smoothing_scale: jnp.ndarray) -> jnp.ndarray:
    """Inverse of smooth_weights (reference reverse_weight_smoothing,
    smooth_quant_quantizer.py:230-260)."""
    return (w_oi.astype(jnp.float32) * smoothing_scale[None, :]).astype(w_oi.dtype)


@partial(jax.jit, static_argnames=("n_bit", "q_group_size"))
def smoothquant_quantize(
    w_oi: jnp.ndarray,
    act_max: jnp.ndarray,
    n_bit: int,
    q_group_size: int,
    alpha=0.5,
):
    """Smooth then RTN-quantize one layer. Returns (fake-quantized smoothed
    weight, smoothing_scale). The caller must arrange for activations to be
    multiplied by smoothing_scale at serve time (numerical equivalence)."""
    s = compute_smoothing_scales(act_max, w_oi, alpha)
    w_s = smooth_weights(w_oi, s)
    w_q = pseudo_quantize(w_s, n_bit=n_bit, q_group_size=q_group_size)
    return w_q, s


@partial(
    jax.jit, static_argnames=("n_bit", "q_group_size", "alpha_range", "n_grid")
)
def search_alpha(
    w_oi: jnp.ndarray,
    act_max: jnp.ndarray,
    n_bit: int = 8,
    q_group_size: int = -1,
    alpha_range: tuple = (0.0, 1.0),
    n_grid: int = 20,
) -> jnp.ndarray:
    """Real α grid search (the reference stubs this out): minimize the
    activation-weighted reconstruction error of the de-smoothed quantized
    weight, Σ_c act_max_c · Σ_o (ŵ_oc·s_c − w_oc)²."""
    lo, hi = alpha_range
    alphas = jnp.asarray(np.linspace(lo, hi, n_grid, dtype=np.float32))
    wf = w_oi.astype(jnp.float32)
    amax = jnp.clip(act_max.astype(jnp.float32), 1e-5, None)
    wmax = jnp.clip(jnp.max(jnp.abs(wf), axis=0), 1e-5, None)

    def step(carry, alpha):
        best_err, best_alpha = carry
        s = jnp.clip(
            jnp.power(amax, alpha) / jnp.power(wmax, 1.0 - alpha), 1e-5, None
        )
        w_s = wf / s[None, :]
        w_q = pseudo_quantize(w_s, n_bit=n_bit, q_group_size=q_group_size)
        recon = w_q.astype(jnp.float32) * s[None, :]
        err = jnp.sum(jnp.sum((recon - wf) ** 2, axis=0) * amax)
        take = err < best_err
        return (
            jnp.where(take, err, best_err),
            jnp.where(take, alpha, best_alpha),
        ), None

    (_, best_alpha), _ = jax.lax.scan(step, (jnp.inf, alphas[0]), alphas)
    return best_alpha
