"""Power-of-Two (POT) quantization (reference C11).

Behavioral model (pot_apot_quantizer.py:25-115): per row-group of
`q_group_size` weights, represent w ≈ s · sign(w) · 2^E with E ∈
[0, 2^(b−1)−1]. The base scale s₀ = 2^(floor(log2 max|w|) − (2^(b−1)−1)) is
refined by a per-row grid search over s = s₀·c minimizing the row SSE.

TPU-first design: the reference's 200-iteration Python loop over grid
candidates becomes a single jitted `lax.scan` over the candidate axis with
full-tensor vectorized reconstruction per step — no host round-trips, and
the whole search compiles to one XLA program. Unlike the reference, the
`grid_search_range`/`grid_step` config knobs are honored (the reference
hardcodes its grid at pot_apot_quantizer.py:75).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_TINY = float(np.finfo(np.float32).tiny)


def _sse_df(d, axis):
    """Near-exact sum of the float32 SQUARES of d over `axis` in
    double-float form: returns (hi, lo) with hi + lo ≈ the exact sum of
    float32(d·d) (two-sum compensated halving tree, ~2⁻⁴⁸ relative).

    Why: the scale search picks argmin over SSE candidates whose true sums
    can differ by less than one f32 ulp; a plain f32 reduction collapses
    such pairs to an exact tie and the keep-first rule then diverges from
    the reference, flipping a whole group's scale (measured: 2 groups per
    tiny model = 0.31 ppl crosscheck gap). Comparing (hi, lo)
    lexicographically resolves ties the way the exact sum does — which
    matches the reference's pairwise f32 sums wherever those are accurate
    enough to see the difference."""
    hi = (d * d).astype(jnp.float32)
    lo = jnp.zeros_like(hi)
    while hi.shape[axis] > 1:
        n = hi.shape[axis]
        half = n // 2
        a_h = jax.lax.slice_in_dim(hi, 0, half, axis=axis)
        b_h = jax.lax.slice_in_dim(hi, half, 2 * half, axis=axis)
        a_l = jax.lax.slice_in_dim(lo, 0, half, axis=axis)
        b_l = jax.lax.slice_in_dim(lo, half, 2 * half, axis=axis)
        s = a_h + b_h
        t = s - a_h
        e = (a_h - (s - t)) + (b_h - t)  # two-sum rounding error
        l2 = a_l + b_l + e
        if n % 2:
            s = jnp.concatenate(
                [s, jax.lax.slice_in_dim(hi, n - 1, n, axis=axis)], axis=axis
            )
            l2 = jnp.concatenate(
                [l2, jax.lax.slice_in_dim(lo, n - 1, n, axis=axis)],
                axis=axis,
            )
        hi, lo = s, l2
    return hi, lo


def _df_less(ah, al, bh, bl):
    return (ah < bh) | ((ah == bh) & (al < bl))



def _pot_reconstruct(w, s, e_max_idx):
    """w_q = s * sign(w) * 2^clamp(round(log2(|w|/s)), 0, e_max_idx)."""
    ratio = jnp.clip(jnp.abs(w) / s, 1e-10, None)
    E = jnp.clip(jnp.round(jnp.log2(ratio)), 0, e_max_idx)
    return s * jnp.sign(w) * jnp.exp2(E)


@partial(
    jax.jit, static_argnames=("n_bit", "q_group_size", "grid", "grid_values")
)
def pot_quantize_tensor(
    w: jnp.ndarray,
    n_bit: int = 4,
    q_group_size: int = -1,
    grid: tuple = (0.01, 2.01, 0.01),
    grid_values: tuple | None = None,
) -> jnp.ndarray:
    """POT fake-quantize a tensor; returns same shape/dtype.

    grid = (start, stop, step) for the per-row scale multiplier search.
    grid_values (explicit candidate multipliers) overrides grid — the
    reference-parity path passes torch.arange's exact float32 values
    (1-ulp grid differences measurably move which scale wins the SSE
    race, see quant.apply._parity_grid).
    """
    orig_shape = w.shape
    orig_dtype = w.dtype
    if q_group_size > 0:
        if orig_shape[-1] % q_group_size != 0:
            raise ValueError(
                f"last dim {orig_shape[-1]} % group {q_group_size} != 0"
            )
        w = w.reshape(-1, q_group_size)
    w = w.astype(jnp.float32)

    n_levels = 2 ** (n_bit - 1)
    e_max_idx = n_levels - 1

    max_val = jnp.max(jnp.abs(w), axis=1, keepdims=True)
    max_val_safe = jnp.clip(max_val, 1e-12, None)
    e_min = jnp.floor(jnp.log2(max_val_safe)) - e_max_idx
    s0 = jnp.clip(jnp.exp2(e_min), _TINY, None)

    if grid_values is not None:
        candidates = jnp.asarray(np.array(grid_values, dtype=np.float32))
    else:
        start, stop, step = grid
        candidates = jnp.asarray(np.arange(start, stop, step, dtype=np.float32))

    def scan_step(carry, c):
        bh, bl, best_scale = carry
        s_c = jnp.clip(s0 * c, _TINY, None)
        w_q = _pot_reconstruct(w, s_c, e_max_idx)
        eh, el = _sse_df(w - w_q, 1)
        take = _df_less(eh, el, bh, bl)
        return (
            jnp.where(take, eh, bh),
            jnp.where(take, el, bl),
            jnp.where(take, s_c, best_scale),
        ), None

    shp = (w.shape[0], 1)
    init = (
        jnp.full(shp, jnp.inf, jnp.float32),
        jnp.zeros(shp, jnp.float32),
        s0,
    )
    (_, _, best_scale), _ = jax.lax.scan(scan_step, init, candidates)

    best_scale = jnp.clip(best_scale, _TINY, None)
    w_q = _pot_reconstruct(w, best_scale, e_max_idx)
    return w_q.reshape(orig_shape).astype(orig_dtype)


def pot_codebook(n_bit: int) -> jnp.ndarray:
    """Level table for POT codes: index = signbit<<(b−1) | E →
    (1 − 2·signbit)·2^E."""
    nl = 2 ** (n_bit - 1)
    pos = jnp.exp2(jnp.arange(nl, dtype=jnp.float32))
    return jnp.concatenate([pos, -pos])


@partial(
    jax.jit, static_argnames=("n_bit", "group_size", "grid", "grid_values")
)
def pot_quantize_codes(
    w_kn: jnp.ndarray,
    n_bit: int = 4,
    group_size: int = 128,
    grid: tuple = (0.01, 2.01, 0.01),
    grid_values: tuple | None = None,
):
    """Packed-serving variant: quantize a [K, N] weight (groups tiling K)
    to POT CODES instead of fake values.

    Returns (codes uint8 [K, N] with sign<<(b−1) | E, scales f32 [K/g, N]).
    Decode: w = scale · (1 − 2·signbit) · 2^E. Note: exact-zero weights
    decode to +scale·2^0 (the smallest positive level) — the sign(0)=0 case
    the fake-quant path preserves has no code; error is one quantum.
    """
    K, N = w_kn.shape
    g = group_size
    w = w_kn.astype(jnp.float32).reshape(K // g, g, N)
    n_levels = 2 ** (n_bit - 1)
    e_max_idx = n_levels - 1

    max_val = jnp.max(jnp.abs(w), axis=1, keepdims=True)
    e_min = jnp.floor(jnp.log2(jnp.clip(max_val, 1e-12, None))) - e_max_idx
    s0 = jnp.clip(jnp.exp2(e_min), _TINY, None)

    if grid_values is not None:
        candidates = jnp.asarray(np.array(grid_values, dtype=np.float32))
    else:
        start, stop, step = grid
        candidates = jnp.asarray(np.arange(start, stop, step, dtype=np.float32))

    def scan_step(carry, c):
        bh, bl, best_scale = carry
        s_c = jnp.clip(s0 * c, _TINY, None)
        w_q = _pot_reconstruct(w, s_c, e_max_idx)
        eh, el = _sse_df(w - w_q, 1)
        take = _df_less(eh, el, bh, bl)
        return (
            jnp.where(take, eh, bh),
            jnp.where(take, el, bl),
            jnp.where(take, s_c, best_scale),
        ), None

    shp = (K // g, 1, N)
    init = (
        jnp.full(shp, jnp.inf, jnp.float32),
        jnp.zeros(shp, jnp.float32),
        s0,
    )
    (_, _, s), _ = jax.lax.scan(scan_step, init, candidates)
    s = jnp.clip(s, _TINY, None)

    ratio = jnp.clip(jnp.abs(w) / s, 1e-10, None)
    E = jnp.clip(jnp.round(jnp.log2(ratio)), 0, e_max_idx).astype(jnp.int32)
    signbit = (w < 0).astype(jnp.int32)
    codes = (signbit << (n_bit - 1)) | E
    return (
        codes.reshape(K, N).astype(jnp.uint8),
        s.reshape(K // g, N),
    )
