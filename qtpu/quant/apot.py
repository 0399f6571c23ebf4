"""Additive Power-of-Two (APOT) quantization (reference C12).

Behavioral model (pot_apot_quantizer.py:138-374): build a codebook of
levels, each a sum of n = max(1, n_bit//k) power-of-two terms where term i
draws from {0, 2^−i, 2^−(i+n), …}; normalize to max 1; symmetrize ±; cap at
32 levels by linspace subsampling; then per row-group grid-search a scale
s = s₀·c (s₀ = clamp(max|w|, 1e−5)) minimizing SSE of nearest-level
assignment.

TPU-first design: codebook generation is tiny host-side Python (as in the
reference); the hot nearest-level assignment avoids the reference's
[rows, cols, n_levels] distance tensor (it chunks columns to dodge OOM,
pot_apot_quantizer.py:266-298) by exploiting sortedness: a vectorized
`searchsorted` + adjacent-neighbor compare is O(log L) per element with O(1)
temp memory, and the candidate grid is a jitted `lax.scan`. Ties resolve to
the lower level index, matching torch.argmin's first-occurrence rule.
"""

from __future__ import annotations

import itertools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


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



def generate_apot_levels(n: int, k: int) -> np.ndarray:
    """All (2^k)^n additive-power-of-two sums, deduplicated and sorted
    ascending (unsigned). Host-side; the result is a small constant."""
    num_choices = 2**k
    per_term = []
    for i in range(n):
        vals = [0.0]
        for j in range(1, num_choices):
            vals.append(2.0 ** (-(i + (j - 1) * n)))
        per_term.append(vals)
    sums = {float(sum(combo)) for combo in itertools.product(*per_term)}
    return np.array(sorted(sums), dtype=np.float32)


def full_apot_codebook(n_bit: int, k: int, max_levels: int = 32) -> np.ndarray:
    """Signed, normalized, capped codebook: {-L reversed, 0, +L}, max |v| = 1,
    subsampled by linspace if longer than max_levels."""
    n = max(1, n_bit // k)
    levels = generate_apot_levels(n, k)
    mx = levels.max()
    if mx > 0:
        levels = levels / mx
    pos = levels[levels > 0]
    full = np.concatenate([-pos[::-1], [0.0], pos]).astype(np.float32)
    if full.size > max_levels:
        idx = np.linspace(0, full.size - 1, max_levels).astype(np.int64)
        full = full[idx]
    return full


def _nearest_level(x: jnp.ndarray, levels: jnp.ndarray) -> jnp.ndarray:
    """Map each element of x to its nearest codebook level. Ties go to the
    lower index (torch.argmin first-occurrence parity).

    Branchless running-min over the ≤32 levels: a static unroll of
    compare/select ops. (searchsorted/gather formulations lower poorly on
    this TPU backend — a [2048×5632] searchsorted hung the chip.)"""
    n = levels.shape[0]
    best_d = jnp.abs(x - levels[0])
    best_v = jnp.full_like(x, levels[0])
    for i in range(1, n):
        d = jnp.abs(x - levels[i])
        take = d < best_d  # strict: earlier (lower) level wins ties
        best_d = jnp.where(take, d, best_d)
        best_v = jnp.where(take, levels[i], best_v)
    return best_v


def apot_quantize_tensor(
    w: jnp.ndarray,
    n_bit: int = 4,
    q_group_size: int = -1,
    k: int = 2,
    grid: tuple = (0.01, 2.01, 0.05),
    grid_values: tuple | None = None,
) -> jnp.ndarray:
    """Chunked dispatcher for `_apot_quantize_tensor_jit`: splits grouped
    rows into bounded programs (pot._SCAN_CHUNK_ELEMS — the candidate-scan
    quantizers crash the v5e worker above ~2^25 f32 elements/program)."""
    from qtpu.quant.pot import _SCAN_CHUNK_ELEMS

    if q_group_size <= 0 or w.size <= _SCAN_CHUNK_ELEMS:
        return _apot_quantize_tensor_jit(
            w, n_bit=n_bit, q_group_size=q_group_size, k=k, grid=grid,
            grid_values=grid_values,
        )
    orig_shape = w.shape
    g = q_group_size
    if orig_shape[-1] % g != 0:
        raise ValueError(f"last dim {orig_shape[-1]} % group {g} != 0")
    flat = w.reshape(-1, g)
    rows = max(1, (_SCAN_CHUNK_ELEMS // g // 8) * 8)
    outs = [
        _apot_quantize_tensor_jit(
            flat[i : i + rows], n_bit=n_bit, q_group_size=g, k=k,
            grid=grid, grid_values=grid_values,
        )
        for i in range(0, flat.shape[0], rows)
    ]
    return jnp.concatenate(outs, axis=0).reshape(orig_shape)


@partial(
    jax.jit,
    static_argnames=("n_bit", "q_group_size", "k", "grid", "grid_values"),
)
def _apot_quantize_tensor_jit(
    w: jnp.ndarray,
    n_bit: int = 4,
    q_group_size: int = -1,
    k: int = 2,
    grid: tuple = (0.01, 2.01, 0.05),
    grid_values: tuple | None = None,
) -> jnp.ndarray:
    """APOT fake-quantize a tensor; returns same shape/dtype."""
    orig_shape = w.shape
    orig_dtype = w.dtype
    if q_group_size > 0:
        if orig_shape[-1] % q_group_size != 0:
            raise ValueError(
                f"last dim {orig_shape[-1]} % group {q_group_size} != 0"
            )
        w = w.reshape(-1, q_group_size)
    w = w.astype(jnp.float32)

    levels = jnp.asarray(full_apot_codebook(n_bit, k))

    s0 = jnp.clip(jnp.max(jnp.abs(w), axis=1, keepdims=True), 1e-5, None)
    if grid_values is not None:
        candidates = jnp.asarray(np.array(grid_values, dtype=np.float32))
    else:
        start, stop, step = grid
        candidates = jnp.asarray(np.arange(start, stop, step, dtype=np.float32))

    def scan_step(carry, c):
        bh, bl, best_scale = carry
        s_c = s0 * c
        w_q = s_c * _nearest_level(w / s_c, levels)
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

    w_q = best_scale * _nearest_level(w / best_scale, levels)
    return w_q.reshape(orig_shape).astype(orig_dtype)


def _nearest_index(x: jnp.ndarray, levels: jnp.ndarray) -> jnp.ndarray:
    """Index form of _nearest_level (same branchless running-min)."""
    n = levels.shape[0]
    best_d = jnp.abs(x - levels[0])
    best_i = jnp.zeros(x.shape, jnp.int32)
    for i in range(1, n):
        d = jnp.abs(x - levels[i])
        take = d < best_d
        best_d = jnp.where(take, d, best_d)
        best_i = jnp.where(take, i, best_i)
    return best_i


def apot_quantize_codes(
    w_kn: jnp.ndarray,
    n_bit: int = 4,
    group_size: int = 128,
    k: int = 2,
    grid: tuple = (0.01, 2.01, 0.05),
    grid_values: tuple | None = None,
):
    """Chunked dispatcher for `_apot_quantize_codes_jit`: splits the
    independent N columns into bounded programs (see
    pot._SCAN_CHUNK_ELEMS); bit-identical to the single-program result.
    The codebook is shape-independent, so the first chunk's is returned."""
    from qtpu.quant.pot import _SCAN_CHUNK_ELEMS, _codes_col_chunks

    K, N = w_kn.shape
    step = _codes_col_chunks(N, K)
    if step >= N:
        return _apot_quantize_codes_jit(
            w_kn, n_bit=n_bit, group_size=group_size, k=k, grid=grid,
            grid_values=grid_values,
        )
    outs = [
        _apot_quantize_codes_jit(
            w_kn[:, i : i + step], n_bit=n_bit, group_size=group_size,
            k=k, grid=grid, grid_values=grid_values,
        )
        for i in range(0, N, step)
    ]
    codes = jnp.concatenate([o[0] for o in outs], axis=1)
    scales = jnp.concatenate([o[1] for o in outs], axis=1)
    return codes, scales, outs[0][2]


@partial(
    jax.jit,
    static_argnames=("n_bit", "group_size", "k", "grid", "grid_values"),
)
def _apot_quantize_codes_jit(
    w_kn: jnp.ndarray,
    n_bit: int = 4,
    group_size: int = 128,
    k: int = 2,
    grid: tuple = (0.01, 2.01, 0.05),
    grid_values: tuple | None = None,
):
    """Packed-serving variant of APOT: quantize a [K, N] weight (groups
    tiling K) to CODEBOOK INDICES.

    The codebook is capped at 2^n_bit levels so indices fit n_bit bits
    (the fake-quant path caps at 32 like the reference,
    pot_apot_quantizer.py:243-247 — at n_bit=4 packed storage therefore
    uses a 16-level subsample; a one-quantum fidelity trade for real 4-bit
    storage). Returns (codes uint8 [K, N], scales f32 [K/g, N],
    codebook f32 [≤2^n_bit]); decode w = scale · codebook[code].
    """
    K, N = w_kn.shape
    g = group_size
    levels = jnp.asarray(full_apot_codebook(n_bit, k, max_levels=2**n_bit))
    w = w_kn.astype(jnp.float32).reshape(K // g, g, N)

    s0 = jnp.clip(jnp.max(jnp.abs(w), axis=1, keepdims=True), 1e-5, None)
    if grid_values is not None:
        candidates = jnp.asarray(np.array(grid_values, dtype=np.float32))
    else:
        start, stop, step = grid
        candidates = jnp.asarray(np.arange(start, stop, step, dtype=np.float32))

    def scan_step(carry, c):
        bh, bl, best_scale = carry
        s_c = s0 * c
        w_q = s_c * _nearest_level(w / s_c, levels)
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

    codes = _nearest_index(w / s, levels)
    return (
        codes.reshape(K, N).astype(jnp.uint8),
        s.reshape(K // g, N),
        levels,
    )
