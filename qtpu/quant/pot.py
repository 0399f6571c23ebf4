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

from qtpu.quant.pot_log2_table import LOG2_ROUND_UP_BITS

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


def _sse_torch_cpu(d, axis):
    """f32 sum of d·d over `axis` in the EXACT summation order of torch-CPU
    (the reference's eval backend), reverse-engineered and verified
    bit-exact at L ∈ {16..256} (r5): 8-wide vector lanes, FOUR interleaved
    accumulators (chunk i → acc i mod 4, each accumulated sequentially),
    accumulators combined ((a0+a1)+a2)+a3, then the 8 lanes reduced
    sequentially.

    Why not the double-float exact sum (_sse_df): the scale search picks
    argmin over candidates whose reconstructions can be quantization-
    equivalent near-ties; torch's f32 sum ROUNDS those SSEs, and its
    rounded ordering — not the true ordering — decides the reference's
    pick. At W8 (clamped-scale regime, many near-duplicate candidates)
    the df-exact ordering diverged in every group (±0.5 ppl crosscheck);
    replaying torch's adds makes the race bit-identical. Requires the
    reduced length to be a multiple of 8 (callers fall back to _sse_df
    otherwise). All adds are explicit HLO ops — XLA does not reassociate
    f32 arithmetic."""
    sq = (d * d).astype(jnp.float32)
    x = jnp.moveaxis(sq, axis, -1)
    g = x.shape[-1]
    n = g // 8
    x = x.reshape(x.shape[:-1] + (n, 8))
    if n >= 4:
        accs = [x[..., i, :] for i in range(4)]
        for i in range(4, n):
            accs[i % 4] = accs[i % 4] + x[..., i, :]
        a = ((accs[0] + accs[1]) + accs[2]) + accs[3]
    else:
        a = x[..., 0, :]
        for i in range(1, n):
            a = a + x[..., i, :]
    s = a[..., 0]
    for l in range(1, 8):
        s = s + a[..., l]
    return jnp.expand_dims(s, axis)



def _exact_pow2(E):
    """Exact f32 2^E for integer-valued E in [−126, 127], via the IEEE-754
    exponent field. XLA's exp2 is 1 ulp off at 108 of the 128 exponents a
    W8 POT code can take (measured r5, CPU backend) — enough to shift
    every reconstructed weight and break bit-parity with torch, whose pow
    IS exact on powers of two."""
    Ei = jnp.clip(E.astype(jnp.int32), -126, 127)
    return jax.lax.bitcast_convert_type((Ei + 127) << 23, jnp.float32)


def _pot_round_log2(ratio, e_max_idx):
    """E = clamp(round(log2f(ratio)), 0, e_max_idx) with the REFERENCE's
    exact boundary behavior, no transcendental.

    torch's log2 (Sleef, ≤1 ulp) lands whole plateaus of mantissas exactly
    on half-integers k+0.5 which round() then resolves half-to-even; XLA's
    log2 rounds those mantissas differently (−0.51 ppl on the W8
    crosscheck, where E spans [0,127] and plateaus are wide). With
    ratio = m·2^e decomposed exactly from the bits, the decision is a pure
    per-exponent mantissa-threshold compare:
    E = e + (mantissa_bits ≥ LOG2_ROUND_UP_BITS[e]) — see
    quant.pot_log2_table. ratio must be positive and normal (the callers
    clip to ≥ 1e-10)."""
    bits = jax.lax.bitcast_convert_type(
        ratio.astype(jnp.float32), jnp.int32
    )
    e = (bits >> 23) - 127
    mant = bits & 0x7FFFFF
    table = jnp.asarray(LOG2_ROUND_UP_BITS.view(np.int32))
    up = jnp.take(table, jnp.clip(e, 0, 126))
    E = e + (mant >= up).astype(jnp.int32)
    return jnp.clip(E, 0, e_max_idx)


def _pot_reconstruct(w, s, e_max_idx):
    """w_q = s * sign(w) * 2^clamp(round(log2(|w|/s)), 0, e_max_idx)."""
    ratio = jnp.clip(jnp.abs(w) / s, 1e-10, None)
    E = _pot_round_log2(ratio, e_max_idx)
    return s * jnp.sign(w) * _exact_pow2(E)


def _scale_search(w, s0, candidates, e_max_idx, axis):
    """Grid-search the best scale multiplier (reference race semantics).

    When the group length divides by 8, the SSE race replays torch-CPU's
    exact f32 summation + strict-less keep-first comparison
    (_sse_torch_cpu) — bit-identical picks to the reference. Otherwise
    the double-float exact-sum order (_sse_df) decides."""
    shp = w.shape[:axis] + (1,) + w.shape[axis + 1 :]
    if w.shape[axis] % 8 == 0:

        def step(carry, c):
            be, bs = carry
            s_c = jnp.clip(s0 * c, _TINY, None)
            w_q = _pot_reconstruct(w, s_c, e_max_idx)
            e = _sse_torch_cpu(w - w_q, axis)
            take = e < be
            return (
                jnp.where(take, e, be),
                jnp.where(take, s_c, bs),
            ), None

        init = (jnp.full(shp, jnp.inf, jnp.float32), s0)
        (_, best), _ = jax.lax.scan(step, init, candidates)
        return best

    def step_df(carry, c):
        bh, bl, bs = carry
        s_c = jnp.clip(s0 * c, _TINY, None)
        w_q = _pot_reconstruct(w, s_c, e_max_idx)
        eh, el = _sse_df(w - w_q, axis)
        take = _df_less(eh, el, bh, bl)
        return (
            jnp.where(take, eh, bh),
            jnp.where(take, el, bl),
            jnp.where(take, s_c, bs),
        ), None

    init = (
        jnp.full(shp, jnp.inf, jnp.float32),
        jnp.zeros(shp, jnp.float32),
        s0,
    )
    (_, _, best), _ = jax.lax.scan(step_df, init, candidates)
    return best


# Per-program size cap for the candidate-scan quantizers. The ~200-step
# scale-search scan crashes the v5e TPU worker ("kernel fault", reproduced
# r5) once a single program holds roughly 2^25 f32 weight elements:
# lm_head [2048, 32000] dies deterministically while gateup [2048, 11264]
# survives. Scale groups tile K and columns are independent, so the public
# entry points below split the work into <= 2^24-element programs —
# bit-identical results, bounded program size. An outer vmap/lax.map over
# layers hits the same wall (22-layer vmap AND lax.map batch_size=1 both
# crashed), which is why quant.apply dispatches per-layer python calls.
_SCAN_CHUNK_ELEMS = 1 << 24


def _codes_col_chunks(N, K):
    import math

    n_chunks = max(1, math.ceil(K * N / _SCAN_CHUNK_ELEMS))
    return math.ceil(N / n_chunks)


def pot_quantize_tensor(
    w: jnp.ndarray,
    n_bit: int = 4,
    q_group_size: int = -1,
    grid: tuple = (0.01, 2.01, 0.01),
    grid_values: tuple | None = None,
) -> jnp.ndarray:
    """Chunked dispatcher for `_pot_quantize_tensor_jit` (see
    _SCAN_CHUNK_ELEMS): splits the grouped rows into bounded programs."""
    if q_group_size <= 0 or w.size <= _SCAN_CHUNK_ELEMS:
        return _pot_quantize_tensor_jit(
            w, n_bit=n_bit, q_group_size=q_group_size, grid=grid,
            grid_values=grid_values,
        )
    orig_shape = w.shape
    g = q_group_size
    if orig_shape[-1] % g != 0:
        raise ValueError(f"last dim {orig_shape[-1]} % group {g} != 0")
    flat = w.reshape(-1, g)
    rows = max(1, (_SCAN_CHUNK_ELEMS // g // 8) * 8)
    outs = [
        _pot_quantize_tensor_jit(
            flat[i : i + rows], n_bit=n_bit, q_group_size=g, grid=grid,
            grid_values=grid_values,
        )
        for i in range(0, flat.shape[0], rows)
    ]
    return jnp.concatenate(outs, axis=0).reshape(orig_shape)


@partial(
    jax.jit, static_argnames=("n_bit", "q_group_size", "grid", "grid_values")
)
def _pot_quantize_tensor_jit(
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
    s0 = jnp.where(e_min >= -126.0, _exact_pow2(e_min), _TINY)

    if grid_values is not None:
        candidates = jnp.asarray(np.array(grid_values, dtype=np.float32))
    else:
        start, stop, step = grid
        candidates = jnp.asarray(np.arange(start, stop, step, dtype=np.float32))

    best_scale = _scale_search(w, s0, candidates, e_max_idx, 1)

    best_scale = jnp.clip(best_scale, _TINY, None)
    w_q = _pot_reconstruct(w, best_scale, e_max_idx)
    return w_q.reshape(orig_shape).astype(orig_dtype)


def pot_codebook(n_bit: int) -> jnp.ndarray:
    """Level table for POT codes: index = signbit<<(b−1) | E →
    (1 − 2·signbit)·2^E."""
    nl = 2 ** (n_bit - 1)
    pos = _exact_pow2(jnp.arange(nl, dtype=jnp.float32))
    return jnp.concatenate([pos, -pos])


def pot_quantize_codes(
    w_kn: jnp.ndarray,
    n_bit: int = 4,
    group_size: int = 128,
    grid: tuple = (0.01, 2.01, 0.01),
    grid_values: tuple | None = None,
):
    """Chunked dispatcher for `_pot_quantize_codes_jit` (see
    _SCAN_CHUNK_ELEMS): splits the independent N columns into bounded
    programs; bit-identical to the single-program result."""
    K, N = w_kn.shape
    step = _codes_col_chunks(N, K)
    if step >= N:
        return _pot_quantize_codes_jit(
            w_kn, n_bit=n_bit, group_size=group_size, grid=grid,
            grid_values=grid_values,
        )
    outs = [
        _pot_quantize_codes_jit(
            w_kn[:, i : i + step], n_bit=n_bit, group_size=group_size,
            grid=grid, grid_values=grid_values,
        )
        for i in range(0, N, step)
    ]
    return tuple(jnp.concatenate(p, axis=1) for p in zip(*outs))


@partial(
    jax.jit, static_argnames=("n_bit", "group_size", "grid", "grid_values")
)
def _pot_quantize_codes_jit(
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
    s0 = jnp.where(e_min >= -126.0, _exact_pow2(e_min), _TINY)

    if grid_values is not None:
        candidates = jnp.asarray(np.array(grid_values, dtype=np.float32))
    else:
        start, stop, step = grid
        candidates = jnp.asarray(np.arange(start, stop, step, dtype=np.float32))

    s = _scale_search(w, s0, candidates, e_max_idx, 1)
    s = jnp.clip(s, _TINY, None)

    ratio = jnp.clip(jnp.abs(w) / s, 1e-10, None)
    E = _pot_round_log2(ratio, e_max_idx)
    signbit = (w < 0).astype(jnp.int32)
    codes = (signbit << (n_bit - 1)) | E
    return (
        codes.reshape(K, N).astype(jnp.uint8),
        s.reshape(K // g, N),
    )
