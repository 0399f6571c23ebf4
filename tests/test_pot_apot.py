"""Unit tests for POT/APOT (reference test_pot_quantize :50-71,
test_apot_levels :74-88, test_apot_quantize :91-112)."""

import jax
import jax.numpy as jnp
import numpy as np

from qtpu.quant import apot_quantize_tensor, generate_apot_levels, pot_quantize_tensor
from qtpu.quant.apot import full_apot_codebook


def test_pot_shape_finite_changed(rng):
    w = jax.random.normal(rng, (64, 256))
    q = pot_quantize_tensor(w, n_bit=4, q_group_size=64, grid=(0.01, 2.01, 0.1))
    assert q.shape == w.shape and q.dtype == w.dtype
    assert bool(jnp.all(jnp.isfinite(q)))
    assert not bool(jnp.allclose(q, w))


def test_pot_values_are_pot_multiples(rng):
    """Every |value| must be scale·2^E for integer E in [0, 2^(b−1)−1]."""
    w = jax.random.normal(rng, (4, 64))
    q = np.asarray(pot_quantize_tensor(w, n_bit=4, q_group_size=-1), np.float64)
    for row in q:
        nz = np.abs(row[row != 0])
        if nz.size == 0:
            continue
        # within a row all magnitudes are s·2^E: ratios must be powers of 2
        base = nz.min()
        ratios = nz / base
        log2r = np.log2(ratios)
        np.testing.assert_allclose(log2r, np.round(log2r), atol=1e-4)


def test_pot_sign_preserved(rng):
    w = jax.random.normal(rng, (8, 128))
    q = pot_quantize_tensor(w, n_bit=4, q_group_size=-1)
    s_w, s_q = jnp.sign(w), jnp.sign(q)
    # zero weights stay zero; nonzero keep sign
    assert bool(jnp.all((s_w == s_q) | (s_w == 0)))


def test_apot_levels_structure():
    """Reference test_apot_levels: levels unique, sorted, include 0, start
    from additive POT sums."""
    lv = generate_apot_levels(n=2, k=2)
    assert lv.ndim == 1
    assert np.all(np.diff(lv) > 0)
    assert lv[0] == 0.0
    assert len(np.unique(lv)) == len(lv)
    # n=2,k=2: term0 ∈ {0,1,2^-2,2^-4}, term1 ∈ {0,2^-1,2^-3,2^-5}
    assert np.isclose(lv.max(), 1.5)


def test_apot_codebook_capped_and_symmetric():
    cb = full_apot_codebook(8, 2)
    assert cb.size <= 32
    assert np.isclose(cb.max(), 1.0)
    # uncapped codebooks keep the exact 0 level (subsampled ones may lose
    # it — reference parity, pot_apot_quantizer.py:243-247)
    cb4 = full_apot_codebook(4, 2)
    assert np.any(cb4 == 0.0)


def test_apot_quantize_shape_finite_changed(rng):
    w = jax.random.normal(rng, (64, 256))
    q = apot_quantize_tensor(w, n_bit=4, q_group_size=64, k=2, grid=(0.01, 2.01, 0.1))
    assert q.shape == w.shape and q.dtype == w.dtype
    assert bool(jnp.all(jnp.isfinite(q)))
    assert not bool(jnp.allclose(q, w))


def test_apot_nearest_level_matches_bruteforce_argmin(rng):
    """_nearest_level (searchsorted) must agree with the reference's full
    distance-matrix argmin (pot_apot_quantizer.py:294-298), including
    first-occurrence tie-breaking."""
    from qtpu.quant.apot import _nearest_level

    cb = full_apot_codebook(4, 2)
    x = np.concatenate(
        [
            np.asarray(jax.random.normal(rng, (500,))),
            cb,  # exact hits
            (cb[:-1] + cb[1:]) / 2,  # exact midpoints → ties
        ]
    ).astype(np.float32)
    got = np.asarray(_nearest_level(jnp.asarray(x), jnp.asarray(cb)))
    idx = np.argmin(np.abs(x[:, None] - cb[None, :]), axis=1)
    expect = cb[idx]
    np.testing.assert_allclose(got, expect, atol=0)


def test_apot_better_than_pot_at_same_bits(rng):
    """APOT's denser codebook should beat POT's exponential levels on
    gaussian weights (the reference's W4 results show exactly this:
    APOT ppl 9.75 vs POT 11.76, BASELINE.md Run A)."""
    w = jax.random.normal(rng, (256, 256))
    qp = pot_quantize_tensor(w, n_bit=4, q_group_size=128)
    qa = apot_quantize_tensor(w, n_bit=4, q_group_size=128, k=2)
    mse_p = float(jnp.mean((qp - w) ** 2))
    mse_a = float(jnp.mean((qa - w) ** 2))
    assert mse_a < mse_p


def test_chunked_dispatch_bit_identical(rng, monkeypatch):
    """The _SCAN_CHUNK_ELEMS program-size cap (added after the candidate
    scan crashed the v5e worker at lm_head scale) must not change a single
    bit: force tiny chunks and compare against the one-program result."""
    import qtpu.quant.pot as pot_mod
    from qtpu.quant.apot import apot_quantize_codes, apot_quantize_tensor

    w = jax.random.normal(rng, (256, 384), jnp.float32) * 0.02
    ref_t = pot_mod.pot_quantize_tensor(w, n_bit=4, q_group_size=128)
    ref_c, ref_s = pot_mod.pot_quantize_codes(w, 4, 128)
    ref_at = apot_quantize_tensor(w, n_bit=4, q_group_size=128, k=2)
    ref_ac, ref_as, ref_cb = apot_quantize_codes(w, 4, 128, 2)

    monkeypatch.setattr(pot_mod, "_SCAN_CHUNK_ELEMS", 256 * 128)
    got_t = pot_mod.pot_quantize_tensor(w, n_bit=4, q_group_size=128)
    got_c, got_s = pot_mod.pot_quantize_codes(w, 4, 128)
    got_at = apot_quantize_tensor(w, n_bit=4, q_group_size=128, k=2)
    got_ac, got_as, got_cb = apot_quantize_codes(w, 4, 128, 2)

    np.testing.assert_array_equal(np.asarray(ref_t), np.asarray(got_t))
    np.testing.assert_array_equal(np.asarray(ref_c), np.asarray(got_c))
    np.testing.assert_array_equal(np.asarray(ref_s), np.asarray(got_s))
    np.testing.assert_array_equal(np.asarray(ref_at), np.asarray(got_at))
    np.testing.assert_array_equal(np.asarray(ref_ac), np.asarray(got_ac))
    np.testing.assert_array_equal(np.asarray(ref_as), np.asarray(got_as))
    np.testing.assert_array_equal(np.asarray(ref_cb), np.asarray(got_cb))
