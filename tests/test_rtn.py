"""Unit tests for RTN quantization (reference test_pseudo_quantize,
test_quantization.py:30-47, plus packing round-trips)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtpu.core.packing import dequantize, pack_int4, quantize_pack, unpack_int4
from qtpu.quant import pseudo_quantize, symmetric_fake_quantize


def test_pseudo_quantize_shape_and_finite(rng):
    w = jax.random.normal(rng, (128, 256))
    for bits in (2, 4, 8):
        q = pseudo_quantize(w, n_bit=bits, q_group_size=64)
        assert q.shape == w.shape
        assert q.dtype == w.dtype
        assert bool(jnp.all(jnp.isfinite(q)))


def test_pseudo_quantize_changes_weights(rng):
    w = jax.random.normal(rng, (64, 128))
    q = pseudo_quantize(w, n_bit=4, q_group_size=64)
    assert not bool(jnp.allclose(q, w))


def test_pseudo_quantize_level_count(rng):
    """A quantized group has at most 2^bits distinct values."""
    w = jax.random.normal(rng, (1, 128))
    q = pseudo_quantize(w, n_bit=3, q_group_size=-1)
    assert len(np.unique(np.asarray(q))) <= 8


def test_pseudo_quantize_matches_reference_math(rng):
    """Exact parity with quantization_utils.py:362-413 re-derived in numpy."""
    w = np.asarray(jax.random.normal(rng, (64, 256)), np.float32)
    g, bits = 64, 4
    ref = w.reshape(-1, g)
    mx, mn = ref.max(1, keepdims=True), ref.min(1, keepdims=True)
    sc = np.clip(mx - mn, 1e-5, None) / (2**bits - 1)
    z = np.clip(-np.round(mn / sc), 0, 2**bits - 1)
    wq = np.clip(np.round(ref / sc) + z, 0, 2**bits - 1)
    expect = ((wq - z) * sc).reshape(w.shape)
    got = np.asarray(pseudo_quantize(jnp.asarray(w), bits, g))
    np.testing.assert_allclose(got, expect, rtol=0, atol=1e-6)


def test_symmetric_reference_math(rng):
    """Parity with gptq_quantizer.py:78-108 (incl. the −max_int−1 floor)."""
    w = np.asarray(jax.random.normal(rng, (32, 128)), np.float32)
    g, bits = 64, 4
    ref = w.reshape(-1, g)
    sc = np.clip(np.abs(ref).max(1, keepdims=True) / 15, 1e-5, None)
    expect = (np.clip(np.round(ref / sc), -16, 15) * sc).reshape(w.shape)
    got = np.asarray(symmetric_fake_quantize(jnp.asarray(w), bits, g))
    np.testing.assert_allclose(got, expect, rtol=0, atol=1e-6)


def test_int4_pack_roundtrip(rng):
    q = jax.random.randint(rng, (64, 32), 0, 16, jnp.int32)
    packed = pack_int4(q, 64)
    assert packed.shape == (32, 32) and packed.dtype == jnp.int8
    back = unpack_int4(packed, 64)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(q, np.uint8))


def test_int2_pack_roundtrip(rng):
    from qtpu.core.packing import pack_int2, unpack_int2

    q = jax.random.randint(rng, (128, 32), 0, 4, jnp.int32)
    packed = pack_int2(q, 64)
    assert packed.shape == (32, 32) and packed.dtype == jnp.int8
    back = unpack_int2(packed, 64)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(q, np.uint8))


@pytest.mark.parametrize("bits", [2, 4, 8])
@pytest.mark.parametrize("symmetric", [False, True])
def test_quantize_pack_dequant_close(rng, bits, symmetric):
    w = jax.random.normal(rng, (256, 128))
    qt = quantize_pack(w, bits=bits, group_size=64, symmetric=symmetric)
    w_dq = dequantize(qt, jnp.float32)
    err = jnp.abs(w_dq - w).max()
    # max error ~ scale/2; scales ~ range/2^bits
    bound = float(jnp.max(jnp.abs(w))) * (2.0 / (2**bits - 1))
    assert float(err) <= bound


def test_quantize_pack_storage_bits(rng):
    w = jax.random.normal(rng, (256, 128))
    qt = quantize_pack(w, bits=4, group_size=64)
    n = 256 * 128
    n_groups = (256 // 64) * 128
    assert qt.storage_bits() == n * 4 + n_groups * 16 + n_groups * 4
    assert qt.data.shape == (128, 128)


def test_quantization_error_decreases_with_bits(rng):
    """Reference test_quantization_error (test_quantization.py:168-185):
    MSE strictly decreases as bits grow 2→4→8."""
    w = jax.random.normal(rng, (128, 256))
    errs = {}
    for bits in (2, 4, 8):
        q = pseudo_quantize(w, n_bit=bits, q_group_size=128)
        errs[bits] = float(jnp.mean((q - w) ** 2))
    assert errs[2] > errs[4] > errs[8]


def test_quantization_stability_extremes():
    """Reference test_quantization_stability (test_quantization.py:188-214):
    scaled and constant tensors stay finite."""
    base = jax.random.normal(jax.random.PRNGKey(7), (64, 128))
    for t in (base * 1000.0, base / 1000.0, jnp.ones((64, 128)), -jnp.ones((64, 128))):
        q = pseudo_quantize(t, n_bit=4, q_group_size=64)
        assert bool(jnp.all(jnp.isfinite(q)))
