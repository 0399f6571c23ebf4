"""Native C++ host runtime: bit-parity with the JAX packing path."""

import numpy as np
import pytest

from qtpu import native
from qtpu.core import packing as jpack

needs_native = pytest.mark.skipif(
    not native.available(), reason="native lib not built (no toolchain)"
)


def test_fallback_works_regardless():
    q = np.random.default_rng(0).integers(0, 16, (128, 64), dtype=np.uint8)
    packed = native.pack_int4(q, 64)
    back = native.unpack_int4(packed, 64)
    np.testing.assert_array_equal(back, q)


@needs_native
def test_pack_bit_parity_with_jax():
    q = np.random.default_rng(1).integers(0, 16, (256, 96), dtype=np.uint8)
    for g in (32, 64, 128):
        c = native.pack_int4(q, g)
        j = np.asarray(jpack.pack_int4(q, g))
        np.testing.assert_array_equal(c, j)
        np.testing.assert_array_equal(
            native.unpack_int4(c, g), np.asarray(jpack.unpack_int4(j, g))
        )


@needs_native
def test_quantize_pack_parity_with_jax():
    w = np.random.default_rng(2).normal(size=(256, 64)).astype(np.float32)
    for bits in (4, 8):
        data, scales, zeros = native.quantize_pack(w, bits, 64)
        qt = jpack.quantize_pack(w, bits, 64, symmetric=False)
        np.testing.assert_array_equal(data, np.asarray(qt.data))
        np.testing.assert_array_equal(zeros, np.asarray(qt.zeros))
        np.testing.assert_allclose(
            scales, np.asarray(qt.scales, np.float32), rtol=1e-2
        )  # jax stores bf16 scales; native keeps f32


def test_block_pack_reference_semantics():
    """concat + floor-split parity with quantization_utils.py:160-164."""
    rng = np.random.default_rng(3)
    samples = [rng.integers(0, 100, size=n, dtype=np.int32) for n in (5, 17, 40, 3)]
    blocks = native.block_pack(samples, 16)
    flat = np.concatenate(samples)
    assert len(blocks) == flat.size // 16
    for i, b in enumerate(blocks):
        assert b.shape == (1, 16)
        np.testing.assert_array_equal(b[0], flat[i * 16 : (i + 1) * 16])
