"""Packed integer weight storage.

The reference only *simulates* compression (pseudo-quantize in place,
quantization_utils.py:362-413) and accounts size arithmetically
(quantization_utils.py:329-355). Here quantized weights are actually stored
packed: W8 as int8, W4 as two uint4 nibbles per byte (group-halves), W2 as
four values per byte (group-quarters), packed along the contraction (K)
axis so the fused dequant-matmul kernel unpacks contiguous group tiles.
Per-group scales are bf16; asymmetric zero-points are stored in the
quantized integer domain (uint8).

Weight convention throughout qtpu: W has shape [K_in, N_out] (y = x @ W) and
quantization groups tile the K axis — the same channels the reference groups
over (its torch weights are [out, in] grouped over `in`).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from qtpu.core.dtypes import SCALE_DTYPE

# Persisted packed-byte format version (stored in checkpoint meta.json).
#   1: plain two-nibble int4 packing (lo | hi << 4), both nibbles unsigned
#   2: excess-8 hi nibble (lo | (hi ^ 8) << 4) — see pack_int4
# W8 / W2 layouts are identical across versions; only int4 bytes differ
# (version-1 bytes load under version 2 with every hi nibble read as
# code ^ 8). qtpu.ckpt auto-migrates v1 artifacts on load.
PACK_FORMAT = 2


def pack_int4(q: jnp.ndarray, group_size: int | None = None) -> jnp.ndarray:
    """Pack uint4 values (range [0,15]) along axis 0 into int8 bytes using a
    GROUP-HALVES layout: within each quantization group of `group_size` rows,
    byte j holds (low nibble = row j, high nibble = row j + group/2). Unpack
    is then two strided slices + one concat per group — no sublane
    interleave — which is what the Pallas fused dequant-matmul kernel wants
    (lo/hi halves share the group's scale, and each half is a contiguous
    [group/2, N] tile). group_size=None packs the whole axis as one group."""
    K = q.shape[0]
    g = group_size if group_size else K
    if K % g != 0 or g % 2 != 0:
        raise ValueError(f"K={K} must be divisible by even group_size={g}")
    q = q.astype(jnp.uint8)
    qg = q.reshape(K // g, g, *q.shape[1:])
    lo = qg[:, : g // 2]
    hi = qg[:, g // 2 :]
    # EXCESS-8 hi nibble: storing (hi ^ 8) makes the byte's arithmetic
    # top nibble equal hi - 8, so the hot split-dot kernel recovers the
    # hi field with ONE sign-extending shift (no mask) and folds the -8
    # bias into its per-group zero correction - one fewer VPU op per
    # packed byte on the W4 decode path, which is VPU-unpack-bound
    # (measured r4). The unsigned-domain inverse is q_hi = stored ^ 8.
    return (
        (lo | ((hi ^ jnp.uint8(8)) << 4))
        .astype(jnp.int8)
        .reshape(K // 2, *q.shape[1:])
    )


def pack_int2(q: jnp.ndarray, group_size: int) -> jnp.ndarray:
    """Pack uint2 values (range [0,3]) along axis 0, GROUP-QUARTERS layout:
    within each group of g rows, byte j holds rows (j, j+g/4, j+g/2,
    j+3g/4) in bit pairs (0-1, 2-3, 4-5, 6-7) — the 2-bit analogue of the
    group-halves int4 layout (each quarter is a contiguous tile sharing the
    group's scale)."""
    K = q.shape[0]
    g = group_size
    if K % g != 0 or g % 4 != 0:
        raise ValueError(f"K={K} must be divisible by group_size={g} % 4 == 0")
    q = q.astype(jnp.uint8)
    qg = q.reshape(K // g, 4, g // 4, *q.shape[1:])
    b = (
        qg[:, 0]
        | (qg[:, 1] << 2)
        | (qg[:, 2] << 4)
        | (qg[:, 3] << 6)
    )
    return b.astype(jnp.int8).reshape(K // 4, *q.shape[1:])


def unpack_int2(packed: jnp.ndarray, group_size: int) -> jnp.ndarray:
    """Inverse of pack_int2 → uint8 values in [0,3], axis 0 ×4."""
    K4 = packed.shape[0]
    g = group_size
    p = packed.astype(jnp.uint8).reshape(4 * K4 // g, g // 4, *packed.shape[1:])
    parts = [(p >> (2 * i)) & jnp.uint8(0x3) for i in range(4)]
    out = jnp.concatenate(parts, axis=1)
    return out.reshape(4 * K4, *packed.shape[1:])


def unpack_int4(packed: jnp.ndarray, group_size: int | None = None) -> jnp.ndarray:
    """Inverse of pack_int4 → uint8 array with values in [0,15], axis 0
    doubled (group-halves layout)."""
    K2 = packed.shape[0]
    g = group_size if group_size else 2 * K2
    p = packed.astype(jnp.uint8).reshape(2 * K2 // g, g // 2, *packed.shape[1:])
    lo = p & jnp.uint8(0xF)
    hi = (p >> 4) ^ jnp.uint8(8)  # undo the excess-8 storage (pack_int4)
    out = jnp.concatenate([lo, hi], axis=1)
    return out.reshape(2 * K2, *packed.shape[1:])


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantizedTensor:
    """Packed quantized weight + per-group metadata.

    data:   int8 [K, N] (w8) or [K//2, N] (w4, nibble pairs along K)
    scales: [K//group, N] (bf16)
    zeros:  [K//group, N] uint8 quantized zero-points, or None for symmetric
    bits:   4 or 8
    group_size: channels of K per scale group (>0)
    shape:  logical (K, N)
    """

    data: jnp.ndarray
    scales: jnp.ndarray
    zeros: jnp.ndarray | None
    bits: int
    group_size: int
    shape: tuple

    def tree_flatten(self):
        dyn = (self.data, self.scales, self.zeros)
        static = (self.bits, self.group_size, self.shape)
        return dyn, static

    @classmethod
    def tree_unflatten(cls, static, dyn):
        data, scales, zeros = dyn
        bits, group_size, shape = static
        return cls(data, scales, zeros, bits, group_size, shape)

    @property
    def symmetric(self) -> bool:
        return self.zeros is None

    def storage_bits(self) -> int:
        """Actual stored bits (packed ints + scales + zeros)."""
        n = 1
        for d in self.shape:
            n *= d
        bits = n * self.bits
        n_groups = self.scales.size
        bits += n_groups * 16
        if self.zeros is not None:
            bits += n_groups * self.bits
        return bits


def quantize_pack(
    w: jnp.ndarray,
    bits: int,
    group_size: int,
    symmetric: bool = False,
) -> QuantizedTensor:
    """Quantize a [K, N] weight to a packed QuantizedTensor.

    Asymmetric mode matches the reference RTN math
    (quantization_utils.py:394-405): per-group min/max,
    scale = (max-min).clamp(1e-5)/(2^b-1), zero = clamp(round(-min/scale)).
    Symmetric mode matches the GPTQ fallback (gptq_quantizer.py:94-99).
    """
    K, N = w.shape
    g = group_size if group_size > 0 else K
    if K % g != 0:
        raise ValueError(f"K={K} not divisible by group_size={g}")
    wf = w.astype(jnp.float32).reshape(K // g, g, N)
    max_int = 2**bits - 1
    if symmetric:
        # proper symmetric range [-2^(b-1), 2^(b-1)-1], stored biased to the
        # unsigned domain so w4 packing is uniform across modes
        pos_max = 2 ** (bits - 1) - 1
        absmax = jnp.max(jnp.abs(wf), axis=1, keepdims=True)
        scales = jnp.clip(absmax / pos_max, 1e-5, None)
        q = jnp.clip(jnp.round(wf / scales), -pos_max - 1, pos_max)
        offset = 2 ** (bits - 1)
        store = q + offset  # [0, 2^b - 1]
        zeros = None
    else:
        max_val = jnp.max(wf, axis=1, keepdims=True)
        min_val = jnp.min(wf, axis=1, keepdims=True)
        scales = jnp.clip(max_val - min_val, 1e-5, None) / max_int
        zp = jnp.clip(jnp.round(-min_val / scales), 0, max_int)
        store = jnp.clip(jnp.round(wf / scales) + zp, 0, max_int)
        zeros = zp.reshape(K // g, N).astype(jnp.uint8)
    store = store.reshape(K, N)
    scales2 = scales.reshape(K // g, N).astype(SCALE_DTYPE)
    if bits == 2:
        data = pack_int2(store.astype(jnp.uint8), g)
    elif bits == 4:
        data = pack_int4(store.astype(jnp.uint8), g)
    elif bits == 8:
        data = (store.astype(jnp.int32) - 128).astype(jnp.int8)
    else:
        raise ValueError(f"packed storage supports bits in (2, 4, 8), got {bits}")
    return QuantizedTensor(
        data=data, scales=scales2, zeros=zeros, bits=bits, group_size=g, shape=(K, N)
    )


@partial(jax.jit, static_argnames=("out_dtype",))
def dequantize(qt: QuantizedTensor, out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Reference (non-Pallas) dequantization of a QuantizedTensor → [K, N]."""
    K, N = qt.shape
    g = qt.group_size
    if qt.bits == 2:
        qu = unpack_int2(qt.data, g).astype(jnp.int32)  # [K, N] in [0,3]
    elif qt.bits == 4:
        qu = unpack_int4(qt.data, g).astype(jnp.int32)  # [K, N] in [0,15]
    else:
        qu = qt.data.astype(jnp.int32) + 128  # back to [0,255]
    qu = qu.reshape(K // g, g, N)
    scales = qt.scales.astype(jnp.float32).reshape(K // g, 1, N)
    if qt.zeros is not None:
        zeros = qt.zeros.astype(jnp.int32).reshape(K // g, 1, N)
        w = (qu - zeros).astype(jnp.float32) * scales
    else:
        offset = 2 ** (qt.bits - 1)
        w = (qu - offset).astype(jnp.float32) * scales
    return w.reshape(K, N).astype(out_dtype)
