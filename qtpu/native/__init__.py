"""ctypes bindings for the native C++ host runtime (qtpu_native.cpp).

Auto-builds the shared library on first import if a toolchain is present
(make -C qtpu/native); every entry point has a numpy fallback so the
framework works without it. Use `available()` to check which path is live.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libqtpu_native.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.qtpu_version.restype = ctypes.c_int
        lib.qtpu_block_pack.restype = ctypes.c_int64
        assert lib.qtpu_version() == 1
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def pack_int4(q: np.ndarray, group_size: int) -> np.ndarray:
    """Group-halves int4 pack of a [K, N] uint8 array (values in [0,15]).
    Bit-identical to qtpu.core.packing.pack_int4."""
    q = np.ascontiguousarray(q, np.uint8)
    K, N = q.shape
    lib = _load()
    if lib is None:
        from qtpu.core.packing import pack_int4 as jpack

        return np.asarray(jpack(q, group_size))
    out = np.empty((K // 2, N), np.int8)
    lib.qtpu_pack_int4(
        q.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(K),
        ctypes.c_int64(N),
        ctypes.c_int64(group_size),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def unpack_int4(packed: np.ndarray, group_size: int) -> np.ndarray:
    packed = np.ascontiguousarray(packed, np.int8)
    K2, N = packed.shape
    K = 2 * K2
    lib = _load()
    if lib is None:
        from qtpu.core.packing import unpack_int4 as junpack

        return np.asarray(junpack(packed, group_size))
    out = np.empty((K, N), np.uint8)
    lib.qtpu_unpack_int4(
        packed.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(K),
        ctypes.c_int64(N),
        ctypes.c_int64(group_size),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def quantize_pack(w: np.ndarray, bits: int, group_size: int):
    """Fused asymmetric RTN quantize + pack of [K, N] f32 on the host.
    Returns (data int8, scales f32 [K/g, N], zeros uint8 [K/g, N]).
    Math parity with qtpu.core.packing.quantize_pack (asymmetric mode)."""
    w = np.ascontiguousarray(w, np.float32)
    K, N = w.shape
    g = group_size
    lib = _load()
    if lib is None:
        from qtpu.core.packing import quantize_pack as jqp

        qt = jqp(w, bits, g, symmetric=False)
        return (
            np.asarray(qt.data),
            np.asarray(qt.scales, np.float32),
            np.asarray(qt.zeros),
        )
    data = np.empty(((K // 2) if bits == 4 else K, N), np.int8)
    scales = np.empty((K // g, N), np.float32)
    zeros = np.empty((K // g, N), np.uint8)
    lib.qtpu_quantize_pack(
        w.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(K),
        ctypes.c_int64(N),
        ctypes.c_int64(g),
        ctypes.c_int(bits),
        data.ctypes.data_as(ctypes.c_void_p),
        scales.ctypes.data_as(ctypes.c_void_p),
        zeros.ctypes.data_as(ctypes.c_void_p),
    )
    return data, scales, zeros


def block_pack(samples: list[np.ndarray], block_size: int) -> list[np.ndarray]:
    """Concat ragged token samples, split into fixed blocks (reference
    quantization_utils.py:160-164)."""
    flat = np.concatenate([np.asarray(s, np.int32).reshape(-1) for s in samples])
    lengths = np.asarray([s.size for s in samples], np.int64)
    n_blocks = flat.size // block_size
    lib = _load()
    if lib is None:
        return [
            flat[i * block_size : (i + 1) * block_size][None, :]
            for i in range(n_blocks)
        ]
    out = np.empty((n_blocks, block_size), np.int32)
    got = lib.qtpu_block_pack(
        flat.ctypes.data_as(ctypes.c_void_p),
        lengths.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(len(samples)),
        ctypes.c_int64(block_size),
        out.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(n_blocks),
    )
    return [out[i][None, :] for i in range(int(got))]
