"""Size units and dtype handling.

Mirrors the unit constants of the reference (quantization_utils.py:38-41)
and centralises the dtype policy for TPU: bf16 params/activations, fp32
accumulation, int8/int4 packed storage.
"""

import jax.numpy as jnp

# Bits per unit — identical semantics to reference quantization_utils.py:38-41.
Byte = 8
KiB = 1024 * Byte
MiB = 1024 * KiB
GiB = 1024 * MiB

# String→dtype map, the JAX analogue of the reference's torch dtype map
# (quantization_utils.py:66-71).
DTYPE_MAP = {
    "float16": jnp.float16,
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    None: None,
}

# Storage dtypes for packed quantized weights.
PACKED_DTYPE = jnp.int8       # container for both W8 values and W4 nibble pairs
SCALE_DTYPE = jnp.bfloat16    # per-group scales (16-bit, matching size accounting)
ACCUM_DTYPE = jnp.float32     # MXU accumulation dtype


def resolve_dtype(name):
    """Resolve a config dtype string to a jnp dtype (None passes through)."""
    if name in DTYPE_MAP:
        return DTYPE_MAP[name]
    return jnp.dtype(name)


def bits_of(dtype) -> int:
    """Bits per element of a jnp dtype (int4/uint4 count as 4)."""
    d = jnp.dtype(dtype)
    if d in (jnp.dtype(jnp.int4), jnp.dtype(jnp.uint4)):
        return 4
    return d.itemsize * 8
