"""Model size accounting.

Reproduces the reference's arithmetic size model
(quantization_utils.py:329-355): every parameter element costs
w_bit + 16/group (scale) + 4/group (zero point, if used) bits, applied over
ALL parameters including embeddings and norms. Also provides an exact
accountant for really-packed QuantizedTensor pytrees.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qtpu.core.dtypes import MiB
from qtpu.core.packing import QuantizedTensor


def count_params(params) -> int:
    """Total element count of a pytree of arrays."""
    leaves = jax.tree_util.tree_leaves(
        params, is_leaf=lambda x: isinstance(x, QuantizedTensor)
    )
    total = 0
    for leaf in leaves:
        if isinstance(leaf, QuantizedTensor):
            n = 1
            for d in leaf.shape:
                n *= d
            total += n
        else:
            total += leaf.size
    return total


def get_model_size(
    params,
    data_width: int = 16,
    group_size: int = -1,
    use_zero_point: bool = True,
) -> float:
    """Size in bits under the reference's accounting model
    (quantization_utils.py:347-355)."""
    width = float(data_width)
    if group_size != -1:
        width += 16 / group_size
        if use_zero_point:
            width += 4 / group_size
    return count_params(params) * width


def get_packed_size(params) -> int:
    """Exact stored bits of a params pytree that may mix dense arrays and
    QuantizedTensor leaves (what the reference cannot report: it never packs)."""
    bits = 0
    leaves = jax.tree_util.tree_leaves(
        params, is_leaf=lambda x: isinstance(x, QuantizedTensor)
    )
    for leaf in leaves:
        if isinstance(leaf, QuantizedTensor):
            bits += leaf.storage_bits()
        else:
            bits += leaf.size * jnp.dtype(leaf.dtype).itemsize * 8
    return bits


def bits_to_mb(bits: float) -> float:
    return bits / MiB
