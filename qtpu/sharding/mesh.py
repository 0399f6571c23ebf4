"""Device mesh construction (the reference has no distribution at all —
SURVEY §2.3; this is the TPU-native replacement for what NCCL would be in a
GPU design, §5.8).

Axes: `data` (calibration batches, eval blocks, serving batch) × `model`
(tensor-parallel weight shards + KV-cache heads). On a real pod slice the
mesh maps onto ICI; multi-host entry is jax.distributed.initialize() before
mesh creation.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Build a ('data','model') mesh. data=-1 → use all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if model <= 0:
        model = 1
    if data == -1:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(
            f"mesh {data}x{model} needs {data * model} devices, have {n}"
        )
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))
