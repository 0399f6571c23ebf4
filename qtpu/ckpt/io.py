"""Checkpoint / resume for quantized artifacts (SURVEY §5.4 — a subsystem
the reference lacks entirely: it discards quantized models after eval and
reloads fresh per method, benchmark_runner.py:266-275).

Persists a (possibly packed) params pytree + quantization metadata so that
expensive calibration/quantization decouples from cheap serving:
  save_quantized(dir, params, qmeta, extra_meta)
  params, qmeta, meta = load_quantized(dir)

Format: one .npz with flattened key paths (portable, dependency-free) plus
meta.json. int4-packed tensors stay packed; bf16 arrays round-trip via a
uint16 view (npz has no native bf16).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from qtpu.core.packing import PACK_FORMAT

_SEP = "::"


def _flatten(params) -> dict:
    flat = {}

    def rec(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(prefix + [k], v)
        elif node is None:
            pass
        else:
            flat[_SEP.join(prefix)] = node

    rec([], params)
    return flat


def _unflatten(flat: dict) -> dict:
    root: dict = {}
    for key, v in flat.items():
        parts = key.split(_SEP)
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return root


def save_quantized(out_dir, params, qmeta=None, meta: dict | None = None):
    """Write params (+ qmeta, + user meta) under out_dir."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    flat = _flatten(params)
    arrays = {}
    dtypes = {}
    for k, v in flat.items():
        a = np.asarray(v)
        if a.dtype == jnp.bfloat16:
            dtypes[k] = "bfloat16"
            a = a.view(np.uint16)
        else:
            dtypes[k] = str(a.dtype)
        arrays[k] = a
    np.savez(out / "params.npz", **arrays)
    with open(out / "meta.json", "w") as f:
        json.dump(
            {
                "pack_format": PACK_FORMAT,
                "qmeta": [[s, list(m)] for s, m in (qmeta or ())],
                "dtypes": dtypes,
                "meta": meta or {},
            },
            f,
            indent=2,
        )


def load_quantized(in_dir):
    """Returns (params, qmeta, meta). qmeta is the hashable tuple form the
    model forward takes (None if the checkpoint had none)."""
    ind = Path(in_dir)
    with open(ind / "meta.json") as f:
        info = json.load(f)
    fmt = int(info.get("pack_format", 1))
    if fmt not in (1, PACK_FORMAT):
        raise ValueError(
            f"checkpoint pack_format={fmt} is newer than this qtpu "
            f"(supports <= {PACK_FORMAT}); upgrade qtpu to load it"
        )
    qmeta = tuple((s, tuple(m)) for s, m in info.get("qmeta", [])) or None
    # sites whose packed int4 bytes need the v1 -> v2 hi-nibble migration
    w4_sites = {s for s, m in (qmeta or ()) if int(m[0]) == 4}
    data = np.load(ind / "params.npz")
    flat = {}
    for k in data.files:
        a = data[k]
        if info["dtypes"].get(k) == "bfloat16":
            a = jnp.asarray(a.view(np.uint16)).view(jnp.bfloat16)
        else:
            if fmt < 2 and a.dtype == np.int8:
                parts = k.split(_SEP)
                if len(parts) >= 2 and parts[-1] == "data" and parts[-2] in w4_sites:
                    # v1 stored (lo | hi << 4); v2 stores (lo | (hi^8) << 4)
                    # — equivalently byte ^ 0x80
                    a = (a.view(np.uint8) ^ np.uint8(0x80)).view(np.int8)
            a = jnp.asarray(a)
        flat[k] = a
    params = _unflatten(flat)
    return params, qmeta, info.get("meta", {})
