"""Partition specs for qtpu model params (Megatron-style tensor parallelism
expressed as GSPMD shardings; XLA inserts the all-gather/reduce-scatter over
ICI — SURVEY §5.8).

Column-parallel (shard the output dim): q/k/v, gate/up, lm_head.
Row-parallel (shard the input dim): o_proj, down_proj — XLA emits the psum
after the partial matmuls. Norms and embeddings replicate (embed shards its
hidden dim so the gather stays local-ish and activations enter sharded).
Packed sites shard the same way: data/scales/zeros all carry the output (or
input-group) dim in the same positions.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def _site_spec(site: str, ndim_extra: int) -> dict:
    """PartitionSpec per leaf key of one linear site. ndim_extra=1 when the
    leading stacked-layer axis is present."""
    lead = (None,) * ndim_extra
    col = {"w": P(*lead, None, "model")}
    row = {"w": P(*lead, "model", None)}
    if site in ("o_proj", "down_proj"):
        base = row
        smooth = P(*lead, "model")
    else:
        base = col
        smooth = P(*lead, None)
    # packed layout: data [*, K(/2), N], scales/zeros [*, K/g, N]
    packed_axis = (
        P(*lead, "model", None) if site in ("o_proj", "down_proj") else P(*lead, None, "model")
    )
    return {
        "w": base["w"],
        "data": packed_axis,
        "scales": packed_axis,
        "zeros": packed_axis,
        "smooth": smooth,
        "codebook": P(*lead, None),  # tiny level table, replicated
        "b": (
            P(*lead, "model") if site not in ("o_proj", "down_proj") else P(*lead, None)
        ),
    }


def param_specs(params: dict) -> dict:
    """PartitionSpec pytree matching a (possibly packed) llama params tree."""

    def site_specs(site: str, p: dict, extra: int) -> dict:
        table = _site_spec(site, extra)
        return {k: table[k] for k in p.keys()}

    layers = params["layers"]
    specs_layers = {}
    for name, p in layers.items():
        if isinstance(p, dict):
            specs_layers[name] = site_specs(name, p, 1)
        else:  # norm vectors [L, D]
            specs_layers[name] = P(None, None)
    return {
        "embed": P(None, "model"),
        "layers": specs_layers,
        "final_norm": P(None),
        "lm_head": site_specs("lm_head", params["lm_head"], 0),
    }


def batch_spec() -> P:
    return P("data", None)


def shard_params(params: dict, mesh) -> dict:
    """Place a params pytree onto the mesh with TP shardings."""
    specs = param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: not isinstance(x, dict),
    )
