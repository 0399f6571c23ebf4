"""Partition specs for qtpu model params (Megatron-style tensor parallelism
expressed as GSPMD shardings; XLA inserts the all-gather/reduce-scatter over
ICI — SURVEY §5.8).

Arch-generic: each model family declares its ROW_PARALLEL_SITES (sites
whose INPUT dim shards — the psum side); every other linear site is
column-parallel (output dim shards). Norm vectors and position embeddings
replicate; the token embedding shards its hidden dim. Packed sites shard
the same way: data/scales/zeros all carry the sharded dim in the same
position; smooth vectors and biases follow the input/output dim of their
site.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def _site_spec(site: str, ndim_extra: int, row_parallel: bool) -> dict:
    """PartitionSpec per leaf key of one linear site. ndim_extra=1 when the
    leading stacked-layer axis is present."""
    lead = (None,) * ndim_extra
    if row_parallel:
        w = P(*lead, "model", None)
        smooth = P(*lead, "model")
        bias = P(*lead, None)  # bias lives on the (replicated) output dim
        packed_axis = P(*lead, "model", None)
    else:
        w = P(*lead, None, "model")
        smooth = P(*lead, None)
        bias = P(*lead, "model")
        packed_axis = P(*lead, None, "model")
    return {
        "w": w,
        "data": packed_axis,
        "scales": packed_axis,
        "zeros": packed_axis,
        "smooth": smooth,
        "b": bias,
        "codebook": P(*lead, None),  # tiny level table, replicated
        "perm": P(*lead, None),  # actorder column order, replicated
    }


def param_specs(params: dict, arch: str = "llama") -> dict:
    """PartitionSpec pytree matching a (possibly packed) params tree of any
    registered architecture."""
    from qtpu.models import get_arch

    arch_mod = get_arch(arch)
    row_sites = set(getattr(arch_mod, "ROW_PARALLEL_SITES", ()))
    expert_sites = set(getattr(arch_mod, "EXPERT_SITES", ()))
    # the MoE router is tiny ([D, E]) and its full softmax needs every
    # expert's logit — replicate it
    replicated_sites = set(getattr(arch_mod, "PACK_DENSE_SITES", ()))

    def site_specs(site: str, p: dict, extra: int) -> dict:
        if site in expert_sites:
            # expert parallelism: shard the E axis of [L, E, ...] leaves
            # over `model`; the routed-combine contraction becomes a psum
            return {
                k: P(None, "model", *((None,) * (v.ndim - 2)))
                for k, v in p.items()
            }
        if site in replicated_sites:
            return {k: P(*((None,) * v.ndim)) for k, v in p.items()}
        table = _site_spec(site, extra, site in row_sites)
        return {k: table[k] for k in p.keys()}

    specs = {}
    for name, val in params.items():
        if name == "layers":
            specs_layers = {}
            for site, p in val.items():
                if isinstance(p, dict):
                    specs_layers[site] = site_specs(site, p, 1)
                else:  # norm vectors [L, D]
                    specs_layers[site] = P(None, None)
            specs[name] = specs_layers
        elif name == "lm_head":
            specs[name] = site_specs("lm_head", val, 0)
        elif name == "embed":
            specs[name] = P(None, "model")
        else:  # pos_embed, final norms, other replicated vectors/tables
            specs[name] = P(*((None,) * val.ndim))
    return specs


def batch_spec() -> P:
    return P("data", None)


def shard_params(params: dict, mesh, arch: str = "llama") -> dict:
    """Place a params pytree onto the mesh with TP shardings."""
    specs = param_specs(params, arch)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: not isinstance(x, dict),
    )
