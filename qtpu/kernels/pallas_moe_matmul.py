"""Pallas TPU kernel: grouped packed expert matmul for MoE layers.

One pallas_call computes EVERY expert's fused dequant-matmul for a site:
grid (E, M/bm, N/bn), each step streaming expert e's packed block from HBM
exactly once. Replaces the per-expert Python loop over `linear` calls in
qtpu.models.moe._expert_matmul (E separate pallas_calls per site per layer
): same HBM traffic, one launch, and XLA sees a single
fusable op per site.

Dispatch forms:
  * soft (shared input): x [M, K] — every expert consumes all M tokens
    (dense soft-dispatch, qtpu.models.moe docstring). out [E, M, N].
  * per-expert input: x [E, M, K] (e.g. the down-projection whose input
    already carries the expert axis, or capacity-gathered tokens).
    out [E, M, N].

Both forms accept layer-stacked weights [L, E, ...] with a scalar-prefetch
layer index (same zero-copy delivery as
pallas_dequant_matmul.pallas_quantized_matmul_stacked).

The packing/layout contract matches qtpu.core.packing group-halves (see
pallas_dequant_matmul); the per-group scale/zero math is shared via
_dq_matmul_kernel.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qtpu.kernels.pallas_dequant_matmul import _choose_blocks, _dq_matmul_kernel


@partial(jax.jit, static_argnames=("meta", "per_expert_input", "interpret"))
def pallas_moe_quantized_matmul(
    x,
    data,
    scales,
    zeros,
    meta,
    layer=None,
    per_expert_input: bool = False,
    interpret: bool = False,
):
    """Grouped expert dequant-matmul.

    x: [M, K] (shared input) or [E, M, K] (per_expert_input=True).
    data: [E, Kp, N] or layer-stacked [L, E, Kp, N] with `layer` a traced
    int32 index; scales/zeros [.., E, K/g, N]. meta = (bits, group, K, N).
    Returns [E, M, N] in x.dtype. Raises NotImplementedError for shapes
    the kernel does not tile (caller falls back to per-expert calls).
    """
    bits, group, K, N = meta
    if group <= 0 or group % 4 != 0 or K % group != 0:
        raise NotImplementedError("pallas path needs group % 4 == 0 | K")
    stacked = data.ndim == 4
    if stacked and layer is None:
        raise NotImplementedError("[L, E, ...] weights need a layer index")
    E = data.shape[1] if stacked else data.shape[0]
    M = x.shape[-2]
    pad_m = (-M) % max(1, int(os.environ.get("QTPU_M_ALIGN", "8")))
    if pad_m:
        pad = [(0, 0)] * (x.ndim - 2) + [(0, pad_m), (0, 0)]
        x = jnp.pad(x, pad)
    Mp = M + pad_m
    bm, bn = _choose_blocks(Mp, K, N)
    if Mp % bm or N % bn:
        raise NotImplementedError("shapes do not tile")
    Kp = K // (8 // bits) if bits in (2, 4) else K
    G = K // group
    has_zeros = zeros is not None

    grid = (E, Mp // bm, N // bn)

    # index maps: scalar-prefetch arg (the layer index) is appended to the
    # grid coordinates when present
    if stacked:
        w_ix = lambda e, i, j, l: (l[0], e, 0, j)
        w_blk = (None, None, Kp, bn)
        s_blk = (None, None, G, bn)
    else:
        w_ix = lambda e, i, j, *l: (e, 0, j)
        w_blk = (None, Kp, bn)
        s_blk = (None, G, bn)
    if per_expert_input:
        x_ix = (lambda e, i, j, l: (e, i, 0)) if stacked else (
            lambda e, i, j, *l: (e, i, 0)
        )
        x_spec = pl.BlockSpec((None, bm, K), x_ix)
    else:
        x_ix = (lambda e, i, j, l: (i, 0)) if stacked else (
            lambda e, i, j, *l: (i, 0)
        )
        x_spec = pl.BlockSpec((bm, K), x_ix)
    o_ix = (lambda e, i, j, l: (e, i, j)) if stacked else (
        lambda e, i, j, *l: (e, i, j)
    )

    in_specs = [
        x_spec,
        pl.BlockSpec(w_blk, w_ix),
        pl.BlockSpec(s_blk, w_ix),
    ]
    args = [x, data, scales]
    if has_zeros:
        in_specs.append(pl.BlockSpec(s_blk, w_ix))
        args.append(zeros)

    def kernel(*refs):
        if stacked:
            refs = refs[1:]  # drop the prefetched layer-index ref
        if has_zeros:
            x_ref, d_ref, s_ref, z_ref, o_ref = refs
        else:
            x_ref, d_ref, s_ref, o_ref = refs
            z_ref = None
        _dq_matmul_kernel(
            x_ref, d_ref, s_ref, z_ref, o_ref, bits=bits, group=group, K=K
        )

    common = dict(
        out_shape=jax.ShapeDtypeStruct((E, Mp, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * E * Mp * K * N,
            bytes_accessed=Mp * K * 2 + E * K * N * bits // 8 + E * Mp * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )
    if stacked:
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=in_specs,
                out_specs=pl.BlockSpec((None, bm, bn), o_ix),
            ),
            **common,
        )(jnp.asarray(layer, jnp.int32).reshape(1), *args)
    else:
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((None, bm, bn), o_ix),
            **common,
        )(*args)
    if pad_m:
        out = out[:, :M]
    return out


@partial(
    jax.jit, static_argnames=("meta", "interpret")
)
def pallas_moe_gathered_matmul(
    x,
    expert_idx,
    data,
    scales,
    zeros,
    meta,
    layer=None,
    interpret: bool = False,
):
    """GATHERED expert dequant-matmul: one grid slot per routed token.

    x: [Gs, K] gathered token rows (slot j = token b's j-th routed
    expert); expert_idx: [Gs] int32; data [E, Kp, N] or layer-stacked
    [L, E, Kp, N]. Returns [Gs, N].

    The decode regime the dense soft-dispatch form cannot serve: at
    B·top_k < E the grouped kernel streams every expert's weights from
    HBM each step while only B·top_k expert-slots are routed. Here the
    expert index rides scalar prefetch and every BlockSpec index map
    addresses the chosen expert's weight block directly — HBM weight
    traffic is Gs/E of the dense form (modulo repeated experts, which
    stream once per slot). Same per-program math as the grouped kernel
    (split dots at bm=1, corrections on the output tile).
    """
    bits, group, K, N = meta
    if group <= 0 or group % 4 != 0 or K % group != 0:
        raise NotImplementedError("pallas path needs group % 4 == 0 | K")
    stacked = data.ndim == 4
    if stacked and layer is None:
        raise NotImplementedError("[L, E, ...] weights need a layer index")
    Gs = x.shape[0]
    _, bn = _choose_blocks(8, K, N)
    if N % bn:
        raise NotImplementedError("shapes do not tile")
    Kp = K // (8 // bits) if bits in (2, 4) else K
    G = K // group
    has_zeros = zeros is not None

    grid = (Gs, N // bn)
    if stacked:
        w_ix = lambda g, j, e, l: (l[0], e[g], 0, j)
        w_blk = (None, None, Kp, bn)
        s_blk = (None, None, G, bn)
    else:
        w_ix = lambda g, j, e, *l: (e[g], 0, j)
        w_blk = (None, Kp, bn)
        s_blk = (None, G, bn)
    # x/out ride as [Gs, 1, .]: a (1, K) block of a 2D [Gs, K] array has
    # sublane dim 1 which Mosaic only allows when it equals the full dim;
    # the explicit singleton axis (squeezed by None) makes the trailing
    # block dims (1, K) == full dims for any Gs
    x_ix = (lambda g, j, e, l: (g, 0, 0)) if stacked else (
        lambda g, j, e, *l: (g, 0, 0)
    )
    o_ix = (lambda g, j, e, l: (g, 0, j)) if stacked else (
        lambda g, j, e, *l: (g, 0, j)
    )

    in_specs = [
        pl.BlockSpec((None, 1, K), x_ix),
        pl.BlockSpec(w_blk, w_ix),
        pl.BlockSpec(s_blk, w_ix),
    ]
    args = [x.reshape(Gs, 1, K), data, scales]
    if has_zeros:
        in_specs.append(pl.BlockSpec(s_blk, w_ix))
        args.append(zeros)

    def kernel(*refs):
        refs = refs[2:] if stacked else refs[1:]  # drop prefetch refs
        if has_zeros:
            x_ref, d_ref, s_ref, z_ref, o_ref = refs
        else:
            x_ref, d_ref, s_ref, o_ref = refs
            z_ref = None
        _dq_matmul_kernel(
            x_ref, d_ref, s_ref, z_ref, o_ref, bits=bits, group=group, K=K
        )

    prefetch = [jnp.asarray(expert_idx, jnp.int32).reshape(Gs)]
    if stacked:
        prefetch.append(jnp.asarray(layer, jnp.int32).reshape(1))
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(prefetch),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((None, 1, bn), o_ix),
        ),
        out_shape=jax.ShapeDtypeStruct((Gs, 1, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Gs * K * N,
            bytes_accessed=Gs * K * 2 + Gs * K * N * bits // 8 + Gs * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*prefetch, *args)
    return out.reshape(Gs, N)
