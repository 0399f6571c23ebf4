"""Pallas TPU kernel: ONE launch for a whole packed SwiGLU MLP block.

Computes, for one decoder layer at decode shapes:

    h   = rms_norm(x, nw, eps)                       (optional, in-kernel)
    act = silu(h @ Wg) * (h @ Wu)                    (packed gate/up)
    y   = x + act @ Wd                               (packed down + residual)

The unfused path runs this as ~7 XLA/Pallas kernels per layer (norm, fused
gate/up dequant-matmul, silu·mul, down dequant-matmul, residual add), each
a separate launch whose first weight-tile DMA cannot start until the
previous kernel retires. Here the grid streams the F axis: step j dequants
gate/up columns [j·bf, (j+1)·bf), activates them, and immediately contracts
them with the matching `bf` packed rows of W_down into a resident [M, D]
f32 accumulator — every MLP weight byte is read exactly once in one
launch, the [M, F] activation never exists in HBM, and the DMA pipeline
runs uninterrupted across all three matmuls.

Layout contract (qtpu.core.packing group-halves, same as
pallas_dequant_matmul): gate/up arrive as the FUSED gateup site
([Kp, 2F] packed columns [gate | up], quant.apply.fuse_packed_sites) —
passed twice with column-offset index maps, so no split copy; W_down is
[Fp, D] with groups tiling F. Decode-only by design: x [M ≤ 32, K] stays
resident in VMEM (prefill M is MXU-bound — the plain kernels win there).

Reference parity: this fuses the reference's mlp forward
(TinyLlama SwiGLU; torch modules gate_proj/up_proj/down_proj called at
quantization eval time via the HF model) into one device program; the
arithmetic is the same dequant-matmul math tested against it, with silu
and the accumulator kept in f32 (one final bf16 rounding instead of two).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qtpu.kernels.pallas_dequant_matmul import _dq_matmul_acc


def _fused_mlp_kernel(
    x_ref, nw_ref,
    g_ref, gs_ref, gz_ref,
    u_ref, us_ref, uz_ref,
    d_ref, ds_ref, dz_ref,
    o_ref,
    h_scr, acc_scr,
    *, bits, group, K, bf, eps, norm, residual,
):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _prologue():
        xf = x_ref[:].astype(jnp.float32)
        if norm:
            var = jnp.mean(xf * xf, axis=-1, keepdims=True)
            h = xf * jax.lax.rsqrt(var + eps)
            h = h * nw_ref[0, :][None, :].astype(jnp.float32)
        else:
            h = xf
        h_scr[:] = h.astype(h_scr.dtype)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    h = h_scr[:]
    gate = _dq_matmul_acc(
        h, g_ref, gs_ref, gz_ref, bits=bits, group=group, K=K, split_dots=True
    )  # [M, bf] f32
    up = _dq_matmul_acc(
        h, u_ref, us_ref, uz_ref, bits=bits, group=group, K=K, split_dots=True
    )
    # model math: silu in f32, cast to bf16, multiply by bf16 up
    act = (
        (gate * jax.nn.sigmoid(gate)).astype(jnp.bfloat16)
        * up.astype(jnp.bfloat16)
    )
    acc_scr[:] += _dq_matmul_acc(
        act, d_ref, ds_ref, dz_ref, bits=bits, group=group, K=bf,
        split_dots=True,
    )  # [M, D] f32

    @pl.when(j == pl.num_programs(0) - 1)
    def _epilogue():
        out = acc_scr[:]
        if residual:
            out = out + x_ref[:].astype(jnp.float32)
        o_ref[:] = out.astype(o_ref.dtype)


def _plan(M, K, F, D, bits, group):
    """Choose the F-block width: bigger blocks mean fewer grid steps (per-
    step overhead ~0.5 µs) but more VMEM per step (gate + up + down blocks,
    double-buffered) on top of the resident scratches."""
    scratch_bytes = M * K * 2 + M * D * 4  # h_scr bf16 + acc f32, resident
    for bf in (1024, 512, 256):
        if F % bf or bf % group:
            continue
        step_bytes = (2 * K * bf + bf * D) * bits // 8
        if step_bytes * 2 + scratch_bytes <= 10 * 1024 * 1024:
            return bf
    raise NotImplementedError("no F block fits VMEM for these dims")


@partial(
    jax.jit,
    static_argnames=("meta_gu", "meta_d", "eps", "norm", "residual", "interpret"),
)
def pallas_fused_mlp(
    x,
    norm_w,
    gu_data, gu_scales, gu_zeros,
    d_data, d_scales, d_zeros,
    meta_gu, meta_d,
    eps: float = 1e-5,
    norm: bool = True,
    residual: bool = True,
    interpret: bool = False,
):
    """y = [x +] silu(rms_norm(x)@Wg) * (...@Wu) @ Wd in one pallas_call.

    x [..., K]; gu_* the packed FUSED gateup site (meta_gu = (bits, g, K,
    2F)); d_* the packed down site (meta_d = (bits, g, F, K)). Raises
    NotImplementedError for shapes/dtypes the kernel does not cover —
    callers fall back to the composed ops path.
    """
    bits, group, K, N2 = meta_gu
    bits_d, group_d, F, D = meta_d
    if bits != bits_d or group != group_d or N2 != 2 * F or D != K:
        raise NotImplementedError("gateup/down metas do not chain")
    if bits not in (4, 8) or group <= 0 or K % group or F % group:
        raise NotImplementedError("fused mlp needs affine W4/W8 groups")
    if gu_zeros is None or d_zeros is None:
        raise NotImplementedError("fused mlp expects asymmetric packing")
    if x.dtype != jnp.bfloat16:
        # h_scr is bf16; silently downcasting f32 activations would diverge
        # from the composed fallback — let the caller compose plain ops
        raise NotImplementedError("fused mlp is bf16-activation only")
    orig_shape = x.shape
    M = 1
    for d in orig_shape[:-1]:
        M *= d
    if M > 32:
        raise NotImplementedError("fused mlp is decode-only (M <= 32)")
    x2 = x.reshape(M, K)
    pad_m = (-M) % 8
    if pad_m:
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
    Mp = M + pad_m
    bf = _plan(Mp, K, F, D, bits, group)
    G = K // group
    pk = 8 // bits  # packed rows per K row
    grid = (F // bf,)

    gu_col = lambda j: j  # gate columns block index
    up_col = lambda j: F // bf + j

    in_specs = [
        pl.BlockSpec((Mp, K), lambda j: (0, 0)),
        pl.BlockSpec((1, K), lambda j: (0, 0)),
        pl.BlockSpec((K // pk, bf), lambda j: (0, gu_col(j))),
        pl.BlockSpec((G, bf), lambda j: (0, gu_col(j))),
        pl.BlockSpec((G, bf), lambda j: (0, gu_col(j))),
        pl.BlockSpec((K // pk, bf), lambda j: (0, up_col(j))),
        pl.BlockSpec((G, bf), lambda j: (0, up_col(j))),
        pl.BlockSpec((G, bf), lambda j: (0, up_col(j))),
        pl.BlockSpec((bf // pk, D), lambda j: (j, 0)),
        # down scales/zeros reshaped to [F/bf, bf/g, D] host-side: a
        # (bf/g, D) block of the 2D array has sub-8 rows, which Mosaic
        # only allows when the block covers the full trailing dims
        pl.BlockSpec((None, bf // group, D), lambda j: (j, 0, 0)),
        pl.BlockSpec((None, bf // group, D), lambda j: (j, 0, 0)),
    ]
    nw = (
        norm_w.reshape(1, K)
        if norm_w is not None
        else jnp.ones((1, K), x.dtype)
    )
    out = pl.pallas_call(
        partial(
            _fused_mlp_kernel,
            bits=bits, group=group, K=K, bf=bf, eps=float(eps),
            norm=bool(norm), residual=bool(residual),
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Mp, D), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((Mp, D), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((Mp, K), jnp.bfloat16),
            pltpu.VMEM((Mp, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * 2 * F + 2 * Mp * F * D,
            bytes_accessed=(2 * K * F + F * D) * bits // 8 + Mp * (K + D) * 2,
            transcendentals=Mp * F,
        ),
        interpret=interpret,
    )(
        x2, nw,
        gu_data, gu_scales, gu_zeros,
        gu_data, gu_scales, gu_zeros,
        d_data,
        d_scales.reshape(F // bf, bf // group, D),
        d_zeros.reshape(F // bf, bf // group, D),
    )
    if pad_m:
        out = out[:M]
    return out.reshape(orig_shape[:-1] + (D,))


@partial(
    jax.jit,
    static_argnames=("meta_gu", "meta_d", "eps", "norm", "residual", "interpret"),
)
def pallas_fused_mlp_stacked(
    x,
    norm_w,
    gu_data, gu_scales, gu_zeros,
    d_data, d_scales, d_zeros,
    meta_gu, meta_d,
    layer,
    eps: float = 1e-5,
    norm: bool = True,
    residual: bool = True,
    interpret: bool = False,
):
    """Layer-stacked variant: weights are [L, ...] arrays addressed by a
    scalar-prefetched layer index — zero-copy delivery inside a layers
    scan (see pallas_quantized_matmul_stacked). norm_w is [L, K]."""
    bits, group, K, N2 = meta_gu
    bits_d, group_d, F, D = meta_d
    if bits != bits_d or group != group_d or N2 != 2 * F or D != K:
        raise NotImplementedError("gateup/down metas do not chain")
    if bits not in (4, 8) or group <= 0 or K % group or F % group:
        raise NotImplementedError("fused mlp needs affine W4/W8 groups")
    if gu_zeros is None or d_zeros is None:
        raise NotImplementedError("fused mlp expects asymmetric packing")
    if x.dtype != jnp.bfloat16:
        # h_scr is bf16; silently downcasting f32 activations would diverge
        # from the composed fallback — let the caller compose plain ops
        raise NotImplementedError("fused mlp is bf16-activation only")
    orig_shape = x.shape
    M = 1
    for d in orig_shape[:-1]:
        M *= d
    if M > 32:
        raise NotImplementedError("fused mlp is decode-only (M <= 32)")
    x2 = x.reshape(M, K)
    pad_m = (-M) % 8
    if pad_m:
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
    Mp = M + pad_m
    bf = _plan(Mp, K, F, D, bits, group)
    G = K // group
    pk = 8 // bits
    grid = (F // bf,)

    in_specs = [
        pl.BlockSpec((Mp, K), lambda j, l: (0, 0)),
        pl.BlockSpec((None, 1, K), lambda j, l: (l[0], 0, 0)),
        pl.BlockSpec((None, K // pk, bf), lambda j, l: (l[0], 0, j)),
        pl.BlockSpec((None, G, bf), lambda j, l: (l[0], 0, j)),
        pl.BlockSpec((None, G, bf), lambda j, l: (l[0], 0, j)),
        pl.BlockSpec((None, K // pk, bf), lambda j, l: (l[0], 0, F // bf + j)),
        pl.BlockSpec((None, G, bf), lambda j, l: (l[0], 0, F // bf + j)),
        pl.BlockSpec((None, G, bf), lambda j, l: (l[0], 0, F // bf + j)),
        pl.BlockSpec((None, bf // pk, D), lambda j, l: (l[0], j, 0)),
        # down scales/zeros reshaped to [L, F/bf, bf/g, D] (see immediate
        # variant): sub-8-row blocks must cover the full trailing dims
        pl.BlockSpec(
            (None, None, bf // group, D), lambda j, l: (l[0], j, 0, 0)
        ),
        pl.BlockSpec(
            (None, None, bf // group, D), lambda j, l: (l[0], j, 0, 0)
        ),
    ]
    L = gu_data.shape[0]
    nw = (
        norm_w.reshape(L, 1, K)
        if norm_w is not None
        else jnp.ones((L, 1, K), x.dtype)
    )
    lidx = jnp.asarray(layer, jnp.int32).reshape(1)

    def kernel(l_ref, *refs):  # scalar-prefetch ref arrives first; unused
        _fused_mlp_kernel(
            *refs,
            bits=bits, group=group, K=K, bf=bf, eps=float(eps),
            norm=bool(norm), residual=bool(residual),
        )

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((Mp, D), lambda j, l: (0, 0)),
            scratch_shapes=[
                pltpu.VMEM((Mp, K), jnp.bfloat16),
                pltpu.VMEM((Mp, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, D), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * 2 * F + 2 * Mp * F * D,
            bytes_accessed=(2 * K * F + F * D) * bits // 8 + Mp * (K + D) * 2,
            transcendentals=Mp * F,
        ),
        interpret=interpret,
    )(
        lidx,
        x2, nw,
        gu_data, gu_scales, gu_zeros,
        gu_data, gu_scales, gu_zeros,
        d_data,
        d_scales.reshape(L, F // bf, bf // group, D),
        d_zeros.reshape(L, F // bf, bf // group, D),
    )
    if pad_m:
        out = out[:M]
    return out.reshape(orig_shape[:-1] + (D,))
