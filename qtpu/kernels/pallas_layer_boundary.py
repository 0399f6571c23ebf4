"""Pallas TPU kernel: ONE launch for everything between two attentions.

Decode (M ≤ 32) spends its time streaming weights; the per-layer chain
o-proj → MLP → next-layer qkv ran as 3 Pallas launches whose weight DMA
pipelines each stall at the kernel boundary (measured ~0.4 ms of
launch/serialization per 22-layer step on v5e, results/decode_budget.json).
This kernel phases ONE grid over all three weight streams:

  phase O   (j <  Jo):        y += attn[:, blk] @ Wo[blk, :]   (+x at j=0)
  boundary  (j == Jo):        h  = rms_norm(y) · mlp_norm[l]
  phase MLP (Jo ≤ j < Jo+Jf): acc += silu(h@Wg_blk)·(h@Wu_blk) @ Wd_blk
  boundary  (last MLP step):  y2 = y + acc  (written out)
                              h2 = rms_norm(y2) · attn_norm[l+1]
  phase QKV (j ≥ Jo+Jf):      qkv[:, blk] = h2 @ Wqkv[l+1][:, blk]

Phase O streams Wo over its CONTRACTION rows (full-width [M, D] f32
accumulator in VMEM — Mosaic has no dynamic lane indexing, so column
streaming into a scratch is off the table); the MLP phase streams the F
axis exactly like pallas_fused_mlp; the QKV phase streams output columns
with full-K dots. Every block index map CLAMPS outside its phase (Pallas
skips the DMA when the index repeats), so total traffic is exactly the
packed bytes of o/gate/up/down/qkv — one uninterrupted weight stream per
layer, with layer l+1's qkv prefetching while layer l's MLP finishes. The
two residual adds, both rms_norms and the silu·mul live in VMEM between
dots; no [M, D] activation touches HBM inside the span.

Weights arrive STACKED ([L, ...], qtpu.core.packing group-halves layout)
addressed by scalar-prefetched layer indices (l for o/mlp, l_next for
qkv) — zero-copy delivery inside the layers scan, same contract as
pallas_quantized_matmul_stacked.

Reference parity: fuses the reference's per-layer module chain
o_proj → mlp.gate/up/down → next layer input_layernorm → q/k/v (HF Llama
modules driven at eval time); the arithmetic is the tested dequant-matmul
math with f32 accumulators and norms.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qtpu.kernels.pallas_dequant_matmul import _dq_matmul_acc


def _rms(xf, w_row, eps):
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return xf * jax.lax.rsqrt(var + eps) * w_row[0, :][None, :].astype(
        jnp.float32
    )


def _boundary_kernel(
    attn_ref, x_ref, mn_ref, an_ref,
    o_ref, os_ref, oz_ref,
    g_ref, gs_ref, gz_ref,
    u_ref, us_ref, uz_ref,
    d_ref, ds_ref, dz_ref,
    q_ref, qs_ref, qz_ref,
    y2_ref, qkv_ref,
    y_scr, h_scr, acc_scr, h2_scr,
    *, bits, group, D, F, bro, bf, Jo, Jf, eps,
):
    j = pl.program_id(0)

    @pl.when(j < Jo)
    def _phase_o():
        part = _dq_matmul_acc(
            attn_ref[:], o_ref, os_ref, oz_ref,
            bits=bits, group=group, K=bro, split_dots=True,
        )  # [M, D] partial over this Q-row block
        prev = jnp.where(
            j == 0, x_ref[:].astype(jnp.float32), y_scr[:]
        )
        y_scr[:] = prev + part

    @pl.when(j == Jo)
    def _mlp_prologue():
        h_scr[:] = _rms(y_scr[:], mn_ref, eps).astype(h_scr.dtype)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(jnp.logical_and(j >= Jo, j < Jo + Jf))
    def _phase_mlp():
        h = h_scr[:]
        gate = _dq_matmul_acc(
            h, g_ref, gs_ref, gz_ref,
            bits=bits, group=group, K=D, split_dots=True,
        )
        up = _dq_matmul_acc(
            h, u_ref, us_ref, uz_ref,
            bits=bits, group=group, K=D, split_dots=True,
        )
        act = (
            (gate * jax.nn.sigmoid(gate)).astype(jnp.bfloat16)
            * up.astype(jnp.bfloat16)
        )
        acc_scr[:] += _dq_matmul_acc(
            act, d_ref, ds_ref, dz_ref,
            bits=bits, group=group, K=bf, split_dots=True,
        )

    @pl.when(j == Jo + Jf - 1)
    def _qkv_prologue():
        y2 = y_scr[:] + acc_scr[:]
        y2_ref[:] = y2.astype(y2_ref.dtype)
        h2_scr[:] = _rms(y2, an_ref, eps).astype(h2_scr.dtype)

    @pl.when(j >= Jo + Jf)
    def _phase_qkv():
        qkv_ref[:] = _dq_matmul_acc(
            h2_scr[:], q_ref, qs_ref, qz_ref,
            bits=bits, group=group, K=D, split_dots=True,
        ).astype(qkv_ref.dtype)


def _pick_block(total, K_other, bits, group, budget, row_stream=False):
    """Widest block of `total` that tiles it, aligns to the group, and
    whose double-buffered data+scales fit `budget` bytes."""
    for b in (1024, 512, 256, 128):
        if total % b or b % group:
            continue
        if row_stream:
            step = (b * K_other * bits // 8) + 2 * (b // group) * K_other * 3
        else:
            step = (K_other * b * bits // 8) + 2 * (K_other // group) * b * 3
        if step * 2 <= budget:
            return b
    return None


@partial(
    jax.jit,
    static_argnames=("meta_o", "meta_gu", "meta_d", "meta_q", "eps", "interpret"),
)
def pallas_layer_boundary_stacked(
    attn, x,
    mlp_norm, attn_norm,
    o_data, o_scales, o_zeros,
    gu_data, gu_scales, gu_zeros,
    d_data, d_scales, d_zeros,
    q_data, q_scales, q_zeros,
    meta_o, meta_gu, meta_d, meta_q,
    layer, layer_next,
    eps: float = 1e-5,
    interpret: bool = False,
):
    """(attn_out [.., Q], resid x [.., D]) → (y2 [.., D], qkv [.., Nq]).

    y2 = x + attn@Wo[l] + MLP(rms(x + attn@Wo[l])·mlp_norm[l]);
    qkv = rms(y2)·attn_norm[l_next] @ Wqkv[l_next].
    All weight sites packed-stacked [L, ...] (affine W4/W8, asymmetric).
    Raises NotImplementedError for uncovered shapes — callers compose the
    plain kernels instead.
    """
    bits, group, Qk, D = meta_o
    bits2, group2, K2, N2 = meta_gu
    bits3, group3, F, D3 = meta_d
    bits4, group4, K4, Nq = meta_q
    if len({bits, bits2, bits3, bits4}) != 1 or len(
        {group, group2, group3, group4}
    ) != 1:
        raise NotImplementedError("mixed bits/groups across sites")
    if K2 != D or D3 != D or K4 != D or N2 != 2 * F:
        raise NotImplementedError("site metas do not chain")
    if bits not in (4, 8) or group <= 0 or Qk % group or D % group or F % group:
        raise NotImplementedError("boundary kernel needs affine W4/W8 groups")
    if any(z is None for z in (o_zeros, gu_zeros, d_zeros, q_zeros)):
        raise NotImplementedError("boundary kernel expects asymmetric packing")
    if attn.dtype != jnp.bfloat16 or x.dtype != jnp.bfloat16:
        raise NotImplementedError("boundary kernel is bf16-activation only")
    orig_shape = x.shape
    M = 1
    for d in orig_shape[:-1]:
        M *= d
    if M > 32:
        raise NotImplementedError("boundary kernel is decode-only (M <= 32)")
    a2 = attn.reshape(M, Qk)
    x2 = x.reshape(M, D)
    pad_m = (-M) % 8
    if pad_m:
        a2 = jnp.pad(a2, ((0, pad_m), (0, 0)))
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
    Mp = M + pad_m
    pk = 8 // bits
    scratch = Mp * D * 12 + Mp * (Qk + D) * 2 + Mp * D * 2
    budget = (9 * 1024 * 1024 - scratch) // 3
    bro = _pick_block(Qk, D, bits, group, budget, row_stream=True)
    bf = _pick_block(F, D, bits, group, budget // 2)  # gate AND up blocks
    bq = _pick_block(Nq, D, bits, group, budget)
    if not bro or not bf or not bq:
        raise NotImplementedError("no block plan fits VMEM")
    G_d = D // group
    Jo, Jf, Jq = Qk // bro, F // bf, Nq // bq
    grid = (Jo + Jf + Jq,)
    L = gu_data.shape[0]

    # phase-clamped block indices: outside its phase each array repeats a
    # block it already fetched (first/last of its phase), so Pallas skips
    # the DMA and total traffic is exactly the packed bytes
    def oi(j):
        return jnp.minimum(j, Jo - 1)

    def fi(j):
        return jnp.clip(j - Jo, 0, Jf - 1)

    def qi(j):
        return jnp.clip(j - Jo - Jf, 0, Jq - 1)

    in_specs = [
        pl.BlockSpec((Mp, bro), lambda j, s: (0, oi(j))),
        pl.BlockSpec((Mp, D), lambda j, s: (0, 0)),
        pl.BlockSpec((None, 1, D), lambda j, s: (s[0], 0, 0)),  # mlp_norm[l]
        pl.BlockSpec((None, 1, D), lambda j, s: (s[1], 0, 0)),  # attn_norm[ln]
        # o_proj site [L, Qp, D]: contraction-row blocks; scales/zeros
        # host-reshaped [L, Q/bro, bro/g, D] (sub-8-row blocks must cover
        # the trailing dims)
        pl.BlockSpec((None, bro // pk, D), lambda j, s: (s[0], oi(j), 0)),
        pl.BlockSpec(
            (None, None, bro // group, D), lambda j, s: (s[0], oi(j), 0, 0)
        ),
        pl.BlockSpec(
            (None, None, bro // group, D), lambda j, s: (s[0], oi(j), 0, 0)
        ),
        # fused gateup site [L, Dp, 2F]: gate cols then up cols
        pl.BlockSpec((None, D // pk, bf), lambda j, s: (s[0], 0, fi(j))),
        pl.BlockSpec((None, G_d, bf), lambda j, s: (s[0], 0, fi(j))),
        pl.BlockSpec((None, G_d, bf), lambda j, s: (s[0], 0, fi(j))),
        pl.BlockSpec(
            (None, D // pk, bf), lambda j, s: (s[0], 0, Jf + fi(j))
        ),
        pl.BlockSpec((None, G_d, bf), lambda j, s: (s[0], 0, Jf + fi(j))),
        pl.BlockSpec((None, G_d, bf), lambda j, s: (s[0], 0, Jf + fi(j))),
        # down site [L, Fp, D]; scales/zeros host-reshaped [L, F/bf, bf/g, D]
        pl.BlockSpec((None, bf // pk, D), lambda j, s: (s[0], fi(j), 0)),
        pl.BlockSpec(
            (None, None, bf // group, D), lambda j, s: (s[0], fi(j), 0, 0)
        ),
        pl.BlockSpec(
            (None, None, bf // group, D), lambda j, s: (s[0], fi(j), 0, 0)
        ),
        # qkv site of layer l_next [L, Dp, Nq]: output-column blocks
        pl.BlockSpec((None, D // pk, bq), lambda j, s: (s[1], 0, qi(j))),
        pl.BlockSpec((None, G_d, bq), lambda j, s: (s[1], 0, qi(j))),
        pl.BlockSpec((None, G_d, bq), lambda j, s: (s[1], 0, qi(j))),
    ]
    lidx = jnp.stack(
        [
            jnp.asarray(layer, jnp.int32),
            jnp.asarray(layer_next, jnp.int32),
        ]
    )

    def kernel(s_ref, *refs):
        _boundary_kernel(
            *refs,
            bits=bits, group=group, D=D, F=F,
            bro=bro, bf=bf, Jo=Jo, Jf=Jf, eps=float(eps),
        )

    y2, qkv = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((Mp, D), lambda j, s: (0, 0)),
                pl.BlockSpec((Mp, bq), lambda j, s: (0, qi(j))),
            ],
            scratch_shapes=[
                pltpu.VMEM((Mp, D), jnp.float32),   # y (post-o residual)
                pltpu.VMEM((Mp, D), jnp.bfloat16),  # h (mlp input)
                pltpu.VMEM((Mp, D), jnp.float32),   # mlp accumulator
                pltpu.VMEM((Mp, D), jnp.bfloat16),  # h2 (qkv input)
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Mp, D), x.dtype),
            jax.ShapeDtypeStruct((Mp, Nq), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * (Qk * D + D * 2 * F + F * D + D * Nq),
            bytes_accessed=(Qk * D + 2 * D * F + F * D + D * Nq)
            * bits
            // 8,
            transcendentals=Mp * F,
        ),
        interpret=interpret,
    )(lidx, a2, x2, *(
        (mlp_norm.reshape(L, 1, D), attn_norm.reshape(L, 1, D))
        + (
            o_data,
            o_scales.reshape(L, Qk // bro, bro // group, D),
            o_zeros.reshape(L, Qk // bro, bro // group, D),
        )
        + (gu_data, gu_scales, gu_zeros)
        + (gu_data, gu_scales, gu_zeros)
        + (
            d_data,
            d_scales.reshape(L, F // bf, bf // group, D),
            d_zeros.reshape(L, F // bf, bf // group, D),
        )
        + (q_data, q_scales, q_zeros)
    ))
    if pad_m:
        y2 = y2[:M]
        qkv = qkv[:M]
    return (
        y2.reshape(orig_shape[:-1] + (D,)),
        qkv.reshape(orig_shape[:-1] + (Nq,)),
    )
