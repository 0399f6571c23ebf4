"""Pallas TPU kernel: fused dequantize + matmul for packed W4/W8 weights.

The serving hot path (the "native layer" of this framework, SURVEY §2.2).
Rationale: a W4 weight is 4 bits in HBM instead of 16 — serving matmuls are
HBM-bandwidth-bound, so streaming packed bytes into VMEM and dequantizing
there (VPU) right before the MXU dot beats the bf16 dense path by up to ~4×
on memory-bound shapes.

Layout contract (qtpu.core.packing, group-halves):
  x       [M, K]        bf16
  data w4 [K/2, N] int8 — within each group of g K-rows, byte j holds
          (low nibble = row j, high nibble = row j + g/2); so a [g/2, N]
          packed tile unpacks to two contiguous [g/2, N] tiles sharing one
          scale row — no sublane interleave in-kernel.
  data w8 [K, N]  int8 — values biased by −128 (unsigned domain − 128)
  scales  [K/g, N] bf16;  zeros [K/g, N] uint8 (asymmetric) or None
          (symmetric: implicit zero = 2^(b−1))

Design choice: ONE K step per output tile (grid = (M/bm, N/bn), full-K
blocks). Mosaic cannot do dynamically-indexed sub-8-row scale loads and
K/g-row blocks are below the (8,128) tile floor, so blocking K would force
aligned-scale gymnastics; with full-K blocks every per-group scale row
index is STATIC (probed: static row loads lower fine) and no cross-step
accumulator is needed. VMEM stays comfortable through bm/bn choice even at
K≈11k (7B-class down_proj).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# nibble-unpack strategy (see kernel body). Default "lomix" (r5): raw-
# byte + lo-nibble split dots with the 1/16-damped x mix — 1.086 vs
# 1.126 ms for the B=8 decode matmul chain against the i32 mask+shift
# form on v5e (results/w4_unpack_floor.json has the ladder). QTPU_UNPACK
# selects i32 / vtrick / bf16 alternatives; QTPU_F32_UNPACK=1 re-measures
# the f32 floor-arithmetic variant on other hardware.
_F32_UNPACK = os.environ.get("QTPU_F32_UNPACK", "0") == "1"


def _dq_matmul_kernel(x_ref, d_ref, s_ref, z_ref, o_ref, *, bits, group, K):
    # Unpack strategy by output-tile height: split-dots keep the VPU chain
    # minimal but halve (W4) / quarter (W2) the MXU contraction dim — free
    # when the MXU is starved anyway (decode, bm ≤ 32), a ~25% prefill hit
    # when it isn't (measured 29.5k → 22.2k prefill tokens/s at S=2048).
    split_dots = x_ref.shape[0] <= 32
    _dq_matmul_body(
        x_ref, d_ref, s_ref, z_ref, o_ref,
        bits=bits, group=group, K=K, split_dots=split_dots,
    )


def _dq_matmul_body(
    x_ref, d_ref, s_ref, z_ref, o_ref, *, bits, group, K, split_dots
):
    o_ref[:] = _dq_matmul_acc(
        x_ref[:], d_ref, s_ref, z_ref,
        bits=bits, group=group, K=K, split_dots=split_dots,
    ).astype(o_ref.dtype)


def _dq_matmul_acc(
    x, d_ref, s_ref, z_ref, *, bits, group, K, split_dots
):
    """Per (i, j) program: y = Σ_groups s∘(x_g @ q_g) − s∘z∘Σ(x_g).
    x is an in-register [bm, K] value; d/s/z are (blocked) refs whose row 0
    is the start of this K range. Returns the [bm, bn] f32 accumulator (the
    composable core shared by the plain kernels and the fused-MLP kernel).

    The scale/zero corrections act on the [bm, bn] OUTPUT tile instead of
    the [group, bn] weight tile: the MXU consumes raw integer codes
    (0..15/0..255 are exact in bf16), so the VPU does only unpack+convert
    on the big tile — measured ~30% faster than dequant-then-matmul at
    decode shapes, and slightly more accurate (corrections in f32 instead
    of bf16-rounded dequantized weights)."""
    n_groups = K // group
    acc = None
    for c in range(n_groups):  # static unroll; all indices static
        s = s_ref[c, :][None, :].astype(jnp.float32)  # [1, bn]
        xg = x[:, c * group : (c + 1) * group]
        hi_bias = None  # excess-8 hi-field bias, folded into the correction
        if (
            bits == 4
            and split_dots
            and os.environ.get("QTPU_NOUNPACK_TIMING") == "1"
        ):
            # TIMING-ONLY floor probe (tools/make_unpack_floor.py): raw
            # packed bytes into both split dots — WRONG MATH, identical
            # traffic and dot structure. The hard floor of any in-kernel
            # field-isolation scheme (1 convert, 0 isolation ops).
            h = group // 2
            v_b = d_ref[c * h : (c + 1) * h, :].astype(x.dtype)
            part = jnp.dot(
                xg[:, :h], v_b, preferred_element_type=jnp.float32
            ) + jnp.dot(xg[:, h:], v_b, preferred_element_type=jnp.float32)
        elif (
            bits == 4
            and split_dots
            and os.environ.get("QTPU_UNPACK", "i32") == "bf16"
        ):
            # bf16-ARITHMETIC nibble extraction: ONE int8→bf16 convert then
            # float ops (every integer ≤ 256 is exact in bf16's 8
            # significand bits) — no i32 round trip and no int8 shifts
            # (Mosaic rejects arith.shrsi on i8). With the excess-8 hi
            # storage the byte IS lo + 16·(q_hi − 8), so
            #   hs = ⌊v/16⌋ = q_hi − 8;  lo = v − 16·hs ∈ [0, 15]
            # and no mod-16 sign fix is needed (3 ALU ops total).
            h = group // 2
            lo_row = c * h
            f = d_ref[lo_row : lo_row + h, :].astype(jnp.bfloat16)
            hs = jnp.floor(f * (1.0 / 16.0))  # = q_hi − 8
            lo = f - 16.0 * hs
            part = jnp.dot(
                xg[:, :h], lo.astype(x.dtype), preferred_element_type=jnp.float32
            ) + jnp.dot(
                xg[:, h:], hs.astype(x.dtype), preferred_element_type=jnp.float32
            )
            hi_bias = 8.0 * jnp.sum(
                xg[:, h:].astype(jnp.float32), axis=1, keepdims=True
            )
        elif (
            bits == 4
            and split_dots
            and os.environ.get("QTPU_UNPACK", "lomix") in ("vtrick", "vtrick16", "lomix")
        ):
            # RAW-BYTE split dots: never isolate the lo nibble. With the
            # excess-8 storage the byte value IS v = lo + 16·h_s
            # (h_s = q_hi − 8), so
            #   x_lo@lo + x_hi@h_s = x_lo@v + (x_hi − 16·x_lo)@h_s
            # — algebraically identical to the masked form (the bias
            # correction below is unchanged), but the big [h, bn] tile
            # needs only v (ONE direct i8→bf16 convert) and h_s; the
            # 16-fold x mix happens on the tiny [bm, h] activation tile.
            # 'vtrick': h_s via i32 arithmetic shift (2 ops + convert);
            # 'vtrick16': h_s = floor(v/16) in bf16 (2 VPU ops, no i32).
            h = group // 2
            pu8 = d_ref[c * h : (c + 1) * h, :]
            v_b = pu8.astype(x.dtype)  # |v| ≤ 128, exact in bf16
            if os.environ.get("QTPU_UNPACK", "lomix") == "lomix":
                # h_s = (v − lo)/16 ⇒ x_lo@lo + x_hi@h_s =
                #   (x_lo − x_hi/16)@lo + (x_hi@v)/16.
                # The 1/16-damped mix keeps bf16 mix rounding ~16× below
                # the signal (the 16·x_lo form amplified it to ~2% — see
                # vtrick note below); still drops the SRA from the big
                # tile (lo: convert+AND+convert; v: one convert).
                lo_b = (pu8.astype(jnp.int32) & 0xF).astype(x.dtype)
                xlo_mix = xg[:, :h] - xg[:, h:] * 0.0625
                part = jnp.dot(
                    xlo_mix, lo_b, preferred_element_type=jnp.float32
                ) + 0.0625 * jnp.dot(
                    xg[:, h:], v_b, preferred_element_type=jnp.float32
                )
            else:
                # raw-byte form: x_lo@v + (x_hi − 16·x_lo)@h_s. One
                # convert for the big tile's v, but the ×16 mix amplifies
                # bf16 rounding of the x tile ~16× (measured 2.3% rel
                # error) — kept for measurement, not for serving.
                if os.environ.get("QTPU_UNPACK") == "vtrick16":
                    hs = jnp.floor(v_b * jnp.asarray(1.0 / 16.0, x.dtype))
                else:
                    hs = jax.lax.shift_right_arithmetic(
                        pu8.astype(jnp.int32), 4
                    ).astype(x.dtype)
                xmix = xg[:, h:] - 16.0 * xg[:, :h]
                part = jnp.dot(
                    xg[:, :h], v_b, preferred_element_type=jnp.float32
                ) + jnp.dot(xmix, hs, preferred_element_type=jnp.float32)
            hi_bias = 8.0 * jnp.sum(
                xg[:, h:].astype(jnp.float32), axis=1, keepdims=True
            )
        elif bits == 4 and split_dots and not _F32_UNPACK:
            # Split-dot unpack with the EXCESS-8 hi field: the hi codes
            # come out of ONE sign-extending shift as q_hi − 8 (no mask —
            # the W4 unpack is the binding VPU cost at decode, measured
            # 472 vs 702 GB/s effective for W8 at identical shapes), and
            # the −8 bias folds into the per-group zero correction below.
            h = group // 2
            pu = d_ref[c * h : (c + 1) * h, :].astype(jnp.int32)
            part = jnp.dot(
                xg[:, :h],
                (pu & 0xF).astype(x.dtype),
                preferred_element_type=jnp.float32,
            ) + jnp.dot(
                xg[:, h:],
                jax.lax.shift_right_arithmetic(pu, 4).astype(x.dtype),
                preferred_element_type=jnp.float32,
            )
            hi_bias = 8.0 * jnp.sum(
                xg[:, h:].astype(jnp.float32), axis=1, keepdims=True
            )
        elif bits == 2 and split_dots and not _F32_UNPACK:
            # Split-dot unpack: one MXU dot per bit-field instead of
            # concatenating unpacked fields into one [group, bn] operand.
            # The concatenate was pure VPU copy work, and the low field
            # needs no 0xFF un-signing (sign-extension preserves low bits;
            # for the top field sra-then-mask is sign-correct). Measured
            # 25.1 → 8.8 µs (459 → >1300 GB/s effective) at the decode
            # gate/up site [8, 2048]×[2048, 11264] on v5e vs the
            # concat+single-dot chain. Same math: each dot accumulates
            # f32; only the f32 add order across fields differs.
            n_sub = 4
            h = group // n_sub
            mask = 0x3
            lo = c * h
            pu = d_ref[lo : lo + h, :].astype(jnp.int32)
            part = None
            for i in range(n_sub):  # field i = rows [i·h, (i+1)·h)
                codes = (
                    jax.lax.shift_right_arithmetic(pu, 2 * i) & mask
                    if i
                    else pu & mask
                )
                p = jnp.dot(
                    xg[:, i * h : (i + 1) * h],
                    codes.astype(x.dtype),  # ≤8-bit codes exact in bf16
                    preferred_element_type=jnp.float32,
                )
                part = p if part is None else part + p
        else:
            if bits == 4 and _F32_UNPACK:
                packed = d_ref[c * (group // 2) : (c + 1) * (group // 2), :]
                # f32-arithmetic unpack: one sitofp then float ops — kept
                # as a measurable alternative (QTPU_F32_UNPACK=1); slower
                # than split-dots on v5e. The signed byte IS
                # lo + 16·(q_hi − 8) under excess-8 storage.
                f = packed.astype(jnp.float32)
                hs = jnp.floor(f * (1.0 / 16.0))  # = q_hi − 8
                lo = f - 16.0 * hs
                q = jnp.concatenate([lo, hs + 8.0], axis=0)  # [group, bn]
            elif bits == 4:
                # concat chain: full-group contraction feeds the MXU;
                # unsigned-domain recovery of the excess-8 hi is one XOR
                pu = d_ref[
                    c * (group // 2) : (c + 1) * (group // 2), :
                ].astype(jnp.int32) & 0xFF
                lo = pu & 0xF
                hi = jax.lax.shift_right_arithmetic(pu, 4) ^ 8
                q = jnp.concatenate([lo, hi], axis=0)  # [group, bn]
            elif bits == 2:
                packed = d_ref[c * (group // 4) : (c + 1) * (group // 4), :]
                pu = packed.astype(jnp.int32) & 0xFF
                q = jnp.concatenate(
                    [
                        jax.lax.shift_right_arithmetic(pu, 2 * i) & 0x3
                        for i in range(4)
                    ],
                    axis=0,
                )  # [group, bn] in [0,3] (group-quarters layout)
            else:
                q = d_ref[c * group : (c + 1) * group, :].astype(jnp.int32) + 128
            qf = q.astype(x.dtype)  # integer codes, exact in bf16 for ≤8 bits
            part = jnp.dot(xg, qf, preferred_element_type=jnp.float32)
        if z_ref is not None:
            z = z_ref[c, :][None, :].astype(jnp.int32).astype(jnp.float32)
        else:
            z = float(2 ** (bits - 1))
        sum_x = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        corr = sum_x * z
        if hi_bias is not None:  # excess-8 hi codes carried a −8 bias
            corr = corr - hi_bias
        part = part * s - corr * s
        acc = part if acc is None else acc + part
    return acc


def _choose_blocks(M, K, N):
    # keep x-block + packed-block + out under a few MB of VMEM
    bm = next((b for b in (256, 128, 64, 32, 16, 8) if M % b == 0), M)
    while bm * K * 2 > 4 * 1024 * 1024 and bm > 8:
        bm //= 2
    # bn=1024 measured best (r4): isolated stacked gateup call 23.4 vs
    # 25.7 us at bn=512, full decode step 2.182 vs 2.216 ms; 2048 is
    # slightly worse again. QTPU_BN_MAX overrides for other hardware.
    import os

    wide = int(os.environ.get("QTPU_BN_MAX", "1024"))
    cands = [b for b in (2048, 1024, 512, 256, 128) if b <= wide]
    bn = next((b for b in cands if N % b == 0), N)
    while K * bn > 8 * 1024 * 1024 and bn > 128:
        bn //= 2
    return bm, bn


def _cb_matmul_kernel(x_ref, d_ref, s_ref, cb_ref, o_ref, *, group, K, n_levels):
    """Codebook (POT/APOT) variant: y = Σ_groups s ∘ (x_g @ cb[q_g]).

    Codes are int4-packed (group-halves, same layout as W4). The LUT is a
    branch-free select chain over the ≤16 static level slots, reading each
    level value as a scalar from SMEM — Mosaic has no vector gather, and
    for ≤16 entries selects are cheap VPU work. Levels are sums of powers
    of two (POT/APOT), so exact in bf16 — the MXU consumes cb[q] directly
    and the per-group scale folds into the [bm, bn] output tile, exactly
    like the affine kernel above."""
    x = x_ref[:]  # [bm, K]
    n_groups = K // group
    acc = None
    for c in range(n_groups):
        s = s_ref[c, :][None, :].astype(jnp.float32)  # [1, bn]
        packed = d_ref[c * (group // 2) : (c + 1) * (group // 2), :]
        pu = packed.astype(jnp.int32) & 0xFF
        lo = pu & 0xF
        hi = jax.lax.shift_right_arithmetic(pu, 4) ^ 8  # excess-8 storage
        q = jnp.concatenate([lo, hi], axis=0)  # [group, bn] codes
        vals = jnp.full(q.shape, cb_ref[0, 0], jnp.float32)
        for l in range(1, n_levels):
            vals = jnp.where(q == l, cb_ref[0, l], vals)
        part = jnp.dot(
            x[:, c * group : (c + 1) * group],
            vals.astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        part = part * s
        acc = part if acc is None else acc + part
    o_ref[:] = acc.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("meta", "interpret"))
def pallas_codebook_matmul(x, data, scales, codebook, meta, interpret=False):
    """y = x @ (scales ∘ codebook[codes]) via the fused Pallas kernel.

    Same tiling/dispatch contract as pallas_quantized_matmul; codebook is
    a [n_levels ≤ 16] level table placed in SMEM. Raises NotImplementedError
    for shapes the kernel does not tile (caller falls back to XLA)."""
    bits, group, K, N = meta
    if bits != 4 or group <= 0 or group % 4 != 0 or K % group != 0:
        raise NotImplementedError("pallas codebook path needs 4-bit codes")
    n_levels = int(codebook.shape[-1])
    if n_levels > 16:
        raise NotImplementedError("codebook too large for select-chain LUT")
    orig_shape = x.shape
    M = 1
    for d in orig_shape[:-1]:
        M *= d
    x2 = x.reshape(M, K)
    pad_m = (-M) % max(1, int(os.environ.get("QTPU_M_ALIGN", "8")))
    if pad_m:
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
    Mp = M + pad_m
    bm, bn = _choose_blocks(Mp, K, N)
    if Mp % bm or N % bn:
        raise NotImplementedError("shapes do not tile")

    grid = (Mp // bm, N // bn)
    out = pl.pallas_call(
        partial(_cb_matmul_kernel, group=group, K=K, n_levels=n_levels),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (K // 2, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (K // group, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, n_levels), lambda i, j: (0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=Mp * K * 2 + K * N // 2 + Mp * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, data, scales, codebook.astype(jnp.float32).reshape(1, n_levels))
    if pad_m:
        out = out[:M]
    return out.reshape(orig_shape[:-1] + (N,))


@partial(jax.jit, static_argnames=("meta", "eps", "interpret"))
def pallas_quantized_matmul_stacked(
    x, data, scales, zeros, meta, layer,
    norm_w=None, resid=None, eps: float = 1e-5, interpret=False,
):
    """y = x @ dequant(data[layer]) reading blocks straight from the
    STACKED [L, ...] arrays via scalar-prefetch indexing.

    Inside a `lax.scan` over layers, passing per-layer weight slices as
    scan xs makes XLA materialize a copy of every layer's packed weights
    before the kernel can read them — for a 1.1B W4 model that is ~25 MB
    of extra read+write traffic per layer per decode step, measured as
    the dominant per-layer cost (~2× the matmul kernels themselves). Here
    the layer index is a prefetched SMEM scalar and every BlockSpec
    index_map addresses dimension 0 of the stacked array directly, so the
    kernel DMAs exactly the blocks it needs from HBM and nothing is
    copied. x: [..., K]; data [L, Kp, N]; scales/zeros [L, K/g, N];
    layer: traced int32 scalar.

    Optional decode-path fusions (each removes an XLA kernel + its HBM
    round trip of the [M, K]/[M, N] activation between launches):
      norm_w [L, K]: rms_norm(x)·norm_w[layer] applied to the x block
        in-kernel before the dot (computed per program — at decode bm the
        redundant [bm, K] norm is trivia next to the weight stream).
      resid [..., N]: added to the output tile (y = resid + x@W)."""
    bits, group, K, N = meta
    if group <= 0 or group % 4 != 0 or K % group != 0:
        raise NotImplementedError("pallas path needs group % 4 == 0 | K")
    orig_shape = x.shape
    M = 1
    for d in orig_shape[:-1]:
        M *= d
    x2 = x.reshape(M, K)
    pad_m = (-M) % max(1, int(os.environ.get("QTPU_M_ALIGN", "8")))
    if pad_m:
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
    Mp = M + pad_m
    bm, bn = _choose_blocks(Mp, K, N)
    if Mp % bm or N % bn:
        raise NotImplementedError("shapes do not tile")
    Kp = K // (8 // bits) if bits in (2, 4) else K
    G = K // group

    grid = (Mp // bm, N // bn)
    in_specs = [
        pl.BlockSpec((bm, K), lambda i, j, l: (i, 0)),
        pl.BlockSpec((None, Kp, bn), lambda i, j, l: (l[0], 0, j)),
        pl.BlockSpec((None, G, bn), lambda i, j, l: (l[0], 0, j)),
    ]
    args = [x2, data, scales]
    has_zeros = zeros is not None
    if has_zeros:
        in_specs.append(pl.BlockSpec((None, G, bn), lambda i, j, l: (l[0], 0, j)))
        args.append(zeros)
    has_norm = norm_w is not None
    if has_norm:
        L = data.shape[0]
        in_specs.append(
            pl.BlockSpec((None, 1, K), lambda i, j, l: (l[0], 0, 0))
        )
        args.append(norm_w.reshape(L, 1, K))
    has_resid = resid is not None
    if has_resid:
        r2 = resid.reshape(M, N)
        if pad_m:
            r2 = jnp.pad(r2, ((0, pad_m), (0, 0)))
        in_specs.append(pl.BlockSpec((bm, bn), lambda i, j, l: (i, j)))
        args.append(r2)

    def kernel(l_ref, *refs):
        refs = list(refs)
        o_ref = refs.pop()
        r_ref = refs.pop() if has_resid else None
        nw_ref = refs.pop() if has_norm else None
        z_ref = refs.pop() if has_zeros else None
        x_ref, d_ref, s_ref = refs
        x = x_ref[:]
        if nw_ref is not None:
            xf = x.astype(jnp.float32)
            var = jnp.mean(xf * xf, axis=-1, keepdims=True)
            xf = xf * jax.lax.rsqrt(var + eps)
            x = (xf * nw_ref[0, :][None, :].astype(jnp.float32)).astype(
                x.dtype
            )
        acc = _dq_matmul_acc(
            x, d_ref, s_ref, z_ref, bits=bits, group=group, K=K,
            split_dots=x.shape[0] <= 32,
        )
        if r_ref is not None:
            acc = acc + r_ref[:].astype(jnp.float32)
        o_ref[:] = acc.astype(o_ref.dtype)

    lidx = jnp.asarray(layer, jnp.int32).reshape(1)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, l: (i, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=Mp * K * 2 + K * N * bits // 8 + Mp * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(lidx, *args)
    if pad_m:
        out = out[:M]
    return out.reshape(orig_shape[:-1] + (N,))


@partial(jax.jit, static_argnames=("meta", "interpret"))
def pallas_quantized_matmul(x, data, scales, zeros, meta, interpret=False):
    """y = x @ dequant(data) via the fused Pallas kernel.

    x: [..., K] bf16/f32; returns [..., N] in x.dtype.
    meta = (bits, group, K, N). Raises NotImplementedError for shapes the
    kernel does not tile (caller falls back to the XLA path).
    """
    bits, group, K, N = meta
    if group <= 0 or group % 4 != 0 or K % group != 0:
        raise NotImplementedError("pallas path needs group % 4 == 0 | K")
    orig_shape = x.shape
    M = 1
    for d in orig_shape[:-1]:
        M *= d
    x2 = x.reshape(M, K)

    pad_m = (-M) % max(1, int(os.environ.get("QTPU_M_ALIGN", "8")))
    if pad_m:
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
    Mp = M + pad_m
    bm, bn = _choose_blocks(Mp, K, N)
    if Mp % bm or N % bn:
        raise NotImplementedError("shapes do not tile")

    grid = (Mp // bm, N // bn)
    in_specs = [
        pl.BlockSpec((bm, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (K // (8 // bits) if bits in (2, 4) else K, bn),
            lambda i, j: (0, j),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (K // group, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM
        ),
    ]
    args = [x2, data, scales]
    has_zeros = zeros is not None
    if has_zeros:
        in_specs.append(
            pl.BlockSpec(
                (K // group, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM
            )
        )
        args.append(zeros)

    def kernel(*refs):
        if has_zeros:
            x_ref, d_ref, s_ref, z_ref, o_ref = refs
        else:
            x_ref, d_ref, s_ref, o_ref = refs
            z_ref = None
        _dq_matmul_kernel(
            x_ref, d_ref, s_ref, z_ref, o_ref, bits=bits, group=group, K=K
        )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=Mp * K * 2 + K * N * bits // 8 + Mp * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    if pad_m:
        out = out[:M]
    return out.reshape(orig_shape[:-1] + (N,))
