"""GPTQ — Hessian-informed quantization (reference C10).

Two modes:

1. ``error_compensation=False`` — reference-parity. The reference builds a
   proxy Hessian from normalized mean-abs stat vectors
   (gptq_quantizer.py:133-144), optionally permutes columns by diag(H)
   (actorder, :153-157), then quantizes each column with a per-column
   symmetric scalar scale and *skips* the error-compensation update
   (:191-194). Without compensation the column order is irrelevant to the
   result, so the whole thing collapses to one vectorized per-column
   symmetric quantization — what the reference does in O(C) Python steps is
   a single fused XLA op here.

2. ``error_compensation=True`` — the real GPTQ algorithm the reference
   skips: damped Hessian, Cholesky-based inverse, per-group asymmetric
   scales frozen at group entry, sequential per-column quantization with
   the remaining-column update  W[:, j+1:] -= err · Hinv[j, j+1:]/Hinv[j,j],
   processed in column blocks (in-block updates inside a `lax.fori_loop`,
   one rank-block matmul per block for the trailing columns — MXU-friendly).

Weights are in reference orientation [out_features, in_features]; Hessians
are [in, in].

Packed-export support matrix (enforced by check_packed_export, the single
gate every export path goes through — quant.apply.pack_model calls it per
site):

  | knob              | supported for packed export (`return_ints`)       |
  |-------------------|---------------------------------------------------|
  | w_bit             | 4 (int4 group-halves packing) or 8 (int8)          |
  | q_group_size      | > 0, divides K; per-(row, group) scales/zeros      |
  | blocksize         | any ≥ 1; compensation blocks are ALIGNED UP to the |
  |                   | scale group (effective block = q_group_size) so    |
  |                   | each exported group's scale freezes at group entry |
  | error_compensation| must be True (parity mode has no integer codes)    |
  | actorder          | yes — perm stored per site, activations gathered   |
  |                   | into Hessian-diagonal order at serve time (g_idx)  |
  | actorder_shards   | ≥ 1; shard-LOCAL perms require K % shards == 0     |
  |                   | (otherwise error: a global perm would make the     |
  |                   | serve-time gather cross tensor-parallel shards)    |

The layer-level API (gptq_quantize_layer) additionally rejects
return_ints+actorder — it has nowhere to store the perm; pack_model owns
perm storage and is the actorder export path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def check_packed_export(
    w_bit: int,
    q_group_size: int,
    blocksize: int,
    actorder: bool,
    actorder_shards: int,
    K: int,
    error_compensation: bool = True,
) -> int:
    """Validate a GPTQ packed-export config against the support matrix
    (module docstring). Returns the effective compensation blocksize.
    Raises ValueError with the violated rule otherwise."""
    if w_bit not in (4, 8):
        raise ValueError(
            f"gptq packed export supports w_bit in (4, 8), got {w_bit}"
        )
    if q_group_size <= 0:
        raise ValueError("gptq packed export requires q_group_size > 0")
    if K % q_group_size:
        raise ValueError(
            f"q_group_size {q_group_size} does not divide K={K}"
        )
    if not error_compensation:
        raise ValueError(
            "packed export requires error_compensation=True (parity mode "
            "produces no integer codes)"
        )
    if actorder_shards < 1:
        raise ValueError("actorder_shards must be >= 1")
    if actorder and actorder_shards > 1 and K % actorder_shards:
        raise ValueError(
            f"actorder_shards={actorder_shards} does not divide K={K} — a "
            "global perm would cross tensor-parallel shard boundaries at "
            "serve time; pick a shard count dividing every site's K"
        )
    # compensation blocks align UP to the scale group so each exported
    # group's scale freezes at group entry (gptq_column_sweep B == g)
    return max(int(blocksize), q_group_size)


def build_proxy_hessian(
    stat_vectors: jnp.ndarray, perp_damp: float = 0.01
) -> jnp.ndarray:
    """Reference-parity Hessian from stacked mean-abs stat vectors [S, C]:
    H = (Σ_s v̂_s v̂_sᵀ)/S + damp·I with v̂ = v/(‖v‖+1e−5)
    (gptq_quantizer.py:137-150)."""
    v = stat_vectors.astype(jnp.float32)
    norms = jnp.linalg.norm(v, axis=1, keepdims=True) + 1e-5
    vn = v / norms
    H = vn.T @ vn
    S = stat_vectors.shape[0]
    C = H.shape[0]
    return H / S + perp_damp * jnp.eye(C, dtype=jnp.float32)


def accumulate_hessian(carry_H, x: jnp.ndarray) -> jnp.ndarray:
    """True-Hessian accumulation step: H += XᵀX over a batch of activations
    x [tokens, C]. Designed to sit inside a jitted scan over calibration
    batches; under data parallelism the final H is psum'd over the `data`
    mesh axis (SURVEY §5.8)."""
    xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    return carry_H + xf.T @ xf


@partial(jax.jit, static_argnames=("n_bit",))
def _parity_column_quantize(W: jnp.ndarray, n_bit: int) -> jnp.ndarray:
    """Per-column symmetric scalar-scale quantization — exactly what the
    reference's skip-compensation loop computes (gptq_quantizer.py:177-197),
    vectorized over all columns."""
    Wf = W.astype(jnp.float32)
    max_int = 2**n_bit - 1
    scale = jnp.clip(jnp.max(jnp.abs(Wf), axis=0, keepdims=True) / max_int, 1e-5, None)
    q = jnp.clip(jnp.round(Wf / scale), -max_int - 1, max_int)
    return q * scale


def _group_params(Wblk: jnp.ndarray, n_bit: int):
    """Asymmetric per-row scales/zeros over a column block (frozen at group
    entry, standard GPTQ grouping)."""
    max_int = 2**n_bit - 1
    mx = jnp.max(Wblk, axis=1, keepdims=True)
    mn = jnp.min(Wblk, axis=1, keepdims=True)
    scales = jnp.clip(mx - mn, 1e-5, None) / max_int
    zeros = jnp.clip(-jnp.round(mn / scales), 0, max_int)
    return scales, zeros


def gptq_quantize_layer(
    W: jnp.ndarray,
    H: jnp.ndarray,
    n_bit: int,
    q_group_size: int = 128,
    perp_damp: float = 0.01,
    blocksize: int = 128,
    actorder: bool = False,
    error_compensation: bool = True,
    return_ints: bool = False,
    stat_vectors: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """GPTQ-quantize one [out, in] weight with Hessian H [in, in].

    return_ints=True (full mode, actorder off) additionally returns the
    integer codes and per-(row, group) scales/zeros for packed export:
    (Wq, q [out, in] ∈ [0, 2^b), scales [out, in/g], zeros [out, in/g]).

    When the Hessian is the reference's proxy built from S stat vectors,
    pass ``stat_vectors`` [S, C] (H may be None): with S < C the factor
    comes from the O(C·S²) low-rank prepare instead of the O(C³) dense one.
    """
    orig_dtype = W.dtype
    Wf = W.astype(jnp.float32)
    C = Wf.shape[1]

    if not error_compensation:
        # Parity mode: actorder permutation + per-column quant + inverse
        # permutation — but the per-column quant is order-independent, so
        # the permutation cancels exactly. One vectorized op.
        if return_ints:
            raise NotImplementedError("return_ints needs error_compensation")
        return _parity_column_quantize(Wf, n_bit).astype(orig_dtype)
    if return_ints and actorder:
        raise NotImplementedError(
            "packed export with actorder would scatter groups (g_idx); off"
        )

    if stat_vectors is not None and stat_vectors.shape[0] < C:
        # low-rank proxy path: never forms H
        if actorder:
            perm = jnp.argsort(-proxy_hessian_diag(stat_vectors, perp_damp))
            inv_perm = jnp.argsort(perm)
            U = gptq_prepare_factor_lowrank(stat_vectors[:, perm], perp_damp)
            return gptq_column_sweep(
                Wf[:, perm], U, n_bit, q_group_size, blocksize,
                return_ints, orig_dtype, inv_perm,
            )
        U = gptq_prepare_factor_lowrank(stat_vectors, perp_damp)
        return gptq_column_sweep(
            Wf, U, n_bit, q_group_size, blocksize, return_ints, orig_dtype
        )

    if H is None:
        H = build_proxy_hessian(stat_vectors, perp_damp)
    U = gptq_prepare_factor(H, perp_damp)
    return _finish_layer(
        Wf,
        U,
        H,
        n_bit,
        q_group_size,
        blocksize,
        actorder,
        return_ints,
        orig_dtype,
        perp_damp,
    )


def gptq_prepare_factor(H: jnp.ndarray, perp_damp: float = 0.01) -> jnp.ndarray:
    """Damped-Hessian → upper Cholesky factor U of H⁻¹ (Hinv = UᵀU).

    Computed WITHOUT forming H⁻¹: reverse-order Cholesky H = PPᵀ (P upper,
    via chol of the index-flipped matrix) then U = P⁻¹ by one triangular
    solve — the same unique factor as chol_upper(H⁻¹) at ~2.5× fewer flops
    than chol → cho_solve → chol, and with no data-dependent branch, so it
    vmaps over a stacked layer axis (TPU linalg is the dominant GPTQ cost;
    the reference's inv→pinv fallback, gptq_quantizer.py:161-165, becomes a
    stronger-damping retry + identity last resort, both branch-free)."""
    C = H.shape[0]
    H = H.astype(jnp.float32)
    mean_diag = jnp.mean(jnp.diag(H))
    eye = jnp.eye(C, dtype=jnp.float32)
    damp = perp_damp * mean_diag

    def rev_chol_upper(A):
        # P upper with P Pᵀ = A:  chol(J A J) flipped back
        Lr = jnp.linalg.cholesky(A[::-1, ::-1])
        return Lr[::-1, ::-1]

    P = rev_chol_upper(H + (damp + 1e-8) * eye)
    # branch-free fallback: H is PSD (Σxxᵀ), so strong damping always
    # factors; select per-layer where the light damping failed numerically
    P_safe = rev_chol_upper(H + (mean_diag + 1.0) * eye)
    P = jnp.where(jnp.any(jnp.isnan(P)), P_safe, P)
    U = jax.scipy.linalg.solve_triangular(P, eye, lower=False)
    return jnp.where(jnp.isnan(U), eye, U)


def gptq_prepare_factor_lowrank(
    stat_vectors: jnp.ndarray, perp_damp: float = 0.01
) -> jnp.ndarray:
    """U (upper, Hinv = UᵀU) for the PROXY Hessian built from stat vectors
    [S, C] — the same factor ``gptq_prepare_factor(build_proxy_hessian(v))``
    produces, computed WITHOUT forming H or any C×C factorization.

    The proxy Hessian is diagonal-plus-rank-S:  H = GᵀG + λI  with
    G = v̂/√S (build_proxy_hessian math, gptq_quantizer.py:137-150), so by
    Woodbury  H⁻¹ = αI + GᵀΣ₀G  (α = 1/λ, Σ₀ = −(λI_S + GGᵀ)⁻¹/λ) is also
    diagonal-plus-rank-S. Its lower Cholesky LDLᵀ then has the product form
    L[i,j] = G[:,i]ᵀb_j (Gill–Golub–Murray–Saunders rank-k update): a scan
    over the C columns carrying only an S×S capacitance matrix —
    O(C·S²) sequential work instead of O(C³) — plus ONE [C,S]×[S,C] MXU
    matmul to materialize L. U = (L·√d)ᵀ. Measured on TPU v5e at C=5632,
    S=128: 8 ms vs 28 ms for the dense cholesky+triangular-solve (3.4×),
    and it never materializes H. Conditioning is benign by construction:
    rows of v̂ are unit-norm so cond(H) ≤ 1 + 1/λ (~100 at the default
    damp), and the recurrence is numerically safe in f32."""
    v = stat_vectors.astype(jnp.float32)  # [S, C]
    S, C = v.shape
    norms = jnp.linalg.norm(v, axis=1, keepdims=True) + 1e-5
    G = v / (norms * jnp.sqrt(jnp.float32(S)))  # H₀ = GᵀG + perp_damp·I
    # effective damping — exactly what prepare(build_proxy_hessian(v)) uses:
    # λ = perp_damp (from build) + perp_damp·mean_diag(H₀) (from prepare) + 1e-8
    mean_diag = jnp.sum(G * G) / C + perp_damp
    lam = perp_damp + perp_damp * mean_diag + 1e-8
    alpha = 1.0 / lam
    Msmall = jnp.linalg.inv(lam * jnp.eye(S, dtype=jnp.float32) + G @ G.T)
    Sigma0 = -Msmall / lam

    def step(Sigma, w):  # w = G[:, j]  (one column of the rank basis)
        c = Sigma @ w
        d = alpha + w @ c
        b = c / d
        return Sigma - jnp.outer(c, b), (b, d)

    _, (B, d) = jax.lax.scan(step, Sigma0, G.T)  # B [C, S], d [C]
    # L = I + strict_lower(GᵀBᵀ);  chol_lower(H⁻¹) = L·diag(√d);  U = cholᵀ
    M_full = G.T @ B.T  # [C, C] — the only C² materialization
    d = jnp.maximum(d, 1e-30)
    U = jnp.sqrt(d)[:, None] * (
        jnp.eye(C, dtype=jnp.float32) + jnp.triu(M_full.T, k=1)
    )
    eye = jnp.eye(C, dtype=jnp.float32)
    return jnp.where(jnp.any(jnp.isnan(U)), eye, U)


def proxy_hessian_diag(stat_vectors: jnp.ndarray, perp_damp: float = 0.01):
    """diag(build_proxy_hessian(v)) without forming H — for actorder
    permutations on the low-rank path (gptq_quantizer.py:153-157)."""
    v = stat_vectors.astype(jnp.float32)
    norms = jnp.linalg.norm(v, axis=1, keepdims=True) + 1e-5
    vn = v / norms
    return jnp.sum(vn * vn, axis=0) / v.shape[0] + perp_damp


def _finish_layer(
    Wf, U, H, n_bit, q_group_size, blocksize, actorder, return_ints, orig_dtype, perp_damp
):
    C = Wf.shape[1]
    if actorder:
        # order columns by Hessian diagonal (gptq_quantizer.py:153-157);
        # the factor must be recomputed for the permuted Hessian
        perm = jnp.argsort(-jnp.diag(H.astype(jnp.float32)))
        inv_perm = jnp.argsort(perm)
        Wf = Wf[:, perm]
        U = gptq_prepare_factor(H[perm][:, perm], perp_damp)
    else:
        inv_perm = None

    return gptq_column_sweep(
        Wf, U, n_bit, q_group_size, blocksize, return_ints, orig_dtype, inv_perm
    )


def gptq_column_sweep(
    Wf,
    U,
    n_bit,
    q_group_size,
    blocksize,
    return_ints=False,
    orig_dtype=jnp.float32,
    inv_perm=None,
):
    """The sequential error-compensated quantization sweep given a
    precomputed factor U. Pure of lax.cond, so it vmaps cleanly over a
    stacked layer axis (the per-column loop then advances all layers in
    lockstep — Lx fewer sequential device steps than mapping layers)."""
    C = Wf.shape[1]
    g = q_group_size if q_group_size > 0 else C
    B = min(blocksize, g)  # align compensation blocks to scale groups
    if C % B != 0:
        B = g if C % g == 0 else C
    if return_ints and B != g:
        raise NotImplementedError(
            f"packed export needs block == group ({B} != {g}); set blocksize >= q_group_size"
        )
    n_blocks = C // B
    max_int = 2**n_bit - 1

    def quantize_block(Wblk, Ublk, scales, zeros):
        """Sequential per-column quantize+compensate inside one block.
        Wblk [out, B]; Ublk = U[block, block] (upper-tri, [B, B]). Returns
        (quantize-dequantized block, per-column scaled errors Err [out, B])
        where Err[:, j] = (w_j − ŵ_j)/U_jj at quantization time — the exact
        vector the cross-block update needs."""
        col_idx = jnp.arange(B)

        def body(j, carry):
            Wb, Err, Q = carry
            wj = jax.lax.dynamic_slice_in_dim(Wb, j, 1, axis=1)  # [out,1]
            qj = jnp.clip(jnp.round(wj / scales) + zeros, 0, max_int)
            dqj = (qj - zeros) * scales
            d = jax.lax.dynamic_slice(Ublk, (j, j), (1, 1))[0, 0]
            err = (wj - dqj) / d  # [out,1]
            urow = jax.lax.dynamic_slice_in_dim(Ublk, j, 1, axis=0)  # [1,B]
            mask = (col_idx > j).astype(jnp.float32)[None, :]
            Wb = Wb - err @ (urow * mask)
            Wb = jax.lax.dynamic_update_slice_in_dim(Wb, dqj, j, axis=1)
            Err = jax.lax.dynamic_update_slice_in_dim(Err, err, j, axis=1)
            Q = jax.lax.dynamic_update_slice_in_dim(Q, qj, j, axis=1)
            return Wb, Err, Q

        return jax.lax.fori_loop(
            0, B, body, (Wblk, jnp.zeros_like(Wblk), jnp.zeros_like(Wblk))
        )

    W_work = Wf
    out_cols = []
    q_cols = []
    s_cols = []
    z_cols = []
    for b in range(n_blocks):
        lo = b * B
        Wblk = W_work[:, lo : lo + B]
        # scales frozen at group entry from the *current* (compensated) block
        scales, zeros = _group_params(Wblk, n_bit)
        Ublk = U[lo : lo + B, lo : lo + B]
        Wq_blk, Err, Q_blk = quantize_block(Wblk, Ublk, scales, zeros)
        out_cols.append(Wq_blk)
        q_cols.append(Q_blk)
        s_cols.append(scales)
        z_cols.append(zeros)
        if lo + B < C:
            # rank-B cross-block update for all trailing columns (one matmul)
            W_tail = W_work[:, lo + B :] - Err @ U[lo : lo + B, lo + B :]
            W_work = jnp.concatenate([W_work[:, : lo + B], W_tail], axis=1)
    Wq = jnp.concatenate(out_cols, axis=1)

    if inv_perm is not None:
        Wq = Wq[:, inv_perm]
    if not return_ints:
        return Wq.astype(orig_dtype)
    # B == g here when exporting (blocks aligned to scale groups)
    q = jnp.concatenate(q_cols, axis=1)
    s_all = jnp.concatenate(s_cols, axis=1)  # [out, n_blocks]
    z_all = jnp.concatenate(z_cols, axis=1)
    return Wq.astype(orig_dtype), q, s_all, z_all
