"""Model-level quantization: params pytree → quantized params pytree.

The reference mutates torch modules in place, looping over named_modules
(e.g. awq_quantizer.py:50-84). Here "quantize the model" is a pure
transformation over the stacked-layer param pytree: per linear site, a
`vmap` (or memory-bounded `lax.map`) over the layer axis applies the
per-tensor quantizer. Weights live as [L, K_in, N_out]; quantizers operate
in reference orientation [out, in], so sites are transposed in and out.

Fake-quantized output (default) reproduces the reference's evaluation
semantics exactly; `pack_model` converts RTN-compatible schemes
(rtn/awq/smoothquant) to really-packed int4/int8 params for the serving
path, folding AWQ's protection scales and SmoothQuant's smoothing vector
into per-site input "smooth" multipliers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as _np

from qtpu.calib.stats import CalibStats
from qtpu.core.packing import quantize_pack
from qtpu.models import get_arch
from qtpu.quant.parity_grids import PARITY_GRIDS, PARITY_RANGE
from qtpu.quant.apot import apot_quantize_codes, apot_quantize_tensor
from qtpu.quant.awq import _protection_scale_vec, awq_quantize, awq_search_scale_factor
from qtpu.quant.gptq import (
    _parity_column_quantize,
    build_proxy_hessian,
    gptq_quantize_layer,
)
from qtpu.quant.pot import (
    pot_codebook as _pot_codebook,
    pot_quantize_codes,
    pot_quantize_tensor,
)
from qtpu.quant.rtn import pseudo_quantize
from qtpu.quant.smoothquant import compute_smoothing_scales, search_alpha, smooth_weights

def _input_site_of(linear_site: str, arch) -> str:
    for in_site, linears in arch.SITE_OF_INPUT.items():
        if linear_site in linears:
            return in_site
    raise KeyError(linear_site)


def _grid(mcfg: dict, default_step: float) -> tuple:
    lo, hi = mcfg.get("grid_search_range", [0.01, 2.01])
    step = mcfg.get("grid_step", default_step)
    return (float(lo), float(hi), float(step))


def _parity_grid(
    mcfg: dict, default_step: float, n_elements: int | None = None
) -> tuple:
    """Exact reference candidate multipliers for the POT/APOT scale search.

    The reference hardcodes torch.arange(0.01, 2.01, step): step 0.01 for
    POT (pot_apot_quantizer.py:75) and, for APOT, a size-coarsened step —
    0.1 when the weight has >500k elements, else 0.05
    (pot_apot_quantizer.py:258-261). Parity needs the BIT-EXACT values:
    torch.arange rounds differently from np.arange and the 1-ulp grid
    differences measurably move which scale wins the SSE race (0.23 ppl on
    the crosscheck). The three reference grids are frozen bit tables
    (qtpu.quant.parity_grids — no torch dependency, identical in every
    environment). Setting grid_step or reference_grid=false in the method
    config leaves parity mode (the finer grid is the improvement mode; it
    beat the reference by 17 ppl on the W4 crosscheck)."""
    lo, hi = mcfg.get("grid_search_range", [0.01, 2.01])
    step = mcfg.get("grid_step")
    if step is None:
        step = default_step
        if n_elements is not None and bool(mcfg.get("reference_grid", True)):
            step = 0.1 if n_elements > 500_000 else 0.05
    if (float(lo), float(hi)) == PARITY_RANGE and float(step) in PARITY_GRIDS:
        return PARITY_GRIDS[float(step)]
    vals = _np.arange(float(lo), float(hi), float(step)).astype(_np.float32)
    return tuple(float(v) for v in vals)


def _expert_stats_view(stats, E: int, expert_inputs):
    """CalibStats view matching a [L·E]-flattened expert site: per-expert
    input sites ([.., L, E, C]) merge their L,E axes; shared-input sites
    ([.., L, C], one stat vector feeding all E experts of a layer) repeat
    each layer's vector E times. Both produce layer-major (l0e0, l0e1, …)
    order — the same order the weight flatten uses."""
    if stats is None:
        return None

    def fix(d, batch_lead):
        la = 1 if batch_lead else 0
        out = {}
        for s, a in d.items():
            if s == "head_in":
                out[s] = a
            elif s in expert_inputs:
                out[s] = a.reshape(
                    a.shape[:la] + (a.shape[la] * a.shape[la + 1],) + a.shape[la + 2:]
                )
            else:
                out[s] = jnp.repeat(a, E, axis=la)
        return out

    return CalibStats(
        mean_abs=fix(stats.mean_abs, True),
        max_abs=fix(stats.max_abs, False),
        hessian=None if stats.hessian is None else fix(stats.hessian, False),
        n_batches=stats.n_batches,
    )


def _map_sites(params: dict, fn, arch, stats=None):
    """Apply fn(site, w_kn, has_layer_axis, stats) to every linear site's
    dense weight; returns a new params pytree. Norms/embeddings are
    untouched; per-site extras the quantizer doesn't produce (biases) carry
    over. MoE expert sites ([L, E, K, N], arch.EXPERT_SITES) are flattened
    to a [L·E, K, N] layer axis around fn — with a matching stats view —
    and every produced leaf is unflattened back to [L, E, ...]."""
    expert_sites = set(getattr(arch, "EXPERT_SITES", ()))
    expert_inputs = set(getattr(arch, "EXPERT_INPUT_SITES", ()))
    ev = {}

    def rebuild(site, old, has_l):
        if site in expert_sites:
            w = old["w"]
            L, E = w.shape[:2]
            if E not in ev:
                ev[E] = _expert_stats_view(stats, E, expert_inputs)
            out = fn(site, w.reshape((L * E,) + w.shape[2:]), True, ev[E])
            out = {
                k: v.reshape((L, E) + v.shape[1:]) for k, v in out.items()
            }
        else:
            out = fn(site, old["w"], has_l, stats)
        for k in old:
            if k not in out and k != "w":
                out[k] = old[k]
        return out

    new = dict(params)
    new_layers = dict(params["layers"])
    for site in arch.LAYER_SITES:
        if site not in params["layers"]:
            continue  # optional sites (e.g. Qwen2-MoE shared expert)
        new_layers[site] = rebuild(site, params["layers"][site], True)
    new["layers"] = new_layers
    new["lm_head"] = rebuild("lm_head", params["lm_head"], False)
    return new


def quantize_model(
    params: dict,
    method: str,
    mcfg: dict,
    stats: CalibStats | None = None,
    arch: str = "llama",
) -> dict:
    """Fake-quantize every linear site of a model with `method`.

    mcfg is the per-method quantization_config dict (reference schema).
    Returns a new params pytree; for smoothquant the sites also carry the
    per-input-channel "smooth" vector that keeps the network numerically
    equivalent (the reference's forward pre-hook,
    smooth_quant_quantizer.py:178-199).
    """
    arch_mod = get_arch(arch)
    w_bit = int(mcfg["w_bit"])
    g = int(mcfg.get("q_group_size", -1))

    if method == "rtn":

        def fn(site, w, has_l, st):
            q = _vt(pseudo_quantize, w, has_l, n_bit=w_bit, q_group_size=g)
            return {"w": q}

    elif method == "pot":
        gv = _parity_grid(mcfg, 0.01)

        def fn(site, w, has_l, st):
            q = _vt(
                pot_quantize_tensor,
                w,
                has_l,
                per_layer=True,
                n_bit=w_bit,
                q_group_size=g,
                grid_values=gv,
            )
            return {"w": q}

    elif method == "apot":
        k = int(mcfg.get("k", 2))

        def fn(site, w, has_l, st):
            # reference grid coarsens per SITE by element count
            gv = _parity_grid(mcfg, 0.05, w.shape[-2] * w.shape[-1])
            q = _vt(
                apot_quantize_tensor,
                w,
                has_l,
                per_layer=True,
                n_bit=w_bit,
                q_group_size=g,
                k=k,
                grid_values=gv,
            )
            return {"w": q}

    elif method == "awq":
        if stats is None:
            raise ValueError("awq requires calibration stats")
        protect = float(mcfg.get("protect_ratio", 0.01))
        sf = float(mcfg.get("scale_factor", 1.0))
        do_search = bool(mcfg.get("search_scale", False))

        def fn(site, w, has_l, st):
            try:
                imp = st.importance(_input_site_of(site, arch_mod))
            except KeyError:
                # layer not in calibration data → skip, keep fp weights
                # (reference awq_quantizer.py:52-54)
                return {"w": w}

            def one(w_kn, imp_l):
                w_oi = w_kn.T
                sf_l = (
                    awq_search_scale_factor(
                        w_oi, imp_l, w_bit, g, protect
                    )
                    if do_search
                    else sf
                )
                return awq_quantize(w_oi, imp_l, w_bit, g, protect, sf_l).T

            q = jax.vmap(one)(w, imp) if has_l else one(w, imp)
            return {"w": q}

    elif method == "gptq":
        if stats is None:
            raise ValueError("gptq requires calibration stats")
        comp = bool(mcfg.get("error_compensation", False))
        actorder = bool(mcfg.get("actorder", False))
        damp = float(mcfg.get("perp_damp", 0.01))
        blocksize = int(mcfg.get("blocksize", 128))
        nsamples = int(mcfg.get("nsamples", 128))

        def fn(site, w, has_l, st):
            try:
                in_site = _input_site_of(site, arch_mod)
                have = in_site in st.mean_abs or (
                    st.hessian is not None and in_site in st.hessian
                )
            except KeyError:
                have = False
            if not have:
                # missing calibration stats → simple symmetric per-group RTN
                # (reference _simple_quantize_layer, gptq_quantizer.py:60-62)
                from qtpu.quant.rtn import symmetric_fake_quantize

                q = _vt(symmetric_fake_quantize, w, has_l, n_bit=w_bit, q_group_size=g)
                return {"w": q}
            if not comp:
                # parity mode: order-independent per-column symmetric quant
                def one(w_kn):
                    return _parity_column_quantize(w_kn.T, w_bit).T

                q = jax.vmap(one)(w) if has_l else one(w)
                return {"w": q}

            have_true_h = st.hessian is not None and in_site in st.hessian

            if has_l and not actorder:
                # fused prepare+sweep per layer chunk: the [L, C, C]
                # factors (2.8 GB for a 5632² site) must never be fully
                # materialized — chunked lax.map keeps one [chunk, C, C]
                # factor while still vmapping the column sweep within the
                # chunk. Proxy-Hessian sites (tiny [S, C] stat vectors)
                # take the O(C·S²) low-rank prepare — no H, no C³ linalg.
                from qtpu.quant.gptq import (
                    gptq_column_sweep,
                    gptq_prepare_factor,
                    gptq_prepare_factor_lowrank,
                )

                K, N = w.shape[-2], w.shape[-1]
                chunk = max(1, min(8, int(1.5e9 // (K * K * 16 + K * N * 16))))

                def per_layer(args):
                    if have_true_h:
                        w_kn, H = args
                        U = gptq_prepare_factor(H, damp)
                    else:
                        w_kn, v_stats = args  # v_stats [S, C]
                        if v_stats.shape[0] < K:
                            U = gptq_prepare_factor_lowrank(v_stats, damp)
                        else:
                            U = gptq_prepare_factor(
                                build_proxy_hessian(v_stats, damp), damp
                            )
                    return gptq_column_sweep(
                        w_kn.T.astype(jnp.float32),
                        U,
                        w_bit,
                        g,
                        blocksize,
                        orig_dtype=w.dtype,
                    ).T

                if have_true_h:
                    xs = (w, st.hessian[in_site])
                else:
                    mv = st.mean_abs[in_site][:nsamples]  # [S, L, C]
                    xs = (w, jnp.swapaxes(mv, 0, 1))  # [L, S, C]
                q = jax.lax.map(per_layer, xs, batch_size=chunk)
                return {"w": q}

            if have_true_h:

                def one(w_kn, H):
                    return gptq_quantize_layer(
                        w_kn.T,
                        H,
                        w_bit,
                        q_group_size=g,
                        perp_damp=damp,
                        blocksize=blocksize,
                        actorder=actorder,
                        error_compensation=True,
                    ).T

                H_all = st.hessian[in_site]
                if has_l:
                    # lax.map: sequential over layers to bound C×C memory
                    q = jax.lax.map(lambda args: one(*args), (w, H_all))
                else:
                    q = one(w, H_all)
                return {"w": q}

            # proxy-Hessian path: hand the stat vectors straight to the
            # layer quantizer (low-rank prepare when S < C, actorder incl.)
            def one_v(w_kn, v_stats):
                return gptq_quantize_layer(
                    w_kn.T,
                    None,
                    w_bit,
                    q_group_size=g,
                    perp_damp=damp,
                    blocksize=blocksize,
                    actorder=actorder,
                    error_compensation=True,
                    stat_vectors=v_stats,
                ).T

            mv = st.mean_abs[in_site][:nsamples]  # [S, L, C] | [S, C]
            if has_l:
                q = jax.lax.map(
                    lambda args: one_v(*args), (w, jnp.swapaxes(mv, 0, 1))
                )
            else:
                q = one_v(w, mv)
            return {"w": q}

    elif method == "smoothquant":
        if stats is None:
            raise ValueError("smoothquant requires calibration stats")
        alpha = mcfg.get("alpha", 0.5)
        do_search = bool(mcfg.get("search_alpha", False))

        def fn(site, w, has_l, st):
            try:
                amax = st.max_abs[_input_site_of(site, arch_mod)]
            except KeyError:
                # no act scales → RTN without smoothing (the reference
                # still pseudo-quantizes every Linear,
                # smooth_quant_quantizer.py:307-320)
                q = _vt(pseudo_quantize, w, has_l, n_bit=w_bit, q_group_size=g)
                return {"w": q}

            def one(w_kn, amax_l):
                w_oi = w_kn.T
                a = (
                    search_alpha(w_oi, amax_l, w_bit, g)
                    if do_search
                    else alpha
                )
                s = compute_smoothing_scales(amax_l, w_oi, a)
                w_s = smooth_weights(w_oi, s)
                w_q = pseudo_quantize(w_s, n_bit=w_bit, q_group_size=g)
                return w_q.T, s

            if has_l:
                q, s = jax.vmap(one)(w, amax)
            else:
                q, s = one(w, amax)
            return {"w": q, "smooth": s}

    else:
        raise ValueError(f"unknown quantization method '{method}'")

    return _map_sites(params, fn, arch_mod, stats)


def _vt(tensor_fn, w, has_l, per_layer=False, **kw):
    """Apply an [out,in]-oriented tensor quantizer to [.., K, N] weights,
    vmapping over the layer axis when present. per_layer=True dispatches
    one device program per layer instead of vmapping — required for the
    POT/APOT candidate-scan quantizers, whose programs crash the v5e TPU
    worker when an outer vmap/scan multiplies their size (see
    quant.pot._SCAN_CHUNK_ELEMS)."""

    def one(w_kn):
        return tensor_fn(w_kn.T, **kw).T

    if not has_l:
        return one(w)
    if per_layer:
        return jnp.stack([one(w[l]) for l in range(w.shape[0])])
    return jax.vmap(one)(w)


def pack_model(
    params: dict,
    method: str,
    mcfg: dict,
    stats: CalibStats | None = None,
    arch: str = "llama",
):
    """Really-pack a model's linear sites for serving.

    Supported: rtn (plain RTN), awq (protection scales folded into input
    smooth + packed RTN of scaled weight), smoothquant (smooth vector +
    packed RTN of smoothed weight). Returns (packed_params, qmeta) where
    qmeta is the hashable tuple the model forward takes.
    """
    arch_mod = get_arch(arch)
    w_bit = int(mcfg["w_bit"])
    g = int(mcfg.get("q_group_size", 128))
    if g <= 0:
        raise ValueError("packing requires a positive q_group_size")
    metas = {}

    # shared weight-column max per multi-linear input group (smoothquant
    # serving pack; see the smoothquant branch below). Expert sites keep
    # per-site vectors (their stats views differ per expert).
    group_colmax = {}
    if method == "smoothquant":
        expert = set(getattr(arch_mod, "EXPERT_SITES", ()))
        dense = set(getattr(arch_mod, "PACK_DENSE_SITES", ()))
        for _in, _linears in arch_mod.SITE_OF_INPUT.items():
            members = [
                n
                for n in _linears
                if n != "lm_head"
                and n in params["layers"]
                and n not in expert
                and n not in dense
            ]
            if len(members) < 2:
                continue
            cm = jnp.max(
                jnp.stack(
                    [
                        jnp.max(jnp.abs(params["layers"][n]["w"]), axis=-1)
                        for n in members
                    ]
                ),
                axis=0,
            )  # [L, K]
            for n in members:
                group_colmax[n] = cm

    def pack_one(w_kn, smooth_k=None):
        # smooth_k: multiply input by smooth_k; weight pre-divided.
        qt = quantize_pack(w_kn, w_bit, g, symmetric=False)
        p = {"data": qt.data, "scales": qt.scales, "zeros": qt.zeros}
        if smooth_k is not None:
            p["smooth"] = smooth_k
        return p, (w_bit, g, w_kn.shape[-2], w_kn.shape[-1])

    def fn(site, w, has_l, st):
        if site in getattr(arch_mod, "PACK_DENSE_SITES", ()):
            # e.g. the MoE router: [D, E] with E ~ 8 is too narrow for the
            # MXU-tiled packed kernels and negligible in size — keep dense
            return {"w": w}
        if method == "rtn":
            smooth = None
            w_eff = w
        elif method == "awq":
            protect = float(mcfg.get("protect_ratio", 0.01))
            sf = float(mcfg.get("scale_factor", 1.0))
            imp = st.importance(_input_site_of(site, arch_mod))

            def vec(imp_l):
                return _protection_scale_vec(imp_l, protect, sf)

            v = jax.vmap(vec)(imp) if has_l else vec(imp)
            # y = (x·(1/v)) @ Q(v∘W): fold protection into input smooth
            w_eff = w * (v[..., :, None] if has_l else v[:, None])
            smooth = 1.0 / v
        elif method == "smoothquant":
            alpha = mcfg.get("alpha", 0.5)
            amax = st.max_abs[_input_site_of(site, arch_mod)]
            # For sites sharing one input (q/k/v, gate/up) the serving pack
            # computes ONE smoothing vector from the GROUP's weight-column
            # max (the original SmoothQuant formulation, which smooths the
            # input tensor once) instead of the reference's per-Linear
            # vector (smooth_quant_quantizer.py:156-166, which the
            # fake-quant path keeps for parity). Identical vectors across
            # the group make the smooth foldable into the preceding norm
            # (fold_smooth) and the packed sites fusable into one wide
            # matmul (fuse_packed_sites).
            gm = group_colmax.get(site)

            def sm(w_kn, amax_l, wmax_l):
                a = jnp.clip(amax_l.astype(jnp.float32), 1e-5, None)
                wm = jnp.clip(wmax_l.astype(jnp.float32), 1e-5, None)
                s = jnp.clip(
                    jnp.power(a, alpha) / jnp.power(wm, 1.0 - alpha), 1e-5, None
                )
                return smooth_weights(w_kn.T, s).T, s

            wmax = gm if gm is not None else jnp.max(jnp.abs(w), axis=-1)
            if has_l:
                w_eff, smooth = jax.vmap(sm)(w, amax, wmax)
            else:
                w_eff, smooth = sm(w, amax, wmax)

            if mcfg.get("act_quant", False):
                # true W8A8: per-CHANNEL int8 weights (one group spanning
                # K) + dynamic per-token int8 activations at serve time —
                # beyond the reference, whose SmoothQuant never quantizes
                # activations (smooth_quant_quantizer.py:307-323)
                if w_bit != 8:
                    raise ValueError("act_quant requires w_bit=8")
                K = w.shape[-2]

                def pack_pc(w_kn, smooth_k):
                    qt = quantize_pack(w_kn, 8, K, symmetric=False)
                    return {
                        "data": qt.data,
                        "scales": qt.scales,
                        "zeros": qt.zeros,
                        "smooth": smooth_k,
                    }

                if has_l:
                    p = jax.vmap(pack_pc)(w_eff, smooth)
                else:
                    p = pack_pc(w_eff, smooth)
                metas[site] = (8, K, K, w.shape[-1], "a8")
                return p
        elif method in ("pot", "apot"):
            if w_bit != 4:
                raise ValueError("codebook packing supports w_bit=4 only")
            gv = _parity_grid(
                mcfg,
                0.01 if method == "pot" else 0.05,
                None if method == "pot" else w.shape[-2] * w.shape[-1],
            )

            def cb_one(w_kn):
                if method == "pot":
                    codes, sc = pot_quantize_codes(
                        w_kn, w_bit, g, grid_values=gv
                    )
                    cb = _pot_codebook(w_bit)
                else:
                    codes, sc, cb = apot_quantize_codes(
                        w_kn, w_bit, g, int(mcfg.get("k", 2)), grid_values=gv
                    )
                from qtpu.core.packing import pack_int4

                return {
                    "data": pack_int4(codes, g),
                    "scales": sc.astype(jnp.bfloat16),
                    "codebook": cb,
                }

            if has_l:
                # one DEVICE PROGRAM PER LAYER, not vmap/lax.map: wrapping
                # the ~200-candidate scale-search scan in any outer
                # vmap/scan crashes the v5e TPU worker ("kernel fault") at
                # the fused-gateup site (22×2048×11264 — reproduced r5
                # even at lax.map batch_size=1), while the bare per-layer
                # program runs fine. pot/apot_quantize_codes are jitted,
                # so 22 same-shape calls compile once and redispatch.
                outs = [cb_one(w[l]) for l in range(w.shape[0])]
                p = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs), *outs
                )
            else:
                p = cb_one(w)
            metas[site] = (w_bit, g, w.shape[-2], w.shape[-1])
            return p
        elif method == "gptq":
            # full error-compensated GPTQ with integer export; with
            # actorder the column permutation is stored per layer and
            # applied to the activations at serve time (g_idx-style)
            if stats is None:
                raise ValueError("gptq packing requires calibration stats")
            in_site = _input_site_of(site, arch_mod)
            damp = float(mcfg.get("perp_damp", 0.01))
            nsamples = int(mcfg.get("nsamples", 128))
            actorder = bool(mcfg.get("actorder", False))
            have_true_h = st.hessian is not None and in_site in st.hessian
            if have_true_h:
                H_all = st.hessian[in_site]
            elif has_l:
                # keep proxy Hessians unmaterialized: stacked stat vectors
                # [L, S, C] are tiny; H builds inside the chunked map below
                mv = st.mean_abs[in_site][:nsamples]
                H_all = jnp.swapaxes(mv, 0, 1)
            else:
                # [S, C] stat vectors go straight to prep() (low-rank path)
                H_all = st.mean_abs[in_site][:nsamples]

            from qtpu.core.packing import pack_int4
            from qtpu.quant.gptq import (
                check_packed_export,
                gptq_column_sweep,
                gptq_prepare_factor,
                gptq_prepare_factor_lowrank,
                proxy_hessian_diag,
            )

            # the single support-matrix gate (qtpu.quant.gptq docstring)
            bs = check_packed_export(
                w_bit,
                g,
                int(mcfg.get("blocksize", 128)),
                actorder,
                int(mcfg.get("actorder_shards", 1)),
                w.shape[-2],
            )

            def gptq_one(w_kn, U, perm=None):
                w_oi = w_kn.T.astype(jnp.float32)
                if perm is not None:
                    w_oi = w_oi[:, perm]
                _, q, s_all, z_all = gptq_column_sweep(
                    w_oi,
                    U,
                    w_bit,
                    g,
                    bs,
                    return_ints=True,
                    orig_dtype=w.dtype,
                )
                # [out, in] codes → qtpu layout [K=in, N=out]
                codes = q.T.astype(jnp.uint8)
                scales = s_all.T.astype(jnp.bfloat16)  # [K/g, N]
                zeros = z_all.T.astype(jnp.uint8)
                if w_bit == 4:
                    data = pack_int4(codes, g)
                elif w_bit == 8:
                    data = (codes.astype(jnp.int32) - 128).astype(jnp.int8)
                else:
                    raise ValueError("gptq packing supports w_bit in (4, 8)")
                out = {"data": data, "scales": scales, "zeros": zeros}
                if perm is not None:
                    out["perm"] = perm
                return out

            def prep(h_or_v, perm=None):
                """Factor U from either a true Hessian or [S, C] stat
                vectors (low-rank prepare when S < C), with optional
                actorder column permutation."""
                if have_true_h or h_or_v.shape[0] >= h_or_v.shape[1]:
                    h = h_or_v if have_true_h else build_proxy_hessian(h_or_v, damp)
                    if perm is not None:
                        h = h[perm][:, perm]
                    return gptq_prepare_factor(h, damp)
                if perm is not None:
                    h_or_v = h_or_v[:, perm]
                return gptq_prepare_factor_lowrank(h_or_v, damp)

            # actorder_shards > 1: SHARD-LOCAL permutation — columns are
            # reordered only within contiguous K/shards blocks, matching a
            # tensor-parallel row split of the input axis. The serve-time
            # activation gather then never crosses shard boundaries, so
            # actorder costs no all-gather over ICI (ops.linear's "perm"
            # note); the ordering win is restricted to within-shard, the
            # standard trade (g_idx-per-shard in GPU TP servers).
            actorder_shards = int(mcfg.get("actorder_shards", 1))

            def order(h_or_v):
                d = (
                    jnp.diag(h_or_v.astype(jnp.float32))
                    if have_true_h
                    else proxy_hessian_diag(h_or_v, damp)
                )
                Kc = d.shape[0]
                s_ = actorder_shards
                if s_ > 1:
                    # K % shards validated by check_packed_export above —
                    # never silently fall back to a boundary-crossing
                    # global perm
                    blk = Kc // s_
                    return jnp.concatenate(
                        [
                            jnp.argsort(-d[i * blk : (i + 1) * blk]) + i * blk
                            for i in range(s_)
                        ]
                    )
                return jnp.argsort(-d)

            if has_l:
                K = w.shape[-2]
                chunk = max(
                    1,
                    min(8, int(1.5e9 // (K * K * 16 + K * w.shape[-1] * 16))),
                )
                def pack_layer(args):
                    w_kn, h = args
                    if actorder:
                        perm = order(h)
                        return gptq_one(w_kn, prep(h, perm), perm)
                    return gptq_one(w_kn, prep(h))

                p = jax.lax.map(pack_layer, (w, H_all), batch_size=chunk)
            else:
                if actorder:
                    perm = order(H_all)
                    p = gptq_one(w, prep(H_all, perm), perm)
                else:
                    p = gptq_one(w, prep(H_all))
            metas[site] = (w_bit, g, w.shape[-2], w.shape[-1])
            return p
        else:
            raise ValueError(f"pack_model does not support method '{method}'")

        if has_l:
            p, meta = jax.vmap(
                lambda wl: pack_one(wl)[0]
            )(w_eff), (w_bit, g, w.shape[-2], w.shape[-1])
            if smooth is not None:
                p["smooth"] = smooth
        else:
            p, meta = pack_one(w_eff, smooth)
        metas[site] = meta
        return p

    packed = _map_sites(params, fn, arch_mod, stats)
    qmeta = tuple(sorted(metas.items()))
    return packed, qmeta


def fold_smooth(packed: dict, qmeta, arch: str = "llama"):
    """Fold per-site input "smooth" vectors into adjacent parameters so
    decode pays no extra elementwise pass per site.

    Llama-family folds (all exact in f32; bf16 re-rounding of the folded
    parameter is the same order as the runtime bf16 multiply it replaces):
      * q/k/v smooth (identical across the group, see pack_model)
        → attn_norm weight: rms_norm(x)·w·s == rms_norm(x)·(w∘s)
      * gate/up smooth → mlp_norm weight
      * lm_head smooth → final_norm weight
      * down_proj smooth s (input = silu(gate)∘up) → up_proj OUTPUT
        columns: silu(g)∘(up·s) == (silu(g)∘up)·s — for packed sites the
        per-group dequant `scales` columns absorb s exactly
      * o_proj smooth is NOT folded: its input is attention output, whose
        columns mix V columns per q-head — under GQA the per-q-head
        vector cannot be pushed onto the shared KV head's V columns.
    Other arches (GPT-2 GELU boundary, OPT) keep runtime smooth vectors.
    Returns (packed, qmeta) (qmeta is unchanged; returned for symmetry).
    """
    if arch != "llama":
        return packed, qmeta
    layers = dict(packed["layers"])
    out = dict(packed)

    def _identical(names):
        # equality check runs on device; only ONE boolean scalar is read
        # back per group (pack time is eager, so a host decision is
        # unavoidable — but shipping whole vectors through the slow
        # host link is not)
        vs = [layers.get(n, {}).get("smooth") for n in names if n in layers]
        if not vs or any(v is None for v in vs):
            return None
        # shape mismatch = not identical (device compare would broadcast
        # or raise; np.array_equal semantics short-circuit on shape)
        if any(v.shape != vs[0].shape for v in vs[1:]):
            return None
        if len(vs) == 1 or bool(
            jnp.all(jnp.stack([jnp.all(v == vs[0]) for v in vs[1:]]))
        ):
            return vs[0]
        return None

    def _strip(names):
        for n in names:
            if n in layers and "smooth" in layers[n]:
                site = dict(layers[n])
                del site["smooth"]
                layers[n] = site

    def _fold_norm(norm_key, s):
        w = layers[norm_key].astype(jnp.float32) * s.astype(jnp.float32)
        layers[norm_key] = w.astype(packed["layers"][norm_key].dtype)

    s = _identical(("q_proj", "k_proj", "v_proj"))
    if s is not None and "attn_norm" in layers:
        _fold_norm("attn_norm", s)
        _strip(("q_proj", "k_proj", "v_proj"))
    s = _identical(("gate_proj", "up_proj"))
    if s is not None and "mlp_norm" in layers:
        _fold_norm("mlp_norm", s)
        _strip(("gate_proj", "up_proj"))

    down = layers.get("down_proj")
    up = layers.get("up_proj")
    if (
        isinstance(down, dict)
        and "smooth" in down
        and isinstance(up, dict)
        and "scales" in up
        and "codebook" not in up
    ):
        s = down["smooth"].astype(jnp.float32)  # [L, F]
        scales = up["scales"].astype(jnp.float32) * s[:, None, :]
        up = dict(up)
        up["scales"] = scales.astype(packed["layers"]["up_proj"]["scales"].dtype)
        layers["up_proj"] = up
        _strip(("down_proj",))

    head = packed.get("lm_head")
    if isinstance(head, dict) and "smooth" in head and "final_norm" in packed:
        fn_w = packed["final_norm"].astype(jnp.float32) * head["smooth"].astype(
            jnp.float32
        )
        out["final_norm"] = fn_w.astype(packed["final_norm"].dtype)
        head = dict(head)
        del head["smooth"]
        out["lm_head"] = head

    out["layers"] = layers
    return out, qmeta


def fuse_packed_sites(packed: dict, qmeta, arch: str = "llama"):
    """Fuse packed sites that share an input into one wider matmul
    (llama: q/k/v → qkv_proj and gate/up → gateup_proj, 7 → 4 kernel
    launches per layer at decode; OPT: q/k/v → qkv_proj), with wider N
    tiles for the fused
    dequant-matmul. Sites with "smooth" input vectors fuse only when the
    vectors are identical across the group (true for AWQ by construction:
    the protection comes from the shared input's importance); codebook
    sites fuse only when their level tables are bit-identical (true for
    POT/APOT, whose codebook depends only on the method config).
    Returns (fused_params, fused_qmeta)."""
    layers = dict(packed["layers"])
    # structural guards (not just the arch arg, which callers forget):
    # llama has o_proj + gate_proj alongside q/k/v; OPT has out_proj
    # (MHA q/k/v fuse, fc1/fc2 are sequential — nothing else to fuse);
    # GPT-2's c_attn is already a single 3D-wide site
    if arch == "llama" and "o_proj" in layers and "gate_proj" in layers:
        fuse_groups = [
            (("q_proj", "k_proj", "v_proj"), "qkv_proj"),
            (("gate_proj", "up_proj"), "gateup_proj"),
        ]
    elif arch == "opt" and "out_proj" in layers and "fc1" in layers:
        fuse_groups = [(("q_proj", "k_proj", "v_proj"), "qkv_proj")]
    else:
        return packed, qmeta
    meta = dict(qmeta)

    def _shared_key_equal(parts, key):
        """Keys applied to the shared INPUT (smooth, perm) may only fuse
        when identical across the group — then one copy is kept. On-device
        compare, one scalar readback (not an array transfer per site)."""
        present = [key in p for p in parts]
        if not any(present):
            return True
        if not all(present):
            return False
        s0 = parts[0][key]
        if any(p[key].shape != s0.shape for p in parts[1:]):
            return False
        return bool(
            jnp.all(jnp.stack([jnp.all(p[key] == s0) for p in parts[1:]]))
        )

    def fusable(names):
        parts = [layers.get(n) for n in names]
        if not all(isinstance(p, dict) and "data" in p for p in parts):
            return False
        # identical key sets (a symmetric/asymmetric mix would silently
        # drop zeros) and identical (bits, group, K) metas
        if any(set(p.keys()) != set(parts[0].keys()) for p in parts[1:]):
            return False
        # W8A8 sites carry 5-tuple ("a8") metas whose kernel dispatch a
        # fused 4-tuple meta would silently change — never fuse them
        if any(len(meta[n]) != 4 for n in names):
            return False
        if any(meta[n][:3] != meta[names[0]][:3] for n in names[1:]):
            return False
        return (
            _shared_key_equal(parts, "smooth")
            and _shared_key_equal(parts, "perm")
            and _shared_key_equal(parts, "codebook")
        )

    def fuse(names, fused_name):
        parts = [layers[n] for n in names]
        fused = {
            k: jnp.concatenate([p[k] for p in parts], axis=-1)
            for k in parts[0]
            if k not in ("smooth", "perm", "codebook")
            and parts[0][k] is not None
        }
        for shared in ("smooth", "perm", "codebook"):
            if shared in parts[0]:
                fused[shared] = parts[0][shared]  # identical across group
        bits, g, K, _ = meta[names[0]]
        N = sum(meta[n][3] for n in names)
        for n in names:
            del layers[n], meta[n]
        layers[fused_name] = fused
        meta[fused_name] = (bits, g, K, N)

    for names, fused_name in fuse_groups:
        if fusable(names):
            fuse(names, fused_name)
    out = dict(packed)
    out["layers"] = layers
    return out, tuple(sorted(meta.items()))
