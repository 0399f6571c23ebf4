"""Interpret-mode parity tests for the fused Pallas dequant kernels.

These run the actual Pallas kernel bodies (interpret=True) on CPU against
the XLA reference paths in qtpu.kernels.dequant_matmul — so the unpack
logic, group indexing, and output-side scale/zero correction are checked
without TPU hardware. On-device numerics are additionally covered by the
TPU benchmark runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from qtpu.core.packing import quantize_pack
from qtpu.kernels.dequant_matmul import _codebook_matmul_ref, _quantized_matmul_ref
from qtpu.kernels.pallas_dequant_matmul import (
    pallas_codebook_matmul,
    pallas_quantized_matmul,
)

K, N, M, G = 256, 256, 16, 64


def _assert_close(out, ref):
    o = np.asarray(out, np.float32)
    r = np.asarray(ref, np.float32)
    denom = np.linalg.norm(r) + 1e-6
    rel = np.linalg.norm(o - r) / denom
    assert rel < 2e-2, f"relative Frobenius error {rel}"
    atol = 0.05 * (np.abs(r).max() + 1e-6)
    np.testing.assert_allclose(o, r, atol=atol)



def _rand_w(seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((K, N)).astype(np.float32))


@pytest.mark.parametrize("bits", [2, 4, 8])
@pytest.mark.parametrize("sym", [False, True])
def test_pallas_matches_xla_ref(bits, sym):
    w = _rand_w()
    qt = quantize_pack(w, bits, G, symmetric=sym)
    meta = (bits, G, K, N)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((M, K)).astype(np.float32)
    ).astype(jnp.bfloat16)
    ref = _quantized_matmul_ref(x, qt.data, qt.scales, qt.zeros, meta)
    out = pallas_quantized_matmul(
        x, qt.data, qt.scales, qt.zeros, meta, interpret=True
    )
    _assert_close(out, ref)


@pytest.mark.parametrize("method", ["pot", "apot"])
def test_pallas_codebook_matches_xla_ref(method):
    from qtpu.core.packing import pack_int4

    w = _rand_w(2)
    if method == "pot":
        from qtpu.quant.pot import pot_codebook, pot_quantize_codes

        codes, sc = pot_quantize_codes(w, 4, G, (0.5, 1.6, 0.25))
        cb = pot_codebook(4)
    else:
        from qtpu.quant.apot import apot_quantize_codes

        codes, sc, cb = apot_quantize_codes(w, 4, G, 2, (0.5, 1.6, 0.25))
    data = pack_int4(codes, G)
    scales = sc.astype(jnp.bfloat16)
    meta = (4, G, K, N)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((M, K)).astype(np.float32)
    ).astype(jnp.bfloat16)
    ref = _codebook_matmul_ref(x, data, scales, cb, meta)
    out = pallas_codebook_matmul(x, data, scales, cb, meta, interpret=True)
    _assert_close(out, ref)


def test_pallas_odd_m_padding():
    """M not divisible by the align quantum exercises the pad/slice path."""
    w = _rand_w(4)
    qt = quantize_pack(w, 4, G, symmetric=False)
    meta = (4, G, K, N)
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((3, K)).astype(np.float32)
    ).astype(jnp.bfloat16)
    ref = _quantized_matmul_ref(x, qt.data, qt.scales, qt.zeros, meta)
    out = pallas_quantized_matmul(
        x, qt.data, qt.scales, qt.zeros, meta, interpret=True
    )
    assert out.shape == (3, N)
    _assert_close(out, ref)


def test_pallas_stacked_matches_sliced():
    """Scalar-prefetch stacked kernel == 2D kernel on each layer slice."""
    import jax

    from qtpu.kernels.pallas_dequant_matmul import (
        pallas_quantized_matmul,
        pallas_quantized_matmul_stacked,
    )

    L, M, K, N, g = 3, 8, 256, 256, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(ks[0], (M, K), jnp.bfloat16)
    data = jax.random.randint(ks[1], (L, K // 2, N), -128, 128, jnp.int8)
    scales = (jax.random.uniform(ks[2], (L, K // g, N)) * 0.01 + 1e-3).astype(
        jnp.bfloat16
    )
    zeros = jax.random.randint(ks[3], (L, K // g, N), 0, 16, jnp.uint8)
    meta = (4, g, K, N)
    for l in range(L):
        got = pallas_quantized_matmul_stacked(
            x, data, scales, zeros, meta, jnp.int32(l), interpret=True
        )
        want = pallas_quantized_matmul(
            x, data[l], scales[l], zeros[l], meta, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("KV", [4, 16])  # GQA and MHA-ish head counts
def test_pallas_decode_attention_matches_xla(KV):
    """Blocked-kv-head decode attention kernel == XLA reference math
    (per-sequence causal positions, int8 KV with per-position scales)."""
    import jax

    from qtpu.kernels.pallas_kv_attention import pallas_decode_attention

    B, H, hd, S = 4, 16, 64, 64
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    q = jax.random.normal(ks[0], (B, H, hd), jnp.bfloat16)
    kc = jax.random.randint(ks[1], (B, KV, S, hd), -127, 128, jnp.int8)
    vc = jax.random.randint(ks[2], (B, KV, S, hd), -127, 128, jnp.int8)
    ksc = (jax.random.uniform(ks[3], (B, KV, S)) * 0.05 + 0.01).astype(jnp.float32)
    vsc = (jax.random.uniform(ks[4], (B, KV, S)) * 0.05 + 0.01).astype(jnp.float32)
    pos = jnp.asarray([5, 17, 40, S - 1], jnp.int32)

    got = pallas_decode_attention(q, kc, vc, ksc, vsc, pos, interpret=True)

    # XLA reference (the _cached_attention fallback math)
    G = H // KV
    qf = q.astype(jnp.float32).reshape(B, KV, G, hd)
    K = kc.astype(jnp.float32) * ksc[..., None]
    V = vc.astype(jnp.float32) * vsc[..., None]
    scores = jnp.einsum("bkgd,bksd->bkgs", qf, K) / jnp.sqrt(float(hd))
    mask = jnp.arange(S)[None, :] <= pos[:, None]  # [B, S]
    scores = jnp.where(mask[:, None, None, :], scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    want = jnp.einsum("bkgs,bksd->bkgd", p, V).reshape(B, H, hd)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=2e-2, atol=2e-2
    )


@pytest.mark.parametrize("per_expert", [False, True])
@pytest.mark.parametrize("stacked", [False, True])
def test_pallas_moe_grouped_matches_per_expert(per_expert, stacked):
    """The grouped MoE kernel (one launch, grid over experts) must match
    E independent pallas_quantized_matmul calls exactly (same kernel body
    per tile, same f32 accumulation order)."""
    from qtpu.kernels.pallas_moe_matmul import pallas_moe_quantized_matmul

    E, L, bits = 4, 3, 4
    rng = np.random.default_rng(7)
    meta = (bits, G, K, N)
    packs = [
        [
            quantize_pack(
                jnp.asarray(rng.standard_normal((K, N)).astype(np.float32)),
                bits,
                G,
            )
            for _ in range(E)
        ]
        for _ in range(L if stacked else 1)
    ]

    def stack(f):
        a = jnp.stack([jnp.stack([f(q) for q in row]) for row in packs])
        return a if stacked else a[0]

    data = stack(lambda q: q.data)
    scales = stack(lambda q: q.scales)
    zeros = stack(lambda q: q.zeros)
    l = 1 if stacked else None
    row = packs[l if stacked else 0]

    if per_expert:
        x = jnp.asarray(rng.standard_normal((E, M, K)).astype(np.float32))
    else:
        x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))

    out = pallas_moe_quantized_matmul(
        x,
        data,
        scales,
        zeros,
        meta,
        layer=None if l is None else jnp.int32(l),
        per_expert_input=per_expert,
        interpret=True,
    )
    assert out.shape == (E, M, N)
    for e in range(E):
        q = row[e]
        xe = x[e] if per_expert else x
        ref = pallas_quantized_matmul(
            xe, q.data, q.scales, q.zeros, meta, interpret=True
        )
        np.testing.assert_array_equal(
            np.asarray(out[e]), np.asarray(ref), err_msg=f"expert {e}"
        )


@pytest.mark.parametrize("window", [0, 48])
def test_pallas_decode_attention_window(window):
    """Sliding-window decode attention == XLA banded reference."""
    from qtpu.kernels.pallas_kv_attention import pallas_decode_attention

    B, H, KV, hd, S = 4, 8, 4, 64, 64
    ks = jax.random.split(jax.random.PRNGKey(2), 6)
    q = jax.random.normal(ks[0], (B, H, hd), jnp.bfloat16)
    kc = jax.random.randint(ks[1], (B, KV, S, hd), -127, 128, jnp.int8)
    vc = jax.random.randint(ks[2], (B, KV, S, hd), -127, 128, jnp.int8)
    ksc = (jax.random.uniform(ks[3], (B, KV, S)) * 0.05 + 0.01).astype(jnp.float32)
    vsc = (jax.random.uniform(ks[4], (B, KV, S)) * 0.05 + 0.01).astype(jnp.float32)
    pos = jnp.asarray([5, 17, 40, S - 1], jnp.int32)

    got = pallas_decode_attention(
        q, kc, vc, ksc, vsc, pos, window=window, interpret=True
    )
    G = H // KV
    qf = q.astype(jnp.float32).reshape(B, KV, G, hd)
    K = kc.astype(jnp.float32) * ksc[..., None]
    V = vc.astype(jnp.float32) * vsc[..., None]
    scores = jnp.einsum("bkgd,bksd->bkgs", qf, K) / jnp.sqrt(float(hd))
    mask = jnp.arange(S)[None, :] <= pos[:, None]
    if window:
        mask &= jnp.arange(S)[None, :] > (pos[:, None] - window)
    scores = jnp.where(mask[:, None, None, :], scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    want = jnp.einsum("bkgs,bksd->bkgd", p, V).reshape(B, H, hd)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=2e-2, atol=2e-2
    )


@pytest.mark.parametrize("KV", [2, 8])
@pytest.mark.parametrize("window", [0, 200])
def test_pallas_flash_attention_gqa_window(KV, window):
    """GQA-native flash attention (no KV repeat) with optional sliding
    window == the XLA einsum reference."""
    from qtpu.kernels.pallas_flash_attention import pallas_flash_attention

    B, H, S, hd = 2, 8, 256, 64
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (B, H, S, hd), jnp.float32) * 0.5
    k = jax.random.normal(ks[1], (B, KV, S, hd), jnp.float32) * 0.5
    v = jax.random.normal(ks[2], (B, KV, S, hd), jnp.float32)

    got = pallas_flash_attention(q, k, v, window=window, interpret=True)

    rep = H // KV
    kr = jnp.repeat(k, rep, axis=1)
    vr = jnp.repeat(v, rep, axis=1)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, kr) / jnp.sqrt(float(hd))
    qi = jnp.arange(S)[:, None]
    ki = jnp.arange(S)[None, :]
    mask = ki <= qi
    if window:
        mask &= ki > qi - window
    scores = jnp.where(mask[None, None], scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    want = jnp.einsum("bhqk,bhkd->bhqd", p, vr)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )


@pytest.mark.parametrize("window", [0, 48])
def test_pallas_decode_attention_write_fused(window):
    """Fused quantize-write + attention == separate cache_layer_write +
    XLA attention reference, including the no-write masking for inactive
    slots (pos ≥ S)."""
    from qtpu.kernels.pallas_kv_attention import pallas_decode_attention_write
    from qtpu.serve.kvcache import cache_layer_write

    B, H, KV, hd, S = 4, 8, 4, 64, 64
    ks = jax.random.split(jax.random.PRNGKey(5), 8)
    q = jax.random.normal(ks[0], (B, H, hd), jnp.bfloat16)
    k_new = jax.random.normal(ks[5], (B, 1, KV, hd), jnp.bfloat16)
    v_new = jax.random.normal(ks[6], (B, 1, KV, hd), jnp.bfloat16)
    kc = jax.random.randint(ks[1], (B, KV, S, hd), -127, 128, jnp.int8)
    vc = jax.random.randint(ks[2], (B, KV, S, hd), -127, 128, jnp.int8)
    ksc = (jax.random.uniform(ks[3], (B, KV, S)) * 0.05 + 0.01).astype(jnp.float32)
    vsc = (jax.random.uniform(ks[4], (B, KV, S)) * 0.05 + 0.01).astype(jnp.float32)
    pos = jnp.asarray([5, 17, 40, S], jnp.int32)  # last slot inactive

    # reference first: separate write then banded attention over the
    # updated cache (the fused call DONATES the cache buffers)
    rk, rv, rks, rvs = cache_layer_write((kc, vc, ksc, vsc), k_new, v_new,
                                         pos, True)
    out, ko, vo, kso, vso = pallas_decode_attention_write(
        q, k_new, v_new, kc, vc, ksc, vsc, pos, window=window, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ko), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(vo), np.asarray(rv))
    np.testing.assert_allclose(np.asarray(kso), np.asarray(rks), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(vso), np.asarray(rvs), rtol=1e-6)

    G = H // KV
    qf = q.astype(jnp.float32).reshape(B, KV, G, hd)
    K = rk.astype(jnp.float32) * rks[..., None]
    V = rv.astype(jnp.float32) * rvs[..., None]
    scores = jnp.einsum("bkgd,bksd->bkgs", qf, K) / jnp.sqrt(float(hd))
    mask = jnp.arange(S)[None, :] <= pos[:, None]
    if window:
        mask &= jnp.arange(S)[None, :] > (pos[:, None] - window)
    scores = jnp.where(mask[:, None, None, :], scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    want = jnp.einsum("bkgs,bksd->bkgd", p, V).reshape(B, H, hd)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(want), rtol=2e-2, atol=2e-2
    )


@pytest.mark.parametrize("window", [0, 48])
def test_pallas_decode_attention_write_bf16(window):
    """bf16-cache fused write+attention == separate write + XLA attention."""
    from qtpu.kernels.pallas_kv_attention import (
        pallas_decode_attention_write_bf16,
    )
    from qtpu.serve.kvcache import cache_layer_write

    B, H, KV, hd, S = 4, 8, 4, 64, 64
    ks = jax.random.split(jax.random.PRNGKey(6), 8)
    q = jax.random.normal(ks[0], (B, H, hd), jnp.bfloat16)
    k_new = jax.random.normal(ks[5], (B, 1, KV, hd), jnp.bfloat16)
    v_new = jax.random.normal(ks[6], (B, 1, KV, hd), jnp.bfloat16)
    kc = jax.random.normal(ks[1], (B, KV, S, hd), jnp.bfloat16)
    vc = jax.random.normal(ks[2], (B, KV, S, hd), jnp.bfloat16)
    pos = jnp.asarray([5, 17, 40, S], jnp.int32)  # last slot inactive

    rk, rv, _, _ = cache_layer_write((kc, vc, None, None), k_new, v_new,
                                     pos, False)
    out, ko, vo = pallas_decode_attention_write_bf16(
        q, k_new, v_new, kc, vc, pos, window=window, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(ko, np.float32), np.asarray(rk, np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(vo, np.float32), np.asarray(rv, np.float32)
    )

    G = H // KV
    qf = q.astype(jnp.float32).reshape(B, KV, G, hd)
    K = rk.astype(jnp.float32)
    V = rv.astype(jnp.float32)
    scores = jnp.einsum("bkgd,bksd->bkgs", qf, K) / jnp.sqrt(float(hd))
    mask = jnp.arange(S)[None, :] <= pos[:, None]
    if window:
        mask &= jnp.arange(S)[None, :] > (pos[:, None] - window)
    scores = jnp.where(mask[:, None, None, :], scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    want = jnp.einsum("bkgs,bksd->bkgd", p, V).reshape(B, H, hd)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(want), rtol=3e-2, atol=3e-2
    )


@pytest.mark.parametrize("norm,residual", [(True, True), (False, False)])
def test_pallas_fused_mlp_matches_composed(norm, residual):
    """The single-launch MLP megakernel == norm→gate/up→silu·mul→down
    (+residual) composed from the reference ops."""
    from qtpu.kernels.pallas_fused_mlp import pallas_fused_mlp
    from qtpu.models.ops import linear, rms_norm

    Kd, F, g = 256, 512, 128
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    wg = jax.random.normal(ks[0], (Kd, F), jnp.float32) * 0.05
    wu = jax.random.normal(ks[1], (Kd, F), jnp.float32) * 0.05
    wd = jax.random.normal(ks[2], (F, Kd), jnp.float32) * 0.05
    x = (jax.random.normal(ks[3], (8, 1, Kd), jnp.float32) * 0.5).astype(
        jnp.bfloat16
    )
    nw = jnp.ones((Kd,), jnp.bfloat16) * 1.1
    qg = quantize_pack(jnp.concatenate([wg, wu], 1).astype(jnp.bfloat16), 4, g)
    qd = quantize_pack(wd.astype(jnp.bfloat16), 4, g)
    meta_gu, meta_d = (4, g, Kd, 2 * F), (4, g, F, Kd)

    h = rms_norm(x, nw, 1e-5) if norm else x
    gu = linear(h, {"data": qg.data, "scales": qg.scales, "zeros": qg.zeros}, meta_gu)
    gate, up = jnp.split(gu, [F], -1)
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
    down = linear(act, {"data": qd.data, "scales": qd.scales, "zeros": qd.zeros}, meta_d)
    ref = x + down if residual else down

    out = pallas_fused_mlp(
        x, nw if norm else None, qg.data, qg.scales, qg.zeros,
        qd.data, qd.scales, qd.zeros, meta_gu, meta_d,
        eps=1e-5, norm=norm, residual=residual, interpret=True,
    )
    _assert_close(out, ref)


def test_pallas_fused_mlp_stacked_matches_immediate():
    from qtpu.kernels.pallas_fused_mlp import (
        pallas_fused_mlp,
        pallas_fused_mlp_stacked,
    )

    Kd, F, L, g = 256, 512, 3, 128
    ks = jax.random.split(jax.random.PRNGKey(4), 2 * L + 1)
    gu_q, d_q = [], []
    for l in range(L):
        wgu = jax.random.normal(ks[2 * l], (Kd, 2 * F), jnp.bfloat16) * 0.05
        wd = jax.random.normal(ks[2 * l + 1], (F, Kd), jnp.bfloat16) * 0.05
        gu_q.append(quantize_pack(wgu, 4, g))
        d_q.append(quantize_pack(wd, 4, g))
    stk = lambda qs, f: jnp.stack([getattr(q, f) for q in qs])
    x = jax.random.normal(ks[-1], (8, Kd), jnp.bfloat16) * 0.5
    nw = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(5), (L, Kd), jnp.bfloat16)
    meta_gu, meta_d = (4, g, Kd, 2 * F), (4, g, F, Kd)
    for l in range(L):
        ref = pallas_fused_mlp(
            x, nw[l], gu_q[l].data, gu_q[l].scales, gu_q[l].zeros,
            d_q[l].data, d_q[l].scales, d_q[l].zeros, meta_gu, meta_d,
            interpret=True,
        )
        out = pallas_fused_mlp_stacked(
            x, nw, stk(gu_q, "data"), stk(gu_q, "scales"), stk(gu_q, "zeros"),
            stk(d_q, "data"), stk(d_q, "scales"), stk(d_q, "zeros"),
            meta_gu, meta_d, jnp.int32(l), interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(out, np.float32), np.asarray(ref, np.float32)
        )


def test_fused_mlp_dispatch_fallback_shapes():
    """Shapes the megakernel rejects (prefill M, odd groups) raise
    NotImplementedError so the model path composes the plain ops."""
    from qtpu.kernels.pallas_fused_mlp import pallas_fused_mlp

    Kd, F, g = 256, 512, 128
    qg = quantize_pack(jnp.zeros((Kd, 2 * F), jnp.bfloat16), 4, g)
    qd = quantize_pack(jnp.zeros((F, Kd), jnp.bfloat16), 4, g)
    x_big = jnp.zeros((8, 128, Kd), jnp.bfloat16)  # prefill-sized M
    with pytest.raises(NotImplementedError):
        pallas_fused_mlp(
            x_big, None, qg.data, qg.scales, qg.zeros,
            qd.data, qd.scales, qd.zeros,
            (4, g, Kd, 2 * F), (4, g, F, Kd), interpret=True,
        )
    with pytest.raises(NotImplementedError):  # metas that do not chain
        pallas_fused_mlp(
            jnp.zeros((8, Kd), jnp.bfloat16), None,
            qg.data, qg.scales, qg.zeros, qd.data, qd.scales, qd.zeros,
            (4, g, Kd, 2 * F), (4, g, F, Kd + 128), interpret=True,
        )


def test_pallas_stacked_norm_resid_fusion():
    """Optional in-kernel rms_norm prologue / residual epilogue on the
    stacked kernel == composed rms_norm + matmul + add."""
    import jax

    from qtpu.kernels.pallas_dequant_matmul import (
        pallas_quantized_matmul_stacked,
    )
    from qtpu.models.ops import rms_norm

    L, M, Kd, Nd, g = 3, 8, 256, 256, 64
    ks = jax.random.split(jax.random.PRNGKey(2), 5)
    x = jax.random.normal(ks[0], (M, Kd), jnp.bfloat16)
    data = jax.random.randint(ks[1], (L, Kd // 2, Nd), -128, 128, jnp.int8)
    scales = (jax.random.uniform(ks[2], (L, Kd // g, Nd)) * 0.01 + 1e-3).astype(
        jnp.bfloat16
    )
    zeros = jax.random.randint(ks[3], (L, Kd // g, Nd), 0, 16, jnp.uint8)
    nw = 1.0 + 0.1 * jax.random.normal(ks[4], (L, Kd), jnp.bfloat16)
    resid = jax.random.normal(jax.random.PRNGKey(9), (M, Nd), jnp.bfloat16)
    meta = (4, g, Kd, Nd)
    for l in range(L):
        h = rms_norm(x, nw[l], 1e-5)
        base = pallas_quantized_matmul_stacked(
            h, data, scales, zeros, meta, jnp.int32(l), interpret=True
        )
        fused = pallas_quantized_matmul_stacked(
            x, data, scales, zeros, meta, jnp.int32(l),
            norm_w=nw, resid=resid, eps=1e-5, interpret=True,
        )
        _assert_close(fused, resid.astype(jnp.float32) + base.astype(jnp.float32))


def test_pallas_layer_boundary_matches_composed():
    """The layer-boundary megakernel (o-proj + residual + mlp_norm + SwiGLU
    MLP + residual + next attn_norm + next qkv in ONE launch) == the
    composed dequantize/norm/matmul chain, to bf16-activation rounding."""
    import jax

    from qtpu.core.packing import QuantizedTensor, dequantize, quantize_pack
    from qtpu.kernels.pallas_layer_boundary import (
        pallas_layer_boundary_stacked,
    )

    L, M, D, F, Q, KV, g = 3, 8, 256, 512, 256, 128, 128
    Nq = Q + 2 * KV
    ks = jax.random.split(jax.random.PRNGKey(0), 8)

    def mk(k, *sh):
        return jax.random.normal(k, sh, jnp.bfloat16) * 0.05

    wo, wgu = mk(ks[0], L, Q, D), mk(ks[1], L, D, 2 * F)
    wd, wq = mk(ks[2], L, F, D), mk(ks[3], L, D, Nq)
    attn, x = mk(ks[4], M, Q), mk(ks[5], M, D)
    mn = jnp.abs(mk(ks[6], L, D)) + 0.5
    an = jnp.abs(mk(ks[7], L, D)) + 0.5

    def pk(w):
        qt = jax.vmap(lambda a: quantize_pack(a, 4, g))(w)
        return qt.data, qt.scales, qt.zeros

    od, osc, oz = pk(wo)
    gd, gs, gz = pk(wgu)
    dd, ds, dz = pk(wd)
    qd, qs, qz = pk(wq)
    metas = ((4, g, Q, D), (4, g, D, 2 * F), (4, g, F, D), (4, g, D, Nq))

    l, ln = 1, 2
    y2, qkv = pallas_layer_boundary_stacked(
        attn, x, mn, an, od, osc, oz, gd, gs, gz, dd, ds, dz, qd, qs, qz,
        *metas, l, ln, eps=1e-5, interpret=True,
    )

    def dq(data, sc, z, li, shape):
        return dequantize(
            QuantizedTensor(data[li], sc[li], z[li], 4, g, shape), jnp.float32
        )

    def rms(v, w):
        vf = v.astype(jnp.float32)
        return (
            vf
            * jax.lax.rsqrt(jnp.mean(vf * vf, -1, keepdims=True) + 1e-5)
            * w.astype(jnp.float32)
        )

    y = x.astype(jnp.float32) + attn.astype(jnp.float32) @ dq(
        od, osc, oz, l, (Q, D)
    )
    h = rms(y, mn[l]).astype(jnp.bfloat16).astype(jnp.float32)
    gu = h @ dq(gd, gs, gz, l, (D, 2 * F))
    gate, up = gu[:, :F], gu[:, F:]
    act = (
        (gate * jax.nn.sigmoid(gate)).astype(jnp.bfloat16)
        * up.astype(jnp.bfloat16)
    ).astype(jnp.float32)
    y2_ref = y + act @ dq(dd, ds, dz, l, (F, D))
    h2 = rms(y2_ref, an[ln]).astype(jnp.bfloat16).astype(jnp.float32)
    qkv_ref = h2 @ dq(qd, qs, qz, ln, (D, Nq))

    assert (
        float(jnp.max(jnp.abs(y2.astype(jnp.float32) - y2_ref))) < 5e-3
    )
    assert (
        float(jnp.max(jnp.abs(qkv.astype(jnp.float32) - qkv_ref))) < 2e-2
    )


def test_pallas_w8a8_matches_xla_path():
    """Single-launch W8A8 kernel (in-kernel dynamic act quant + int8 MXU
    dots + rank-1 zero correction) == the XLA reference path."""
    import jax

    from qtpu.core.packing import quantize_pack
    from qtpu.kernels.int8_matmul import _w8a8_matmul_ref
    from qtpu.kernels.pallas_int8_matmul import pallas_w8a8_matmul

    M, K, N = 8, 256, 256
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    x = jax.random.normal(ks[0], (M, K), jnp.bfloat16)
    w = jax.random.normal(ks[1], (K, N), jnp.bfloat16) * 0.05
    qt = quantize_pack(w, 8, K)
    meta = (8, K, K, N)
    ref = _w8a8_matmul_ref(x, qt.data, qt.scales, qt.zeros, meta)
    got = pallas_w8a8_matmul(
        x, qt.data, qt.scales, qt.zeros, meta, interpret=True
    )
    err = float(jnp.max(jnp.abs((got - ref).astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-6
    assert err / scale < 2e-2, (err, scale)


def test_pallas_banded_write_matches_full():
    """In-place banded write+attend == the full-tile write+attend kernel
    (same attention output, same post-step cache), including inactive
    rows (pos >= S) writing nothing."""
    import jax

    from qtpu.kernels.pallas_kv_attention import (
        pallas_decode_attention_write,
        pallas_decode_attention_write_banded,
    )

    B, KV, G, hd, S = 4, 2, 4, 32, 256
    H = KV * G
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    q = jax.random.normal(ks[0], (B, H, hd), jnp.bfloat16)
    k_new = jax.random.normal(ks[1], (B, 1, KV, hd), jnp.bfloat16)
    v_new = jax.random.normal(ks[2], (B, 1, KV, hd), jnp.bfloat16)
    k_c = jax.random.randint(ks[3], (B, KV, S, hd), -127, 127, jnp.int8)
    v_c = jax.random.randint(ks[4], (B, KV, S, hd), -127, 127, jnp.int8)
    ks_c = jnp.abs(jax.random.normal(ks[5], (B, KV, S))) * 0.01 + 1e-3
    vs_c = jnp.abs(jax.random.normal(ks[6], (B, KV, S))) * 0.01 + 1e-3
    pos = jnp.asarray([7, 100, 255, S + 5], jnp.int32)  # last row inactive

    # both kernels donate the cache args - pass private copies
    o_f, kf, vf, ksf, vsf = pallas_decode_attention_write(
        q, k_new, v_new, jnp.array(k_c), jnp.array(v_c), jnp.array(ks_c),
        jnp.array(vs_c), pos, interpret=True
    )
    o_b, kb_, vb, ksb, vsb = pallas_decode_attention_write_banded(
        q, k_new, v_new, jnp.array(k_c), jnp.array(v_c), jnp.array(ks_c),
        jnp.array(vs_c), pos, interpret=True
    )
    assert jnp.array_equal(kf, kb_), "k cache mismatch"
    assert jnp.array_equal(vf, vb), "v cache mismatch"
    assert jnp.array_equal(ksf, ksb), "k scales mismatch"
    assert jnp.array_equal(vsf, vsb), "v scales mismatch"
    err = float(jnp.max(jnp.abs((o_f - o_b).astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(o_f.astype(jnp.float32)))) + 1e-6
    assert err / scale < 3e-2, (err, scale)


def test_pallas_banded_write_kb_lt_kv():
    """Banded kernel with a head-blocked grid (kb < KV): the scale-array
    index maps must address [B, KV/kb, kb, S] as (b, h, 0, band) — the
    (b, 0, h, band) swap read group 0's scales for every head group.
    Shapes chosen so the 5 MB VMEM budget forces kb=4 < KV=8."""
    import jax

    from qtpu.kernels.pallas_kv_attention import (
        pallas_decode_attention_write,
        pallas_decode_attention_write_banded,
    )

    B, KV, G, hd, S = 2, 8, 1, 128, 4096
    H = KV * G
    ks = jax.random.split(jax.random.PRNGKey(3), 8)
    q = jax.random.normal(ks[0], (B, H, hd), jnp.bfloat16)
    k_new = jax.random.normal(ks[1], (B, 1, KV, hd), jnp.bfloat16)
    v_new = jax.random.normal(ks[2], (B, 1, KV, hd), jnp.bfloat16)
    k_c = jax.random.randint(ks[3], (B, KV, S, hd), -127, 127, jnp.int8)
    v_c = jax.random.randint(ks[4], (B, KV, S, hd), -127, 127, jnp.int8)
    # scales vary strongly BY HEAD so a cross-group read is caught
    head_amp = (jnp.arange(KV, dtype=jnp.float32) + 1.0)[None, :, None]
    ks_c = (jnp.abs(jax.random.normal(ks[5], (B, KV, S))) * 0.01 + 1e-3) * head_amp
    vs_c = (jnp.abs(jax.random.normal(ks[6], (B, KV, S))) * 0.01 + 1e-3) * head_amp
    pos = jnp.asarray([700, S + 5], jnp.int32)  # one active, one inactive

    o_f, kf, vf, ksf, vsf = pallas_decode_attention_write(
        q, k_new, v_new, jnp.array(k_c), jnp.array(v_c), jnp.array(ks_c),
        jnp.array(vs_c), pos, interpret=True
    )
    o_b, kb_, vb, ksb, vsb = pallas_decode_attention_write_banded(
        q, k_new, v_new, jnp.array(k_c), jnp.array(v_c), jnp.array(ks_c),
        jnp.array(vs_c), pos, interpret=True
    )
    assert jnp.array_equal(kf, kb_), "k cache mismatch"
    assert jnp.array_equal(vf, vb), "v cache mismatch"
    assert jnp.array_equal(ksf, ksb), "k scales mismatch"
    assert jnp.array_equal(vsf, vsb), "v scales mismatch"
    err = float(jnp.max(jnp.abs((o_f - o_b).astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(o_f.astype(jnp.float32)))) + 1e-6
    assert err / scale < 3e-2, (err, scale)


def test_pallas_flash_decode_matches_full():
    """S-blocked online-softmax decode (+in-place block write) == the
    full-tile write+attend kernel."""
    import jax

    from qtpu.kernels.pallas_kv_attention import (
        pallas_decode_attention_flash,
        pallas_decode_attention_write,
    )

    B, KV, G, hd, S = 2, 2, 4, 32, 4096
    H = KV * G
    ks = jax.random.split(jax.random.PRNGKey(1), 8)
    q = jax.random.normal(ks[0], (B, H, hd), jnp.bfloat16)
    k_new = jax.random.normal(ks[1], (B, 1, KV, hd), jnp.bfloat16)
    v_new = jax.random.normal(ks[2], (B, 1, KV, hd), jnp.bfloat16)
    k_c = jax.random.randint(ks[3], (B, KV, S, hd), -127, 127, jnp.int8)
    v_c = jax.random.randint(ks[4], (B, KV, S, hd), -127, 127, jnp.int8)
    ks_c = jnp.abs(jax.random.normal(ks[5], (B, KV, S))) * 0.01 + 1e-3
    vs_c = jnp.abs(jax.random.normal(ks[6], (B, KV, S))) * 0.01 + 1e-3
    pos = jnp.asarray([1234, S + 3], jnp.int32)  # one active, one inactive

    o_f, kf, vf, ksf, vsf = pallas_decode_attention_write(
        q, k_new, v_new, jnp.array(k_c), jnp.array(v_c), jnp.array(ks_c),
        jnp.array(vs_c), pos, interpret=True
    )
    o_b, kb_, vb, ksb, vsb = pallas_decode_attention_flash(
        q, k_new, v_new, jnp.array(k_c), jnp.array(v_c), jnp.array(ks_c),
        jnp.array(vs_c), pos, interpret=True
    )
    assert jnp.array_equal(kf, kb_), "k cache mismatch"
    assert jnp.array_equal(vf, vb), "v cache mismatch"
    assert jnp.array_equal(ksf, ksb), "k scales mismatch"
    assert jnp.array_equal(vsf, vsb), "v scales mismatch"
    err = float(jnp.max(jnp.abs((o_f - o_b).astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(o_f.astype(jnp.float32)))) + 1e-6
    assert err / scale < 3e-2, (err, scale)


def test_pallas_moe_gathered_matmul():
    """Gathered expert dispatch == per-expert dense reference, including
    repeated experts and layer-stacked weights."""
    import jax

    from qtpu.core.packing import dequantize, quantize_pack, QuantizedTensor
    from qtpu.kernels.pallas_moe_matmul import pallas_moe_gathered_matmul

    E, L, K, N, g = 4, 3, 128, 256, 64
    ks = jax.random.split(jax.random.PRNGKey(5), 2 + E * L)
    Gs = 6
    x = jax.random.normal(ks[0], (Gs, K), jnp.bfloat16)
    eidx = jnp.asarray([2, 0, 2, 3, 1, 2], jnp.int32)  # repeats included

    data, scales, zeros, dq = [], [], [], []
    for l in range(L):
        dl, sl, zl, ql = [], [], [], []
        for e in range(E):
            w = jax.random.normal(ks[2 + l * E + e], (K, N), jnp.bfloat16) * 0.05
            qt = quantize_pack(w, 4, g)
            dl.append(qt.data); sl.append(qt.scales); zl.append(qt.zeros)
            ql.append(dequantize(qt, jnp.float32))
        data.append(jnp.stack(dl)); scales.append(jnp.stack(sl))
        zeros.append(jnp.stack(zl)); dq.append(jnp.stack(ql))
    data, scales, zeros, dq = map(jnp.stack, (data, scales, zeros, dq))
    meta = (4, g, K, N)

    for l in (0, 2):
        got = pallas_moe_gathered_matmul(
            x, eidx, data, scales, zeros, meta, layer=l, interpret=True
        )
        ref = jnp.stack(
            [x[i].astype(jnp.float32) @ dq[l, int(eidx[i])] for i in range(Gs)]
        )
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref)))
        scale = float(jnp.max(jnp.abs(ref))) + 1e-6
        assert err / scale < 2e-2, (l, err, scale)

    # unstacked [E, ...] form
    got1 = pallas_moe_gathered_matmul(
        x, eidx, data[1], scales[1], zeros[1], meta, interpret=True
    )
    ref1 = jnp.stack(
        [x[i].astype(jnp.float32) @ dq[1, int(eidx[i])] for i in range(Gs)]
    )
    err = float(jnp.max(jnp.abs(got1.astype(jnp.float32) - ref1)))
    assert err / (float(jnp.max(jnp.abs(ref1))) + 1e-6) < 2e-2


def test_pallas_banded_stacked_matches_per_layer():
    """Stacked-cache banded kernel (scan-carry form, prefetched layer
    index) == the per-layer banded kernel on each layer slice."""
    import jax

    from qtpu.kernels.pallas_kv_attention import (
        pallas_decode_attention_write_banded,
        pallas_decode_attention_write_banded_stacked,
    )

    Lc, B, KV, G, hd, S = 3, 2, 2, 4, 32, 256
    H = KV * G
    ks = jax.random.split(jax.random.PRNGKey(7), 8)
    q = jax.random.normal(ks[0], (B, H, hd), jnp.bfloat16)
    k_new = jax.random.normal(ks[1], (B, 1, KV, hd), jnp.bfloat16)
    v_new = jax.random.normal(ks[2], (B, 1, KV, hd), jnp.bfloat16)
    k_all = jax.random.randint(ks[3], (Lc, B, KV, S, hd), -127, 127, jnp.int8)
    v_all = jax.random.randint(ks[4], (Lc, B, KV, S, hd), -127, 127, jnp.int8)
    ks_all = jnp.abs(jax.random.normal(ks[5], (Lc, B, KV, S))) * 0.01 + 1e-3
    vs_all = jnp.abs(jax.random.normal(ks[6], (Lc, B, KV, S))) * 0.01 + 1e-3
    pos = jnp.asarray([40, S + 5], jnp.int32)  # one active, one inactive

    for l in (0, 2):
        o_ref, kf, vf, ksf, vsf = pallas_decode_attention_write_banded(
            q, k_new, v_new,
            jnp.array(k_all[l]), jnp.array(v_all[l]),
            jnp.array(ks_all[l]), jnp.array(vs_all[l]), pos, interpret=True
        )
        o_s, k_o, v_o, ks_o, vs_o = (
            pallas_decode_attention_write_banded_stacked(
                q, k_new, v_new,
                jnp.array(k_all), jnp.array(v_all),
                jnp.array(ks_all), jnp.array(vs_all), pos, l, interpret=True
            )
        )
        assert jnp.array_equal(kf, k_o[l]), f"k cache mismatch l={l}"
        assert jnp.array_equal(vf, v_o[l]), f"v cache mismatch l={l}"
        assert jnp.array_equal(ksf, ks_o[l]), f"ks mismatch l={l}"
        assert jnp.array_equal(vsf, vs_o[l]), f"vs mismatch l={l}"
        # other layers untouched
        for m in range(Lc):
            if m != l:
                assert jnp.array_equal(k_o[m], k_all[m]), (l, m)
                assert jnp.array_equal(vs_o[m], vs_all[m]), (l, m)
        err = float(jnp.max(jnp.abs((o_ref - o_s).astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(o_ref.astype(jnp.float32)))) + 1e-6
        assert err / scale < 1e-6, (l, err, scale)


def test_pallas_band_write_plus_stacked_attend():
    """The scan-carry pair (band write kernel + read-only stacked
    attention) == the fused per-layer write+attend kernel: identical
    post-step cache, attention equal within int8-quantization tolerance
    of the new token's row (the fused kernel attends it in bf16)."""
    import jax

    from qtpu.kernels.pallas_kv_attention import (
        pallas_cache_band_write_stacked,
        pallas_decode_attention_stacked,
        pallas_decode_attention_write,
    )

    Lc, B, KV, G, hd, S = 3, 4, 2, 4, 32, 256
    H = KV * G
    ks = jax.random.split(jax.random.PRNGKey(9), 8)
    q = jax.random.normal(ks[0], (B, H, hd), jnp.bfloat16)
    k_new = jax.random.normal(ks[1], (B, 1, KV, hd), jnp.bfloat16)
    v_new = jax.random.normal(ks[2], (B, 1, KV, hd), jnp.bfloat16)
    k_all = jax.random.randint(ks[3], (Lc, B, KV, S, hd), -127, 127, jnp.int8)
    v_all = jax.random.randint(ks[4], (Lc, B, KV, S, hd), -127, 127, jnp.int8)
    ks_all = jnp.abs(jax.random.normal(ks[5], (Lc, B, KV, S))) * 0.01 + 1e-3
    vs_all = jnp.abs(jax.random.normal(ks[6], (Lc, B, KV, S))) * 0.01 + 1e-3
    pos = jnp.asarray([7, 100, 255, S + 5], jnp.int32)  # last inactive

    l = 1
    o_f, kf, vf, ksf, vsf = pallas_decode_attention_write(
        q, k_new, v_new,
        jnp.array(k_all[l]), jnp.array(v_all[l]),
        jnp.array(ks_all[l]), jnp.array(vs_all[l]), pos, interpret=True
    )
    k_o, v_o, ks_o, vs_o = pallas_cache_band_write_stacked(
        k_new, v_new, jnp.array(k_all), jnp.array(v_all),
        jnp.array(ks_all), jnp.array(vs_all), pos, l, interpret=True
    )
    assert jnp.array_equal(kf, k_o[l]), "k cache mismatch"
    assert jnp.array_equal(vf, v_o[l]), "v cache mismatch"
    assert jnp.array_equal(ksf, ks_o[l]), "ks mismatch"
    assert jnp.array_equal(vsf, vs_o[l]), "vs mismatch"
    for m in range(Lc):
        if m != l:
            assert jnp.array_equal(k_o[m], k_all[m]), m
            assert jnp.array_equal(ks_o[m], ks_all[m]), m

    o_s = pallas_decode_attention_stacked(
        q, k_o, v_o, ks_o, vs_o, pos, l, interpret=True
    )
    err = float(jnp.max(jnp.abs((o_f - o_s).astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(o_f.astype(jnp.float32)))) + 1e-6
    assert err / scale < 3e-2, (err, scale)
