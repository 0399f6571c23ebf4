"""Unit tests for AWQ, GPTQ and SmoothQuant tensor transforms
(reference test_smooth_weights :299-353, test_alpha_effect :401-450, and
GPTQ behavior checks)."""

import jax
import jax.numpy as jnp
import numpy as np

from qtpu.quant.awq import awq_quantize, awq_search_scale_factor
from qtpu.quant.gptq import (
    _parity_column_quantize,
    build_proxy_hessian,
    gptq_quantize_layer,
)
from qtpu.quant.smoothquant import (
    compute_smoothing_scales,
    reverse_smoothing,
    search_alpha,
    smooth_weights,
    smoothquant_quantize,
)


def _w(rng, shape=(128, 256)):
    return jax.random.normal(rng, shape)


def test_awq_protects_salient_channels(rng):
    """Quantization error on the protected (high-importance) channels must
    shrink versus plain RTN."""
    k1, k2 = jax.random.split(rng)
    w = _w(k1)  # [out, in]
    imp = jnp.abs(jax.random.normal(k2, (256,)))
    top = jnp.argsort(-imp)[:3]
    from qtpu.quant import pseudo_quantize

    q_rtn = pseudo_quantize(w, 3, 128)
    q_awq = awq_quantize(w, imp, 3, 128, protect_ratio=0.01, scale_factor=2.0)
    err_rtn = float(jnp.mean((q_rtn[:, top] - w[:, top]) ** 2))
    err_awq = float(jnp.mean((q_awq[:, top] - w[:, top]) ** 2))
    assert err_awq < err_rtn


def test_awq_scale_search_no_worse_than_fixed(rng):
    k1, k2 = jax.random.split(rng)
    w = _w(k1)
    imp = jnp.abs(jax.random.normal(k2, (256,))) ** 2
    sf = awq_search_scale_factor(w, imp, 3, 128, 0.01)
    assert 1.0 <= float(sf) <= 2.0

    def werr(s):
        q = awq_quantize(w, imp, 3, 128, 0.01, s)
        return float(jnp.sum(jnp.sum((q - w) ** 2, axis=0) * imp))

    assert werr(float(sf)) <= werr(1.0) + 1e-6
    assert werr(float(sf)) <= werr(2.0) + 1e-6


def test_gptq_parity_mode_per_column_symmetric(rng):
    """Parity mode must equal per-column symmetric quantization with the
    reference's clamp floor (gptq_quantizer.py:177-197)."""
    w = np.asarray(_w(rng), np.float32)
    got = np.asarray(_parity_column_quantize(jnp.asarray(w), 4))
    sc = np.clip(np.abs(w).max(0, keepdims=True) / 15, 1e-5, None)
    expect = np.clip(np.round(w / sc), -16, 15) * sc
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_gptq_proxy_hessian_shape_spd(rng):
    v = jnp.abs(jax.random.normal(rng, (8, 64)))
    H = build_proxy_hessian(v, 0.01)
    assert H.shape == (64, 64)
    evals = jnp.linalg.eigvalsh(H)
    assert float(evals.min()) > 0


def test_gptq_compensation_beats_rtn_on_correlated_inputs(rng):
    """With correlated input features, error-compensated GPTQ must achieve
    lower output error ‖(Ŵ−W)X‖ than naive RTN — the whole point of the
    algorithm the reference skips (gptq_quantizer.py:191-194)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    C, O, T = 128, 64, 512
    # correlated inputs: mix of a few latent factors
    F = jax.random.normal(k1, (C, 8))
    X = jax.random.normal(k2, (T, 8)) @ F.T + 0.1 * jax.random.normal(k3, (T, C))
    W = jax.random.normal(jax.random.PRNGKey(9), (O, C))
    H = X.T @ X
    Wq = gptq_quantize_layer(
        W, H, n_bit=3, q_group_size=64, blocksize=64, error_compensation=True
    )
    from qtpu.quant import pseudo_quantize

    Wr = pseudo_quantize(W, 3, 64)
    err_gptq = float(jnp.linalg.norm((Wq - W) @ X.T))
    err_rtn = float(jnp.linalg.norm((Wr - W) @ X.T))
    assert err_gptq < err_rtn


def test_gptq_actorder_runs(rng):
    w = _w(rng, (64, 128))
    H = build_proxy_hessian(jnp.abs(jax.random.normal(rng, (4, 128))))
    q = gptq_quantize_layer(
        w, H, 4, q_group_size=64, blocksize=64, actorder=True, error_compensation=True
    )
    assert q.shape == w.shape and bool(jnp.all(jnp.isfinite(q)))


def test_gptq_lowrank_prepare_matches_dense(rng):
    """The O(C·S²) low-rank factor must equal
    gptq_prepare_factor(build_proxy_hessian(v)) — same U, no C×C linalg."""
    from qtpu.quant.gptq import gptq_prepare_factor, gptq_prepare_factor_lowrank

    v = jnp.abs(jax.random.normal(rng, (12, 192)))
    U_dense = gptq_prepare_factor(build_proxy_hessian(v, 0.01), 0.01)
    U_low = gptq_prepare_factor_lowrank(v, 0.01)
    np.testing.assert_allclose(
        np.asarray(U_low), np.asarray(U_dense), rtol=2e-3, atol=2e-4
    )
    # and UᵀU really is H⁻¹
    H = np.asarray(build_proxy_hessian(v, 0.01), np.float64)
    mean_diag = np.mean(np.diag(H))
    Heff = H + (0.01 * mean_diag + 1e-8) * np.eye(H.shape[0])
    Ul = np.asarray(U_low, np.float64)
    np.testing.assert_allclose(
        Ul.T @ Ul, np.linalg.inv(Heff), rtol=5e-3, atol=5e-4
    )


def test_gptq_lowrank_layer_matches_dense(rng):
    """End-to-end layer quantization via stat_vectors (low-rank path) must
    match the dense-Hessian path, actorder on and off."""
    k1, k2 = jax.random.split(rng)
    w = _w(k1, (64, 128))
    v = jnp.abs(jax.random.normal(k2, (8, 128)))
    H = build_proxy_hessian(v, 0.01)
    for actorder in (False, True):
        q_dense = gptq_quantize_layer(
            w, H, 4, q_group_size=64, blocksize=64,
            actorder=actorder, error_compensation=True,
        )
        q_low = gptq_quantize_layer(
            w, None, 4, q_group_size=64, blocksize=64,
            actorder=actorder, error_compensation=True, stat_vectors=v,
        )
        np.testing.assert_allclose(
            np.asarray(q_low), np.asarray(q_dense), rtol=1e-4, atol=1e-4
        )


def test_smooth_weights_equivalence(rng):
    """y = (W/s) @ (s·x) must equal W @ x (smooth_quant_quantizer.py:11-16)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    w = _w(k1)  # [out, in]
    x = jax.random.normal(k2, (16, 256))
    amax = jnp.abs(jax.random.normal(k3, (256,))) + 0.1
    s = compute_smoothing_scales(amax, w, 0.5)
    w_s = smooth_weights(w, s)
    y0 = x @ w.T
    y1 = (x * s[None, :]) @ w_s.T
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-4, atol=1e-4)


def test_smooth_alpha_extremes(rng):
    """α=0 → s = 1/wmax (weight-only); α=1 → s = amax (activation-only)
    (reference test_smooth_weights checks α ∈ {0, 0.5, 1})."""
    k1, k2 = jax.random.split(rng)
    w = _w(k1)
    amax = jnp.abs(jax.random.normal(k2, (256,))) + 0.1
    wmax = jnp.clip(jnp.max(jnp.abs(w), axis=0), 1e-5, None)
    s0 = compute_smoothing_scales(amax, w, 0.0)
    s1 = compute_smoothing_scales(amax, w, 1.0)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(1.0 / wmax), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(amax), rtol=1e-5)


def test_alpha_changes_weights(rng):
    """Different α ⇒ different quantized weight norms (reference
    test_alpha_effect :446-448)."""
    k1, k2 = jax.random.split(rng)
    w = _w(k1)
    amax = jnp.abs(jax.random.normal(k2, (256,))) * 3 + 0.1
    qa, _ = smoothquant_quantize(w, amax, 8, 128, alpha=0.2)
    qb, _ = smoothquant_quantize(w, amax, 8, 128, alpha=0.8)
    assert not bool(jnp.allclose(qa, qb))


def test_reverse_smoothing_roundtrip(rng):
    k1, k2 = jax.random.split(rng)
    w = _w(k1)
    amax = jnp.abs(jax.random.normal(k2, (256,))) + 0.1
    s = compute_smoothing_scales(amax, w, 0.5)
    back = reverse_smoothing(smooth_weights(w, s), s)
    np.testing.assert_allclose(np.asarray(back), np.asarray(w), rtol=1e-4, atol=1e-5)


def test_search_alpha_in_range(rng):
    k1, k2 = jax.random.split(rng)
    w = _w(k1)
    amax = jnp.abs(jax.random.normal(k2, (256,))) * 10 + 0.1
    a = search_alpha(w, amax, 8, 128)
    assert 0.0 <= float(a) <= 1.0


def test_gptq_actorder_shard_local():
    """actorder_shards=2: the packed perm never crosses the K/2 shard
    boundary (TP row-split locality — no serve-time all-gather), and the
    packed model still evaluates close to the global-perm variant."""
    import numpy as np

    from qtpu.models import TINY_TEST
    from qtpu.models.llama import forward, init_params
    from qtpu.calib.stats import collect_calibration_stats
    from qtpu.quant.apply import pack_model

    cfg = TINY_TEST
    params = init_params(cfg, jax.random.PRNGKey(0))
    batches = [
        jax.random.randint(jax.random.PRNGKey(5 + i), (1, 32), 0, cfg.vocab_size)
        for i in range(2)
    ]
    stats = collect_calibration_stats(forward, params, batches, cfg)
    mcfg = {"w_bit": 4, "q_group_size": 64, "actorder": True,
            "actorder_shards": 2, "nsamples": 8}
    packed, qmeta = pack_model(params, "gptq", mcfg, stats)
    perm = np.asarray(packed["layers"]["q_proj"]["perm"])  # [L, K]
    K = perm.shape[-1]
    half = K // 2
    assert np.all(perm[:, :half] < half), "perm crosses shard boundary"
    assert np.all(perm[:, half:] >= half)
    # different orderings give different (both valid) W4 models — the
    # oracle is closeness to the FP forward, not to each other
    ids = jax.random.randint(jax.random.PRNGKey(9), (1, 32), 0, cfg.vocab_size)
    base = forward(params, ids, cfg)
    lg = forward(packed, ids, cfg, qmeta=qmeta)
    gmcfg = dict(mcfg, actorder_shards=1)
    gpacked, gmeta = pack_model(params, "gptq", gmcfg, stats)
    glg = forward(gpacked, ids, cfg, qmeta=gmeta)
    rel_local = float(jnp.abs(lg - base).mean() / jnp.abs(base).mean())
    rel_global = float(jnp.abs(glg - base).mean() / jnp.abs(base).mean())
    assert rel_local < 0.35, rel_local
    assert rel_local < rel_global * 2.0, (rel_local, rel_global)
