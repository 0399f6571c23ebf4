"""Model forward, capture modes, and end-to-end quantize pipeline on a tiny
model (the reference's fake-backend pattern, test_quantization.py:120-124)."""

import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from qtpu.calib import collect_calibration_stats
from qtpu.models import TINY_TEST, forward, init_params
from qtpu.quant import quantize_model
from qtpu.quant.apply import pack_model


@pytest.fixture(scope="module")
def setup():
    cfg = TINY_TEST
    params = init_params(cfg, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    batches = [
        jax.random.randint(jax.random.fold_in(key, i), (1, 64), 0, cfg.vocab_size)
        for i in range(4)
    ]
    stats = collect_calibration_stats(
        forward, params, batches, cfg, collect_hessian=True
    )
    return cfg, params, batches, stats


def test_forward_shapes(setup):
    cfg, params, batches, _ = setup
    logits = forward(params, batches[0], cfg)
    assert logits.shape == (1, 64, cfg.vocab_size)
    assert logits.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_capture_stats_shapes(setup):
    cfg, params, batches, stats = setup
    L, D, F = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    assert stats.mean_abs["attn_in"].shape == (4, L, D)
    assert stats.mean_abs["down_in"].shape == (4, L, F)
    assert stats.mean_abs["head_in"].shape == (4, D)
    assert stats.max_abs["mlp_in"].shape == (L, D)
    assert stats.hessian["attn_in"].shape == (L, D, D)
    assert stats.n_batches == 4


def test_stats_nonnegative(setup):
    _, _, _, stats = setup
    for site, v in stats.mean_abs.items():
        assert bool(jnp.all(v >= 0)), site
    for site, v in stats.max_abs.items():
        assert bool(jnp.all(v >= 0)), site


@pytest.mark.parametrize(
    "method,mcfg",
    [
        ("rtn", {"w_bit": 8, "q_group_size": 64}),
        ("pot", {"w_bit": 8, "q_group_size": 64, "grid_step": 0.1}),
        ("apot", {"w_bit": 4, "q_group_size": 64, "k": 2, "grid_step": 0.1}),
        ("awq", {"w_bit": 4, "q_group_size": 64, "protect_ratio": 0.01, "scale_factor": 2.0}),
        ("gptq", {"w_bit": 4, "q_group_size": 64, "error_compensation": False}),
        ("gptq", {"w_bit": 4, "q_group_size": 64, "error_compensation": True, "blocksize": 64}),
        ("smoothquant", {"w_bit": 8, "q_group_size": 64, "alpha": 0.5}),
    ],
)
def test_quantize_model_end_to_end(setup, method, mcfg):
    cfg, params, batches, stats = setup
    qp = quantize_model(params, method, mcfg, stats)
    logits = forward(qp, batches[0], cfg)
    assert bool(jnp.all(jnp.isfinite(logits)))
    # weights must actually change
    w0 = params["layers"]["q_proj"]["w"]
    w1 = qp["layers"]["q_proj"]["w"]
    assert not bool(jnp.allclose(w0, w1))


def test_w8_closer_than_w2(setup):
    """Monotonic fidelity at the model level: W8 logits closer to fp than W2."""
    cfg, params, batches, stats = setup
    base = forward(params, batches[0], cfg)
    q8 = quantize_model(params, "rtn", {"w_bit": 8, "q_group_size": 64})
    q2 = quantize_model(params, "rtn", {"w_bit": 2, "q_group_size": 64})
    d8 = float(jnp.abs(forward(q8, batches[0], cfg) - base).mean())
    d2 = float(jnp.abs(forward(q2, batches[0], cfg) - base).mean())
    assert d8 < d2


def test_packed_matches_fake_quant(setup):
    """Packed int4 serving path ≈ fake-quant eval path (bf16 scale storage
    is the only difference)."""
    cfg, params, batches, stats = setup
    base = forward(params, batches[0], cfg)
    fq = quantize_model(params, "rtn", {"w_bit": 4, "q_group_size": 64})
    packed, qmeta = pack_model(params, "rtn", {"w_bit": 4, "q_group_size": 64})
    lg_fq = forward(fq, batches[0], cfg)
    lg_pk = forward(packed, batches[0], cfg, qmeta=qmeta)
    diff_q = float(jnp.abs(lg_pk - lg_fq).mean())
    diff_base = float(jnp.abs(lg_fq - base).mean())
    assert diff_q < max(0.25 * diff_base, 0.02)


def test_packed_awq_and_smoothquant(setup):
    cfg, params, batches, stats = setup
    for method, mcfg in [
        ("awq", {"w_bit": 4, "q_group_size": 64, "protect_ratio": 0.01, "scale_factor": 2.0}),
        ("smoothquant", {"w_bit": 8, "q_group_size": 64, "alpha": 0.5}),
    ]:
        packed, qmeta = pack_model(params, method, mcfg, stats)
        logits = forward(packed, batches[0], cfg, qmeta=qmeta)
        assert bool(jnp.all(jnp.isfinite(logits)))


def test_packed_pot_matches_fake_quant(setup):
    """Codebook-packed POT must reproduce the fake-quant path exactly
    (same scale search, same log2 rounding; only bf16 scale storage
    differs)."""
    cfg, params, batches, stats = setup
    mcfg = {"w_bit": 4, "q_group_size": 64, "grid_step": 0.05}
    fq = quantize_model(params, "pot", mcfg)
    packed, qmeta = pack_model(params, "pot", mcfg)
    lg_fq = forward(fq, batches[0], cfg)
    lg_pk = forward(packed, batches[0], cfg, qmeta=qmeta)
    assert float(jnp.abs(lg_pk - lg_fq).mean()) < 0.02


def test_packed_apot_reasonable(setup):
    """Packed APOT (16-level codebook cap for 4-bit indices) stays within
    the fake-quant path's error scale vs fp."""
    cfg, params, batches, stats = setup
    mcfg = {"w_bit": 4, "q_group_size": 64, "k": 2, "grid_step": 0.05}
    base = forward(params, batches[0], cfg)
    packed, qmeta = pack_model(params, "apot", mcfg)
    fq = quantize_model(params, "apot", mcfg)
    err_pk = float(jnp.abs(forward(packed, batches[0], cfg, qmeta=qmeta) - base).mean())
    err_fq = float(jnp.abs(forward(fq, batches[0], cfg) - base).mean())
    assert err_pk < 3 * err_fq + 0.05


def test_packed_gptq_matches_fake_quant(setup):
    """Integer-exported full GPTQ must reproduce the fake-quant GPTQ path
    (same codes, same frozen group scales; bf16 scale storage only)."""
    cfg, params, batches, stats = setup
    mcfg = {"w_bit": 4, "q_group_size": 64, "error_compensation": True, "blocksize": 64}
    fq = quantize_model(params, "gptq", mcfg, stats)
    packed, qmeta = pack_model(params, "gptq", mcfg, stats)
    lg_fq = forward(fq, batches[0], cfg)
    lg_pk = forward(packed, batches[0], cfg, qmeta=qmeta)
    assert float(jnp.abs(lg_pk - lg_fq).mean()) < 0.01


def test_packed_awq_matches_fake_quant(setup):
    """Folding AWQ's protection scales into the input smooth vector is
    algebraically identical to the fake-quant path:
    (x·v⁻¹) @ Q(v∘W) == x @ (Q(v∘W)/v)."""
    cfg, params, batches, stats = setup
    mcfg = {"w_bit": 4, "q_group_size": 64, "protect_ratio": 0.01, "scale_factor": 2.0}
    fq = quantize_model(params, "awq", mcfg, stats)
    packed, qmeta = pack_model(params, "awq", mcfg, stats)
    lg_fq = forward(fq, batches[0], cfg)
    lg_pk = forward(packed, batches[0], cfg, qmeta=qmeta)
    base = forward(params, batches[0], cfg)
    diff_q = float(jnp.abs(lg_pk - lg_fq).mean())
    diff_base = float(jnp.abs(lg_fq - base).mean())
    assert diff_q < max(0.3 * diff_base, 0.02)


def test_packed_smoothquant_matches_fake_quant(setup):
    cfg, params, batches, stats = setup
    mcfg = {"w_bit": 8, "q_group_size": 64, "alpha": 0.5}
    fq = quantize_model(params, "smoothquant", mcfg, stats)
    packed, qmeta = pack_model(params, "smoothquant", mcfg, stats)
    lg_fq = forward(fq, batches[0], cfg)
    lg_pk = forward(packed, batches[0], cfg, qmeta=qmeta)
    assert float(jnp.abs(lg_pk - lg_fq).mean()) < 0.02


def test_w8a8_smoothquant_serving(setup):
    """True W8A8 (dynamic per-token int8 activations + per-channel int8
    weights on the int8 MXU path) — beyond the reference, which never
    quantizes activations."""
    from qtpu.core.packing import quantize_pack
    from qtpu.kernels.int8_matmul import w8a8_matmul

    cfg, params, batches, stats = setup
    # unit: int8 matmul close to fp
    K, N = 256, 128
    w = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, K), jnp.float32)
    qt = quantize_pack(w, 8, K)
    y = w8a8_matmul(x, qt.data, qt.scales, qt.zeros, (8, K, K, N))
    assert float(jnp.abs(y - x @ w).max() / jnp.abs(x @ w).max()) < 0.03

    base = forward(params, batches[0], cfg)
    packed, qmeta = pack_model(
        params,
        "smoothquant",
        {"w_bit": 8, "q_group_size": 128, "alpha": 0.5, "act_quant": True},
        stats,
    )
    lg = forward(packed, batches[0], cfg, qmeta=qmeta)
    rel = float(jnp.abs(lg - base).mean() / jnp.abs(base).mean())
    assert rel < 0.1
    # really int8-per-channel stored
    assert packed["layers"]["q_proj"]["data"].dtype == jnp.int8


def test_fused_sites_match_unfused(setup):
    """fuse_packed_sites (qkv + gate/up) must be bit-identical to the
    per-site packed path, for RTN and for AWQ (whose identical-by-
    construction smooth vectors fuse too); OPT trees pass through."""
    from qtpu.quant.apply import fuse_packed_sites

    cfg, params, batches, stats = setup
    for method, mcfg in [
        ("rtn", {"w_bit": 4, "q_group_size": 64}),
        ("awq", {"w_bit": 4, "q_group_size": 64, "protect_ratio": 0.01, "scale_factor": 2.0}),
    ]:
        packed, qmeta = pack_model(params, method, mcfg, stats)
        fused, fmeta = fuse_packed_sites(packed, qmeta)
        assert "qkv_proj" in fused["layers"] and "gateup_proj" in fused["layers"]
        a = forward(packed, batches[0], cfg, qmeta=qmeta)
        b = forward(fused, batches[0], cfg, qmeta=fmeta)
        assert float(jnp.abs(a - b).max()) == 0.0, method

    # with the default (llama) arch arg an OPT tree passes through
    # untouched — the structural guard, not the caller, protects it
    from qtpu.models import get_model_config
    from qtpu.models.opt import forward as opt_forward
    from qtpu.models.opt import init_params as opt_init

    ocfg = get_model_config("tiny-opt-test")
    oparams = opt_init(ocfg, jax.random.PRNGKey(0))
    opacked, ometa = pack_model(oparams, "rtn", {"w_bit": 4, "q_group_size": 64}, arch="opt")
    ofused, _ = fuse_packed_sites(opacked, ometa)
    assert "qkv_proj" not in ofused["layers"]
    assert "q_proj" in ofused["layers"]

    # with arch="opt" q/k/v fuse and stay bit-identical
    ofused, ofmeta = fuse_packed_sites(opacked, ometa, arch="opt")
    assert "qkv_proj" in ofused["layers"]
    ob = jnp.clip(batches[0], 0, ocfg.vocab_size - 1)
    a = opt_forward(opacked, ob, ocfg, qmeta=ometa)
    b = opt_forward(ofused, ob, ocfg, qmeta=ofmeta)
    assert float(jnp.abs(a - b).max()) == 0.0


def test_fused_codebook_sites_match_unfused(setup):
    """POT codebook sites share one level table, so q/k/v and gate/up fuse
    (single codebook copy kept) and stay bit-identical to unfused."""
    from qtpu.quant.apply import fuse_packed_sites

    cfg, params, batches, stats = setup
    mcfg = {"w_bit": 4, "q_group_size": 64, "grid_step": 0.25}
    packed, qmeta = pack_model(params, "pot", mcfg)
    fused, fmeta = fuse_packed_sites(packed, qmeta)
    assert "qkv_proj" in fused["layers"] and "gateup_proj" in fused["layers"]
    assert "codebook" in fused["layers"]["qkv_proj"]
    a = forward(packed, batches[0], cfg, qmeta=qmeta)
    b = forward(fused, batches[0], cfg, qmeta=fmeta)
    assert float(jnp.abs(a - b).max()) == 0.0


def test_packed_gptq_actorder(setup):
    """actorder packed export: codes in Hessian-diagonal order with the
    permutation applied to activations at serve time — must match the
    actorder fake-quant path (which un-permutes the weights)."""
    cfg, params, batches, stats = setup
    mcfg = {
        "w_bit": 4,
        "q_group_size": 64,
        "error_compensation": True,
        "blocksize": 64,
        "actorder": True,
    }
    fq = quantize_model(params, "gptq", mcfg, stats)
    packed, qmeta = pack_model(params, "gptq", mcfg, stats)
    assert "perm" in packed["layers"]["q_proj"]
    lg_fq = forward(fq, batches[0], cfg)
    lg_pk = forward(packed, batches[0], cfg, qmeta=qmeta)
    assert float(jnp.abs(lg_pk - lg_fq).mean()) < 0.01


def test_fused_gptq_actorder(setup):
    """actorder-packed sites fuse (identical perms from the shared input's
    Hessian) and stay bit-identical."""
    from qtpu.quant.apply import fuse_packed_sites

    cfg, params, batches, stats = setup
    mcfg = {
        "w_bit": 4,
        "q_group_size": 64,
        "error_compensation": True,
        "blocksize": 64,
        "actorder": True,
    }
    packed, qmeta = pack_model(params, "gptq", mcfg, stats)
    fused, fmeta = fuse_packed_sites(packed, qmeta)
    assert "qkv_proj" in fused["layers"]
    a = forward(packed, batches[0], cfg, qmeta=qmeta)
    b = forward(fused, batches[0], cfg, qmeta=fmeta)
    assert float(jnp.abs(a - b).max()) == 0.0


def test_w8a8_sites_never_fuse(setup):
    """Fusing a8 (5-tuple meta) sites would silently change kernel
    dispatch — fusable() must reject them."""
    from qtpu.quant.apply import fuse_packed_sites

    cfg, params, batches, stats = setup
    packed, qmeta = pack_model(
        params,
        "smoothquant",
        {"w_bit": 8, "q_group_size": 128, "alpha": 0.5, "act_quant": True},
        stats,
    )
    fused, fmeta = fuse_packed_sites(packed, qmeta)
    assert "qkv_proj" not in fused["layers"]
    lg = forward(fused, batches[0], cfg, qmeta=fmeta)
    assert bool(jnp.all(jnp.isfinite(lg)))


def test_fold_smooth_matches_runtime_smooth(setup):
    """fold_smooth moves input smooth vectors into the preceding norm /
    up_proj output scales; the folded model must match the runtime-smooth
    model to bf16 rounding, strip every foldable smooth key (o_proj keeps
    its — GQA blocks the V-column fold), and unlock qkv/gateup fusion for
    smoothquant (whose per-group shared vectors are new in pack_model)."""
    from qtpu.quant.apply import fold_smooth, fuse_packed_sites

    cfg, params, batches, stats = setup
    for method, mcfg in [
        ("smoothquant", {"w_bit": 4, "q_group_size": 64, "alpha": 0.5}),
        (
            "awq",
            {
                "w_bit": 4,
                "q_group_size": 64,
                "protect_ratio": 0.01,
                "scale_factor": 2.0,
            },
        ),
    ]:
        packed, qmeta = pack_model(params, method, mcfg, stats)
        assert "smooth" in packed["layers"]["q_proj"], method
        folded, fmeta = fold_smooth(packed, qmeta)
        for site in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj",
                     "down_proj"):
            assert "smooth" not in folded["layers"][site], (method, site)
        assert "smooth" not in folded["lm_head"], method
        assert "smooth" in folded["layers"]["o_proj"], method

        a = forward(packed, batches[0], cfg, qmeta=qmeta)
        b = forward(folded, batches[0], cfg, qmeta=fmeta)
        rel = float(jnp.abs(a - b).mean() / jnp.abs(a).mean())
        assert rel < 0.05, (method, rel)

        fused, fumeta = fuse_packed_sites(folded, fmeta)
        assert "qkv_proj" in fused["layers"], method
        assert "gateup_proj" in fused["layers"], method
        c = forward(fused, batches[0], cfg, qmeta=fumeta)
        assert float(jnp.abs(b - c).max()) == 0.0, method
