"""Mixtral-style MoE family coverage.

The reference reaches MoE checkpoints through AutoModelForCausalLM
(quantization_utils.py:48-89) and quantizes every nn.Linear — router and
each expert's w1/w2/w3 included (quantization_utils.py:238-245). Here the
experts are stacked [L, E, ...] sites that the quantizers see as a flat
L·E layer axis, routing is dense soft-dispatch (static shapes for the
MXU), and the E axis shards over the mesh's `model` axis (expert
parallelism). Parity is checked against the genuine transformers
MixtralForCausalLM.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from qtpu.calib.stats import collect_calibration_stats
from qtpu.models import get_arch
from qtpu.models.config import TINY_MOE_TEST
from qtpu.models.hf_import import config_from_hf, load_checkpoint
from qtpu.models.moe import forward, init_params
from qtpu.quant.apply import pack_model, quantize_model
from qtpu.serve import init_cache
from qtpu.serve.decode import greedy_generate

CFG = TINY_MOE_TEST


@pytest.fixture(scope="module")
def setup():
    params = init_params(CFG, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 24), 0, CFG.vocab_size)
    return params, ids


@pytest.fixture(scope="module")
def stats(setup):
    params, _ = setup
    batches = [
        jax.random.randint(jax.random.PRNGKey(10 + i), (1, 16), 0, CFG.vocab_size)
        for i in range(3)
    ]
    return collect_calibration_stats(forward, params, batches, CFG)


def test_mixtral_import_parity(tmp_path):
    """Random tiny MixtralForCausalLM → save → qtpu import → logits parity.
    This exercises the router softmax/top-k/renorm, the per-expert SwiGLU,
    and the w1/w3/w2 → gate/up/down transposed stacking in one shot."""
    from transformers import MixtralConfig, MixtralForCausalLM

    hf_cfg = MixtralConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        num_local_experts=4,
        num_experts_per_tok=2,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = MixtralForCausalLM(hf_cfg).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)

    cfg = config_from_hf(str(tmp_path))
    assert cfg.arch == "moe"
    assert cfg.num_experts == 4 and cfg.num_experts_per_tok == 2
    params, _ = load_checkpoint(str(tmp_path), cfg, jnp.float32)
    assert params["layers"]["exp_gate"]["w"].shape == (2, 4, 128, 96)

    ids = np.random.default_rng(0).integers(0, 256, (1, 20))
    with torch.no_grad():
        expect = model(torch.tensor(ids)).logits.float().numpy()
    got = np.asarray(forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, expect, rtol=2e-2, atol=2e-2)


def test_routing_weights_topk_structure(setup):
    """Per token: exactly k strictly-positive combine weights, summing to 1
    under norm_topk_prob (the Mixtral router contract)."""
    from qtpu.models.moe import _routing_weights

    params, ids = setup
    h = params["embed"][ids].astype(jnp.float32)
    lp = jax.tree_util.tree_map(lambda a: a[0], params["layers"])
    rw = np.asarray(_routing_weights(h, lp, CFG, lambda s: None))
    assert rw.shape == (2, 24, CFG.num_experts)
    nz = (rw > 0).sum(axis=-1)
    assert (nz == CFG.num_experts_per_tok).all()
    np.testing.assert_allclose(rw.sum(axis=-1), 1.0, rtol=1e-5)


def test_calib_stats_carry_expert_axis(setup):
    """exp_down_in stats must be per-expert ([.., L, E, F]) and masked by
    routing: an expert that received no tokens reports zero mean-abs."""
    params, _ = setup
    batches = [
        jax.random.randint(jax.random.PRNGKey(20 + i), (1, 16), 0, CFG.vocab_size)
        for i in range(2)
    ]
    st = collect_calibration_stats(forward, params, batches, CFG, collect_hessian=True)
    L, E, F, D = CFG.num_layers, CFG.num_experts, CFG.intermediate_size, CFG.hidden_size
    assert st.mean_abs["exp_down_in"].shape == (2, L, E, F)
    assert st.max_abs["exp_down_in"].shape == (L, E, F)
    assert st.hessian["exp_down_in"].shape == (L, E, F, F)
    # shared-input sites keep their usual [S, L, C] shape
    assert st.mean_abs["mlp_in"].shape == (2, L, D)


@pytest.mark.parametrize(
    "method,mcfg",
    [
        ("rtn", {"w_bit": 8, "q_group_size": 64}),
        ("pot", {"w_bit": 8, "q_group_size": 64}),
        ("apot", {"w_bit": 4, "q_group_size": 64, "k": 2}),
        ("awq", {"w_bit": 4, "q_group_size": 64, "protect_ratio": 0.01,
                 "scale_factor": 2.0}),
        ("smoothquant", {"w_bit": 8, "q_group_size": 64, "alpha": 0.5}),
        ("gptq", {"w_bit": 4, "q_group_size": 64, "nsamples": 3}),
    ],
)
def test_quantize_moe_all_methods(setup, stats, method, mcfg):
    """Every quantizer must traverse the flattened [L·E] expert sites with
    the matching stats view and return finite logits with changed expert
    weights (the reference quantizes every Linear, incl. experts)."""
    params, ids = setup
    q = quantize_model(params, method, mcfg, stats, arch="moe")
    assert q["layers"]["exp_down"]["w"].shape == params["layers"]["exp_down"]["w"].shape
    changed = np.abs(
        np.asarray(q["layers"]["exp_down"]["w"], np.float32)
        - np.asarray(params["layers"]["exp_down"]["w"], np.float32)
    ).max()
    assert changed > 0
    logits = np.asarray(forward(q, ids, CFG))
    assert np.isfinite(logits).all()


def test_pack_moe_rtn_parity(setup):
    """Packed W8 serving params must match the fake-quant forward; the
    router stays a dense site (PACK_DENSE_SITES) and expert sites carry the
    [L, E, ...] packed layout."""
    params, ids = setup
    mcfg = {"w_bit": 8, "q_group_size": 64}
    fq = quantize_model(params, "rtn", mcfg, arch="moe")
    expect = np.asarray(forward(fq, ids, CFG))

    packed, qmeta = pack_model(params, "rtn", mcfg, arch="moe")
    assert "w" in packed["layers"]["router"]  # kept dense
    ed = packed["layers"]["exp_down"]
    assert "data" in ed and ed["data"].shape[:2] == (CFG.num_layers, CFG.num_experts)
    got = np.asarray(forward(packed, ids, CFG, qmeta=qmeta))
    np.testing.assert_allclose(got, expect, rtol=2e-2, atol=2e-2)


def test_pack_moe_codebook_parity(setup):
    """POT-packed experts take the codebook-LUT path per expert; parity
    against the POT fake-quant forward. Mean-abs criterion (as in
    test_model.test_packed_pot_matches_fake_quant): bf16 scale storage
    can flip a borderline token's top-k expert, which moves a few logit
    rows wholesale — per-expert weight reconstruction is separately
    bit-faithful to ~2e-4."""
    params, ids = setup
    mcfg = {"w_bit": 4, "q_group_size": 64}
    fq = quantize_model(params, "pot", mcfg, arch="moe")
    expect = np.asarray(forward(fq, ids, CFG))
    packed, qmeta = pack_model(params, "pot", mcfg, arch="moe")
    assert "codebook" in packed["layers"]["exp_down"]
    got = np.asarray(forward(packed, ids, CFG, qmeta=qmeta))
    assert np.abs(got - expect).mean() < 0.02


def test_moe_packed_decode_matches_packed_cacheless(setup):
    """Packed W4 serving: cached greedy decode must reproduce the packed
    cacheless forward's continuation (experts stream as packed codes
    through per-expert fused dequant-matmuls)."""
    params, _ = setup
    mcfg = {"w_bit": 4, "q_group_size": 64}
    packed, qmeta = pack_model(params, "rtn", mcfg, arch="moe")
    prompt = jax.random.randint(jax.random.PRNGKey(9), (2, 5), 0, CFG.vocab_size)
    ids = np.asarray(prompt).tolist()
    expect = []
    for _ in range(5):
        logits = forward(packed, jnp.asarray(ids), CFG, qmeta=qmeta)
        toks = [int(jnp.argmax(logits[b, -1])) for b in range(2)]
        expect.append(toks)
        ids = [row + [t] for row, t in zip(ids, toks)]
    expect = np.asarray(expect).T  # [B, n]
    cache = init_cache(CFG, 2, 32)
    toks, _ = greedy_generate(
        packed, prompt, cache, CFG, n_tokens=5, qmeta=qmeta, arch="moe"
    )
    assert (np.asarray(toks) == expect).all()


def test_moe_cached_decode_matches_cacheless(setup):
    params, _ = setup
    prompt = jax.random.randint(jax.random.PRNGKey(7), (1, 6), 0, CFG.vocab_size)
    ids = list(np.asarray(prompt).reshape(-1))
    expect = []
    for _ in range(6):
        logits = forward(params, jnp.asarray([ids]), CFG)
        tok = int(jnp.argmax(logits[0, -1]))
        expect.append(tok)
        ids.append(tok)
    cache = init_cache(CFG, 1, 32)
    toks, _ = greedy_generate(params, prompt, cache, CFG, n_tokens=6, arch="moe")
    assert list(np.asarray(toks).reshape(-1)) == expect


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_expert_parallel_sharded_forward(setup):
    """E=4 experts sharded over model=2 (with data=2): the routed-combine
    psum must reproduce the single-device logits — the expert-parallel
    story (SURVEY §2.3/§5.8)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from qtpu.sharding import make_mesh, shard_params

    _, ids = setup
    # f32: in bf16 a borderline token can flip its top-k expert choice
    # under sharded accumulation order, which is a discrete jump, not a
    # rounding error — the equality being tested is the collective layout
    params = init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    expect = np.asarray(forward(params, ids, CFG))
    mesh = make_mesh(data=2, model=2)
    p_sh = shard_params(params, mesh, arch="moe")
    ed = p_sh["layers"]["exp_down"]["w"]
    assert ed.sharding.spec == P(None, "model", None, None)
    ids_sh = jax.device_put(ids, NamedSharding(mesh, P("data", None)))
    with jax.sharding.set_mesh(mesh):
        got = np.asarray(forward(p_sh, ids_sh, CFG))
    np.testing.assert_allclose(got, expect, rtol=2e-2, atol=2e-2)


def test_moe_preset_registry():
    from qtpu.models.config import get_model_config

    cfg = get_model_config("mixtral-8x7b")
    assert cfg.arch == "moe" and cfg.num_experts == 8
    assert get_arch("moe") is not None


def test_qwen2_moe_import_parity(tmp_path):
    """Random tiny Qwen2MoeForCausalLM → save → qtpu import → logits
    parity: exercises the norm_topk_prob=False router, the always-on
    sigmoid-gated shared expert (sh_* sites), q/k/v biases, and the
    qwen2_moe key style (mlp.gate, mlp.experts.{e}.gate_proj/...)."""
    from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM

    hf_cfg = Qwen2MoeConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=96,
        moe_intermediate_size=64,
        shared_expert_intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        num_experts=4,
        num_experts_per_tok=2,
        norm_topk_prob=False,
        decoder_sparse_step=1,
        mlp_only_layers=[],
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = Qwen2MoeForCausalLM(hf_cfg).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)

    cfg = config_from_hf(str(tmp_path))
    assert cfg.arch == "moe"
    assert cfg.num_experts == 4 and not cfg.norm_topk_prob
    assert cfg.shared_expert_intermediate_size == 96
    assert cfg.attention_bias
    params, _ = load_checkpoint(str(tmp_path), cfg, jnp.float32)
    assert params["layers"]["exp_gate"]["w"].shape == (2, 4, 128, 64)
    assert params["layers"]["sh_gate"]["w"].shape == (2, 128, 96)
    assert params["layers"]["sh_router"]["w"].shape == (2, 128, 1)
    assert "b" in params["layers"]["q_proj"]

    ids = np.random.default_rng(0).integers(0, 256, (1, 20))
    with torch.no_grad():
        expect = model(torch.tensor(ids)).logits.float().numpy()
    got = np.asarray(forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, expect, rtol=2e-2, atol=2e-2)


def test_qwen2_moe_quantize_pack_decode():
    """Shared-expert model end-to-end: fake-quant all sites, pack+decode
    with cache == cacheless packed forward."""
    from qtpu.models.config import TINY_QWEN2_MOE_TEST
    from qtpu.serve.decode import prefill

    cfg = TINY_QWEN2_MOE_TEST
    params = init_params(cfg, jax.random.PRNGKey(3))
    ids = jax.random.randint(jax.random.PRNGKey(4), (2, 16), 0, cfg.vocab_size)
    base = forward(params, ids, cfg)
    assert bool(jnp.all(jnp.isfinite(base)))

    batches = [
        jax.random.randint(jax.random.PRNGKey(20 + i), (1, 16), 0, cfg.vocab_size)
        for i in range(2)
    ]
    stats = collect_calibration_stats(forward, params, batches, cfg)
    assert "sh_down_in" in stats.mean_abs

    q = quantize_model(params, "rtn", {"w_bit": 8, "q_group_size": 64},
                       arch="moe")
    lg = forward(q, ids, cfg)
    rel = float(jnp.abs(lg - base).mean() / jnp.abs(base).mean())
    assert rel < 0.05

    packed, qmeta = pack_model(
        params, "rtn", {"w_bit": 4, "q_group_size": 64}, arch="moe"
    )
    full = forward(packed, ids, cfg, qmeta=qmeta)
    cache = init_cache(cfg, 2, 64, quantized=True)
    logits, cache = prefill(packed, ids, cache, cfg, qmeta, arch="moe")
    np.testing.assert_allclose(
        np.asarray(logits),
        np.asarray(full[:, -1]),
        rtol=2e-2,
        atol=2e-2,
    )
