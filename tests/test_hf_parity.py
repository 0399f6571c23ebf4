"""HF-import + forward parity against genuine transformers models.

transformers can instantiate models from configs WITHOUT network access, so
these tests build a real HF Llama/GPT-2/OPT (random weights), save it to a
local checkpoint, import it with qtpu.models.hf_import, and assert logits
parity — validating both the name/orientation mapping and every
architectural detail (RoPE convention, GQA, Conv1D, OPT's offset-2
positions) against the canonical implementation.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from qtpu.models import get_arch
from qtpu.models.config import ModelConfig
from qtpu.models.hf_import import (
    config_from_hf,
    load_gpt2_params,
    load_llama_params,
    load_opt_params,
)


def _logits(hf_model, ids):
    with torch.no_grad():
        return hf_model(torch.tensor(ids)).logits.float().numpy()


def test_llama_import_parity(tmp_path):
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rms_norm_eps=1e-5,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)

    cfg = config_from_hf(str(tmp_path))
    assert cfg.num_layers == 2 and cfg.num_kv_heads == 2
    params = load_llama_params(str(tmp_path), cfg, jnp.float32)

    ids = np.random.default_rng(0).integers(0, 256, (1, 16))
    expect = _logits(model, ids)
    got = np.asarray(get_arch("llama").forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, expect, rtol=2e-2, atol=2e-2)


def test_gpt2_import_parity(tmp_path):
    from transformers import GPT2Config, GPT2LMHeadModel

    hf_cfg = GPT2Config(
        vocab_size=256,
        n_positions=128,
        n_embd=128,
        n_layer=2,
        n_head=4,
    )
    torch.manual_seed(0)
    model = GPT2LMHeadModel(hf_cfg).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)

    cfg = ModelConfig(
        arch="gpt2",
        vocab_size=256,
        hidden_size=128,
        intermediate_size=512,
        num_layers=2,
        num_heads=4,
        num_kv_heads=4,
        head_dim=32,
        max_seq_len=128,
        tie_embeddings=True,
    )
    params = load_gpt2_params(str(tmp_path), cfg, jnp.float32)
    ids = np.random.default_rng(1).integers(0, 256, (1, 16))
    expect = _logits(model, ids)
    got = np.asarray(get_arch("gpt2").forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, expect, rtol=2e-2, atol=2e-2)


def test_opt_import_parity(tmp_path):
    from transformers import OPTConfig, OPTForCausalLM

    hf_cfg = OPTConfig(
        vocab_size=256,
        hidden_size=128,
        num_hidden_layers=2,
        ffn_dim=256,
        num_attention_heads=4,
        max_position_embeddings=128,
        do_layer_norm_before=True,
        word_embed_proj_dim=128,
    )
    torch.manual_seed(0)
    model = OPTForCausalLM(hf_cfg).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)

    cfg = ModelConfig(
        arch="opt",
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_layers=2,
        num_heads=4,
        num_kv_heads=4,
        head_dim=32,
        max_seq_len=128,
        tie_embeddings=True,
    )
    params = load_opt_params(str(tmp_path), cfg, jnp.float32)
    ids = np.random.default_rng(2).integers(0, 256, (1, 16))
    expect = _logits(model, ids)
    got = np.asarray(get_arch("opt").forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, expect, rtol=2e-2, atol=2e-2)
