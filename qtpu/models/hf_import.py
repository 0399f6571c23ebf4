"""HF checkpoint import (reference C3, quantization_utils.py:48-89).

Maps a local HuggingFace Llama-family checkpoint (safetensors or torch
.bin) into qtpu's stacked-layer pytree. This container has no network
egress, so unlike the reference's from_pretrained(model_name) this takes a
LOCAL directory; the name→tensor mapping covers the
LlamaForCausalLM layout used by TinyLlama/Llama-2/Llama-3, plus its
Mistral (sliding window) and Qwen2 (q/k/v bias) variants.

Note orientation: HF linear weights are [out, in]; qtpu stores [in, out],
so every projection is transposed on import.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from qtpu.models.config import ModelConfig


def _load_state_dict(ckpt_dir: str) -> dict:
    """Load all tensors from safetensors shards or torch bins, as numpy."""
    d = Path(ckpt_dir)
    tensors = {}
    st_files = sorted(d.glob("*.safetensors"))
    if st_files:
        from safetensors.numpy import load_file

        for f in st_files:
            tensors.update(load_file(str(f)))
        return tensors
    bin_files = sorted(d.glob("pytorch_model*.bin"))
    if bin_files:
        import torch

        for f in bin_files:
            sd = torch.load(str(f), map_location="cpu", weights_only=True)
            for k, v in sd.items():
                tensors[k] = v.float().numpy()
        return tensors
    raise FileNotFoundError(f"no safetensors/bin checkpoints in {ckpt_dir}")


def config_from_hf(ckpt_dir: str) -> ModelConfig:
    """Build a ModelConfig from a local HF config.json.

    model_type "llama"/"mistral"/"qwen2" all map onto qtpu's llama arch:
    Mistral is Llama + sliding-window attention, Qwen2 is Llama + q/k/v
    bias (+ optional sliding window, off by default in HF configs).
    "mixtral" maps onto the moe arch (llama attention + routed experts)."""
    with open(os.path.join(ckpt_dir, "config.json")) as f:
        hf = json.load(f)
    mt = hf.get("model_type", "llama")
    if mt not in ("llama", "mistral", "qwen2", "mixtral", "qwen2_moe"):
        raise ValueError(
            f"config_from_hf handles llama-family checkpoints, got "
            f"model_type={mt!r} (use load_gpt2_params/load_opt_params "
            "with an explicit ModelConfig for gpt2/opt)"
        )
    # some configs carry an explicit "head_dim": null — `or` covers both
    # absent and null
    head_dim = (
        hf.get("head_dim") or hf["hidden_size"] // hf["num_attention_heads"]
    )
    # HF semantics: Mistral applies the window iff sliding_window is not
    # null; Qwen2 additionally gates it behind use_sliding_window.
    sw = hf.get("sliding_window")
    if mt in ("qwen2", "qwen2_moe") and not hf.get("use_sliding_window", False):
        sw = None
    if mt == "llama":
        sw = None
    moe = mt in ("mixtral", "qwen2_moe")
    # Qwen2-MoE: routed experts use moe_intermediate_size; num_experts is
    # the qwen2_moe key, num_local_experts the mixtral key
    inter = (
        hf.get("moe_intermediate_size", hf["intermediate_size"])
        if mt == "qwen2_moe"
        else hf["intermediate_size"]
    )
    return ModelConfig(
        arch="moe" if moe else "llama",
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=inter,
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        num_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        head_dim=head_dim,
        rope_theta=hf.get("rope_theta", 10000.0),
        norm_eps=hf.get("rms_norm_eps", 1e-5),
        max_seq_len=hf.get("max_position_embeddings", 2048),
        tie_embeddings=hf.get("tie_word_embeddings", False),
        attention_bias=bool(
            hf.get("attention_bias", mt in ("qwen2", "qwen2_moe"))
        ),
        sliding_window=int(sw) if sw else 0,
        num_experts=int(
            hf.get("num_experts", hf.get("num_local_experts", 0))
        ),
        num_experts_per_tok=int(hf.get("num_experts_per_tok", 2)),
        norm_topk_prob=bool(hf.get("norm_topk_prob", mt == "mixtral")),
        shared_expert_intermediate_size=int(
            hf.get("shared_expert_intermediate_size", 0)
        ),
    )


def load_llama_params(
    ckpt_dir: str, cfg: ModelConfig, dtype=jnp.bfloat16
) -> dict:
    """HF LlamaForCausalLM state dict → qtpu stacked pytree."""
    sd = _load_state_dict(ckpt_dir)
    L = cfg.num_layers

    def get(name):
        return np.asarray(sd[name])

    def stack_T(fmt):
        # linear weights: HF [out, in] → qtpu [in, out], stacked over layers
        return jnp.asarray(
            np.stack([get(fmt.format(i)).T for i in range(L)]), dtype
        )

    def stack(fmt):
        return jnp.asarray(
            np.stack([get(fmt.format(i)) for i in range(L)]), dtype
        )

    prefix = "model.layers.{}."
    params = {
        "embed": jnp.asarray(get("model.embed_tokens.weight"), dtype),
        "layers": {
            "attn_norm": stack(prefix + "input_layernorm.weight"),
            "mlp_norm": stack(prefix + "post_attention_layernorm.weight"),
            "q_proj": {"w": stack_T(prefix + "self_attn.q_proj.weight")},
            "k_proj": {"w": stack_T(prefix + "self_attn.k_proj.weight")},
            "v_proj": {"w": stack_T(prefix + "self_attn.v_proj.weight")},
            "o_proj": {"w": stack_T(prefix + "self_attn.o_proj.weight")},
            "gate_proj": {"w": stack_T(prefix + "mlp.gate_proj.weight")},
            "up_proj": {"w": stack_T(prefix + "mlp.up_proj.weight")},
            "down_proj": {"w": stack_T(prefix + "mlp.down_proj.weight")},
        },
        "final_norm": jnp.asarray(get("model.norm.weight"), dtype),
    }
    # Qwen2: learned q/k/v bias (Llama/Mistral checkpoints have none)
    if "model.layers.0.self_attn.q_proj.bias" in sd:
        for site in ("q_proj", "k_proj", "v_proj"):
            params["layers"][site]["b"] = stack(
                prefix + f"self_attn.{site}.bias"
            )
    if cfg.tie_embeddings or "lm_head.weight" not in sd:
        params["lm_head"] = {"w": params["embed"].T}
    else:
        params["lm_head"] = {
            "w": jnp.asarray(get("lm_head.weight").T, dtype)
        }
    return params


def load_moe_params(ckpt_dir: str, cfg: ModelConfig, dtype=jnp.bfloat16) -> dict:
    """HF MixtralForCausalLM / Qwen2MoeForCausalLM state dict → qtpu moe
    pytree (router [L, D, E], experts stacked [L, E, ...]).

    Key styles: Mixtral `block_sparse_moe.gate` + `experts.{e}.w1/w3/w2`
    (w1=gate, w3=up, w2=down); Qwen2-MoE `mlp.gate` +
    `mlp.experts.{e}.gate_proj/up_proj/down_proj` plus the always-on
    `mlp.shared_expert.*` and its `mlp.shared_expert_gate`, and q/k/v
    biases."""
    sd = _load_state_dict(ckpt_dir)
    L, E = cfg.num_layers, cfg.num_experts
    qwen_style = "model.layers.0.mlp.gate.weight" in sd

    def get(name):
        return np.asarray(sd[name])

    def stack_T(fmt):
        return jnp.asarray(
            np.stack([get(fmt.format(i)).T for i in range(L)]), dtype
        )

    def stack(fmt):
        return jnp.asarray(
            np.stack([get(fmt.format(i)) for i in range(L)]), dtype
        )

    if qwen_style:
        moe_prefix = "mlp"
        names = {"gate": "gate_proj", "up": "up_proj", "down": "down_proj"}
    else:
        moe_prefix = "block_sparse_moe"
        names = {"gate": "w1", "up": "w3", "down": "w2"}

    def stack_experts(which):
        # [L, E, in, out] from per-expert [out, in] weights
        return jnp.asarray(
            np.stack(
                [
                    np.stack(
                        [
                            get(
                                f"model.layers.{i}.{moe_prefix}."
                                f"experts.{e}.{names[which]}.weight"
                            ).T
                            for e in range(E)
                        ]
                    )
                    for i in range(L)
                ]
            ),
            dtype,
        )

    prefix = "model.layers.{}."
    params = {
        "embed": jnp.asarray(get("model.embed_tokens.weight"), dtype),
        "layers": {
            "attn_norm": stack(prefix + "input_layernorm.weight"),
            "mlp_norm": stack(prefix + "post_attention_layernorm.weight"),
            "q_proj": {"w": stack_T(prefix + "self_attn.q_proj.weight")},
            "k_proj": {"w": stack_T(prefix + "self_attn.k_proj.weight")},
            "v_proj": {"w": stack_T(prefix + "self_attn.v_proj.weight")},
            "o_proj": {"w": stack_T(prefix + "self_attn.o_proj.weight")},
            "router": {"w": stack_T(prefix + f"{moe_prefix}.gate.weight")},
            "exp_gate": {"w": stack_experts("gate")},
            "exp_up": {"w": stack_experts("up")},
            "exp_down": {"w": stack_experts("down")},
        },
        "final_norm": jnp.asarray(get("model.norm.weight"), dtype),
    }
    if cfg.attention_bias:
        for site in ("q_proj", "k_proj", "v_proj"):
            params["layers"][site]["b"] = stack(
                prefix + f"self_attn.{site}.bias"
            )
    if cfg.shared_expert_intermediate_size > 0:
        params["layers"]["sh_gate"] = {
            "w": stack_T(prefix + "mlp.shared_expert.gate_proj.weight")
        }
        params["layers"]["sh_up"] = {
            "w": stack_T(prefix + "mlp.shared_expert.up_proj.weight")
        }
        params["layers"]["sh_down"] = {
            "w": stack_T(prefix + "mlp.shared_expert.down_proj.weight")
        }
        params["layers"]["sh_router"] = {
            "w": stack_T(prefix + "mlp.shared_expert_gate.weight")
        }
    if cfg.tie_embeddings or "lm_head.weight" not in sd:
        params["lm_head"] = {"w": params["embed"].T}
    else:
        params["lm_head"] = {"w": jnp.asarray(get("lm_head.weight").T, dtype)}
    return params


def load_gpt2_params(ckpt_dir: str, cfg: ModelConfig, dtype=jnp.bfloat16) -> dict:
    """HF GPT2LMHeadModel state dict → qtpu stacked pytree. GPT-2 uses
    Conv1D, whose weights are already [in, out] — no transpose."""
    sd = _load_state_dict(ckpt_dir)
    L = cfg.num_layers

    def get(name):
        return np.asarray(sd[name])

    def stack(fmt, transpose=False):
        arrs = [get(fmt.format(i)) for i in range(L)]
        if transpose:
            arrs = [a.T for a in arrs]
        return jnp.asarray(np.stack(arrs), dtype)

    pre = "h.{}." if "h.0.ln_1.weight" in sd else "transformer.h.{}."
    top = "" if "wte.weight" in sd else "transformer."
    embed = jnp.asarray(get(top + "wte.weight"), dtype)
    params = {
        "embed": embed,
        "pos_embed": jnp.asarray(get(top + "wpe.weight"), dtype),
        "layers": {
            "ln1_w": stack(pre + "ln_1.weight"),
            "ln1_b": stack(pre + "ln_1.bias"),
            "ln2_w": stack(pre + "ln_2.weight"),
            "ln2_b": stack(pre + "ln_2.bias"),
            "c_attn": {
                "w": stack(pre + "attn.c_attn.weight"),
                "b": stack(pre + "attn.c_attn.bias"),
            },
            "attn_out": {
                "w": stack(pre + "attn.c_proj.weight"),
                "b": stack(pre + "attn.c_proj.bias"),
            },
            "mlp_fc": {
                "w": stack(pre + "mlp.c_fc.weight"),
                "b": stack(pre + "mlp.c_fc.bias"),
            },
            "mlp_proj": {
                "w": stack(pre + "mlp.c_proj.weight"),
                "b": stack(pre + "mlp.c_proj.bias"),
            },
        },
        "final_norm_w": jnp.asarray(get(top + "ln_f.weight"), dtype),
        "final_norm_b": jnp.asarray(get(top + "ln_f.bias"), dtype),
        "lm_head": {"w": embed.T},
    }
    return params


def load_opt_params(ckpt_dir: str, cfg: ModelConfig, dtype=jnp.bfloat16) -> dict:
    """HF OPTForCausalLM state dict → qtpu stacked pytree (linears
    transposed [out,in]→[in,out])."""
    sd = _load_state_dict(ckpt_dir)
    L = cfg.num_layers

    def get(name):
        return np.asarray(sd[name])

    pre = (
        "model.decoder.layers.{}."
        if "model.decoder.layers.0.self_attn.q_proj.weight" in sd
        else "decoder.layers.{}."
    )
    top = "model.decoder." if "model.decoder.embed_tokens.weight" in sd else "decoder."

    def stack_T(fmt):
        return jnp.asarray(np.stack([get(fmt.format(i)).T for i in range(L)]), dtype)

    def stack(fmt):
        return jnp.asarray(np.stack([get(fmt.format(i)) for i in range(L)]), dtype)

    embed = jnp.asarray(get(top + "embed_tokens.weight"), dtype)
    params = {
        "embed": embed,
        "pos_embed": jnp.asarray(get(top + "embed_positions.weight"), dtype),
        "layers": {
            "ln1_w": stack(pre + "self_attn_layer_norm.weight"),
            "ln1_b": stack(pre + "self_attn_layer_norm.bias"),
            "ln2_w": stack(pre + "final_layer_norm.weight"),
            "ln2_b": stack(pre + "final_layer_norm.bias"),
            "q_proj": {
                "w": stack_T(pre + "self_attn.q_proj.weight"),
                "b": stack(pre + "self_attn.q_proj.bias"),
            },
            "k_proj": {
                "w": stack_T(pre + "self_attn.k_proj.weight"),
                "b": stack(pre + "self_attn.k_proj.bias"),
            },
            "v_proj": {
                "w": stack_T(pre + "self_attn.v_proj.weight"),
                "b": stack(pre + "self_attn.v_proj.bias"),
            },
            "out_proj": {
                "w": stack_T(pre + "self_attn.out_proj.weight"),
                "b": stack(pre + "self_attn.out_proj.bias"),
            },
            "fc1": {
                "w": stack_T(pre + "fc1.weight"),
                "b": stack(pre + "fc1.bias"),
            },
            "fc2": {
                "w": stack_T(pre + "fc2.weight"),
                "b": stack(pre + "fc2.bias"),
            },
        },
        "final_norm_w": jnp.asarray(get(top + "final_layer_norm.weight"), dtype),
        "final_norm_b": jnp.asarray(get(top + "final_layer_norm.bias"), dtype),
        "lm_head": {"w": embed.T},
    }
    return params


def load_checkpoint(ckpt_dir: str, cfg: ModelConfig | None = None, dtype=jnp.bfloat16):
    """(params, tokenizer) from a local checkpoint directory. Tokenizer is
    loaded with transformers if tokenizer files are present, else None."""
    if cfg is None:
        cfg = config_from_hf(ckpt_dir)
    loader = {
        "llama": load_llama_params,
        "moe": load_moe_params,
        "gpt2": load_gpt2_params,
        "opt": load_opt_params,
    }[cfg.arch]
    params = loader(ckpt_dir, cfg, dtype)
    tokenizer = None
    if os.path.exists(os.path.join(ckpt_dir, "tokenizer_config.json")) or os.path.exists(
        os.path.join(ckpt_dir, "tokenizer.model")
    ):
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(ckpt_dir, use_fast=False)
    return params, tokenizer
