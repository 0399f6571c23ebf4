"""Model configurations for qtpu's built-in decoder families."""

from __future__ import annotations

from dataclasses import dataclass, field, replace


@dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters for a causal decoder.

    arch:
      "llama" — RMSNorm, RoPE, GQA, SwiGLU (covers TinyLlama/Llama-2/3)
      "gpt2"  — LayerNorm+bias, learned positions, fused QKV, GELU MLP
    """

    arch: str = "llama"
    vocab_size: int = 32000
    hidden_size: int = 2048
    intermediate_size: int = 5632
    num_layers: int = 22
    num_heads: int = 32
    num_kv_heads: int = 4
    head_dim: int = 64
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    max_seq_len: int = 2048
    tie_embeddings: bool = False

    def replace(self, **kw) -> "ModelConfig":
        return replace(self, **kw)

    @property
    def q_dim(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim


# TinyLlama/TinyLlama_v1.1 (the reference's benchmark model, config.json:2)
TINYLLAMA_1_1B = ModelConfig(
    arch="llama",
    vocab_size=32000,
    hidden_size=2048,
    intermediate_size=5632,
    num_layers=22,
    num_heads=32,
    num_kv_heads=4,
    head_dim=64,
    rope_theta=10000.0,
    norm_eps=1e-5,
    max_seq_len=2048,
)

LLAMA2_7B = ModelConfig(
    arch="llama",
    vocab_size=32000,
    hidden_size=4096,
    intermediate_size=11008,
    num_layers=32,
    num_heads=32,
    num_kv_heads=32,
    head_dim=128,
    rope_theta=10000.0,
    norm_eps=1e-5,
    max_seq_len=4096,
)

LLAMA2_70B = ModelConfig(
    arch="llama",
    vocab_size=32000,
    hidden_size=8192,
    intermediate_size=28672,
    num_layers=80,
    num_heads=64,
    num_kv_heads=8,
    head_dim=128,
    rope_theta=10000.0,
    norm_eps=1e-5,
    max_seq_len=4096,
)

OPT_125M = ModelConfig(
    arch="opt",
    vocab_size=50272,
    hidden_size=768,
    intermediate_size=3072,
    num_layers=12,
    num_heads=12,
    num_kv_heads=12,
    head_dim=64,
    norm_eps=1e-5,
    max_seq_len=2048,
    tie_embeddings=True,
)

GPT2_SMALL = ModelConfig(
    arch="gpt2",
    vocab_size=50257,
    hidden_size=768,
    intermediate_size=3072,
    num_layers=12,
    num_heads=12,
    num_kv_heads=12,
    head_dim=64,
    norm_eps=1e-5,
    max_seq_len=1024,
    tie_embeddings=True,
)

TINY_OPT_TEST = ModelConfig(
    arch="opt",
    vocab_size=512,
    hidden_size=256,
    intermediate_size=512,
    num_layers=2,
    num_heads=4,
    num_kv_heads=4,
    head_dim=64,
    max_seq_len=512,
    tie_embeddings=True,
)

TINY_GPT2_TEST = ModelConfig(
    arch="gpt2",
    vocab_size=512,
    hidden_size=256,
    intermediate_size=512,
    num_layers=2,
    num_heads=4,
    num_kv_heads=4,
    head_dim=64,
    max_seq_len=512,
    tie_embeddings=True,
)

# Tiny test configs (CPU-fast, dims kept multiples of 128 for group tests)
TINY_TEST = ModelConfig(
    arch="llama",
    vocab_size=512,
    hidden_size=256,
    intermediate_size=512,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=64,
    max_seq_len=512,
)

PRESET_MODELS = {
    "tinyllama": TINYLLAMA_1_1B,
    "TinyLlama/TinyLlama_v1.1": TINYLLAMA_1_1B,
    "tinyllama-random": TINYLLAMA_1_1B,
    "llama2-7b": LLAMA2_7B,
    "llama2-70b": LLAMA2_70B,
    "gpt2": GPT2_SMALL,
    "gpt2-random": GPT2_SMALL,
    "opt-125m": OPT_125M,
    "facebook/opt-125m": OPT_125M,
    "tiny-test": TINY_TEST,
    "tiny-gpt2-test": TINY_GPT2_TEST,
    "tiny-opt-test": TINY_OPT_TEST,
}


def get_model_config(name: str) -> ModelConfig:
    if name in PRESET_MODELS:
        return PRESET_MODELS[name]
    raise KeyError(
        f"unknown model '{name}'; presets: {sorted(PRESET_MODELS)}"
    )
