from qtpu.models.config import (  # noqa: F401
    ModelConfig,
    TINYLLAMA_1_1B,
    LLAMA2_7B,
    GPT2_SMALL,
    TINY_TEST,
    get_model_config,
)
from qtpu.models.llama import forward, init_params  # noqa: F401


def get_arch(name: str):
    """Architecture module for a ModelConfig.arch value. Each module exposes
    forward, init_params, LAYER_SITES, SITE_OF_INPUT, INPUT_SITES."""
    if name == "llama":
        from qtpu.models import llama

        return llama
    if name == "gpt2":
        from qtpu.models import gpt2

        return gpt2
    if name == "opt":
        from qtpu.models import opt

        return opt
    if name == "moe":
        from qtpu.models import moe

        return moe
    raise KeyError(f"unknown arch '{name}'")
