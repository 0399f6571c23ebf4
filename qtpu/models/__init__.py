from qtpu.models.config import (  # noqa: F401
    ModelConfig,
    TINYLLAMA_1_1B,
    LLAMA2_7B,
    GPT2_SMALL,
    TINY_TEST,
    get_model_config,
)
from qtpu.models.llama import forward, init_params  # noqa: F401
