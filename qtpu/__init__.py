"""qtpu — TPU-native LLM post-training-quantization framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the
reference PyTorch PTQ benchmarking framework (vimarsh244/llm-quantization):
five quantization schemes (AWQ, GPTQ, POT, APOT, SmoothQuant), calibration
statistics collection, perplexity evaluation, model-size accounting and a
config-driven benchmark orchestrator — plus what the reference only
simulates: real packed INT4/INT8 weight storage with fused dequant-matmul
Pallas kernels, an INT8 KV-cache serving path with continuous batching, and
multi-host tensor/data-sharded operation over a TPU mesh.

Design stance (see SURVEY.md §7.1): models are pure functions over pytrees;
"quantize the model" is a pytree→pytree transformation; calibration hooks
are explicitly returned forward intermediates; per-layer loops are
vmapped/scanned; grid searches are vmapped candidate axes reduced with
argmin.
"""

__version__ = "0.1.0"

from qtpu.core import packing, sizing  # noqa: F401
from qtpu.configs import load_config, save_config  # noqa: F401
