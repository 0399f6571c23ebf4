"""Framework wiring test (reference test_framework_imports,
test_quantization.py:221-260): every public module imports and exposes its
documented symbols."""

import importlib

import pytest

MODULES = {
    "qtpu.quant.rtn": ["pseudo_quantize", "symmetric_fake_quantize"],
    "qtpu.quant.awq": ["awq_quantize", "awq_search_scale_factor"],
    "qtpu.quant.gptq": [
        "gptq_quantize_layer",
        "gptq_prepare_factor",
        "gptq_column_sweep",
        "build_proxy_hessian",
    ],
    "qtpu.quant.pot": ["pot_quantize_tensor", "pot_quantize_codes", "pot_codebook"],
    "qtpu.quant.apot": [
        "apot_quantize_tensor",
        "apot_quantize_codes",
        "generate_apot_levels",
        "full_apot_codebook",
    ],
    "qtpu.quant.smoothquant": [
        "compute_smoothing_scales",
        "smooth_weights",
        "reverse_smoothing",
        "smoothquant_quantize",
        "search_alpha",
    ],
    "qtpu.quant.apply": ["quantize_model", "pack_model"],
    "qtpu.core.packing": [
        "pack_int4",
        "unpack_int4",
        "quantize_pack",
        "dequantize",
        "QuantizedTensor",
    ],
    "qtpu.core.sizing": ["get_model_size", "get_packed_size", "count_params"],
    "qtpu.calib.stats": ["CalibStats", "collect_calibration_stats"],
    "qtpu.calib.sharded": [
        "collect_calibration_stats_sharded",
        "psum_hessian_shardmap",
    ],
    "qtpu.eval.perplexity": ["evaluate_perplexity"],
    "qtpu.data.pipeline": [
        "get_calibration_dataset",
        "get_test_dataset",
        "prepare_calibration_samples",
    ],
    "qtpu.models.llama": ["forward", "forward_with_cache", "init_params"],
    "qtpu.models.gpt2": ["forward", "forward_with_cache", "init_params"],
    "qtpu.models.opt": ["forward", "forward_with_cache", "init_params"],
    "qtpu.models.moe": ["forward", "forward_with_cache", "init_params"],
    "qtpu.models.hf_import": [
        "load_llama_params",
        "load_gpt2_params",
        "load_opt_params",
        "load_checkpoint",
        "config_from_hf",
    ],
    "qtpu.serve.kvcache": ["KVCache", "init_cache", "quantize_kv"],
    "qtpu.serve.decode": ["prefill", "decode_step", "greedy_generate", "sample_token"],
    "qtpu.serve.batching": ["ContinuousBatcher", "Request"],
    "qtpu.kernels.dequant_matmul": ["quantized_matmul", "codebook_matmul"],
    "qtpu.kernels.pallas_dequant_matmul": [
        "pallas_quantized_matmul",
        "pallas_codebook_matmul",
    ],
    "qtpu.kernels.pallas_kv_attention": ["pallas_decode_attention"],
    "qtpu.kernels.pallas_flash_attention": ["pallas_flash_attention"],
    "qtpu.kernels.int8_matmul": ["w8a8_matmul", "quantize_activations"],
    "qtpu.sharding.mesh": ["make_mesh"],
    "qtpu.sharding.specs": ["param_specs", "shard_params"],
    "qtpu.sharding.multihost": ["initialize_multihost", "is_primary"],
    "qtpu.bench.runner": ["QuantizationBenchmark"],
    "qtpu.bench.results": ["BenchmarkResult"],
    "qtpu.bench.scaling": ["scaling_sweep", "decode_tokens_per_s"],
    "qtpu.ckpt.io": ["save_quantized", "load_quantized"],
    "qtpu.configs": ["load_config", "save_config", "setup_config", "list_presets"],
    "qtpu.native": ["pack_int4", "unpack_int4", "quantize_pack", "block_pack"],
    "qtpu.utils.timing": ["Timer", "timed", "timed_chain", "profile_trace"],
    "qtpu.utils.debug": ["assert_all_finite", "checked", "debug_nans"],
}


@pytest.mark.parametrize("module,symbols", MODULES.items())
def test_module_exposes(module, symbols):
    mod = importlib.import_module(module)
    for sym in symbols:
        assert hasattr(mod, sym), f"{module}.{sym} missing"
