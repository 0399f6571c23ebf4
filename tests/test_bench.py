"""Orchestrator + eval + config tests (reference test_model_size :115-139,
test_config_loading :142-165, plus results-schema checks)."""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from qtpu.bench import QuantizationBenchmark
from qtpu.configs import default_config, list_presets, setup_config, validate_config
from qtpu.core.dtypes import MiB
from qtpu.core.sizing import count_params, get_model_size

TINY_BENCH_CONFIG = {
    "model_name": "tiny-test",
    "quantization_methods": ["rtn", "awq", "pot", "smoothquant"],
    "calibration_dataset": "synthetic",
    "test_dataset": "synthetic",
    "n_calibration_samples": 4,
    "calibration_block_size": 64,
    "n_test_samples": 3,
    "test_block_size": 128,
    "quantization_config": {
        "rtn": {"w_bit": 8, "q_group_size": 64},
        "awq": {
            "w_bit": 4,
            "q_group_size": 64,
            "protect_ratio": 0.01,
            "scale_factor": 2.0,
        },
        "pot": {"w_bit": 8, "q_group_size": 64, "grid_step": 0.2},
        "smoothquant": {"w_bit": 8, "q_group_size": 64, "alpha": 0.5},
    },
    "packed_eval": True,
    "verbose": False,
}


@pytest.fixture(scope="module")
def bench_run(tmp_path_factory):
    bench = QuantizationBenchmark(dict(TINY_BENCH_CONFIG))
    bench.run_all_benchmarks()
    out = tmp_path_factory.mktemp("results") / "results.json"
    bench.save_results(str(out))
    return bench, json.loads(out.read_text())


def test_all_methods_succeed(bench_run):
    bench, saved = bench_run
    for name in ["raw", "rtn", "awq", "pot", "smoothquant"]:
        assert name in bench.results
        assert bench.results[name].is_success(), bench.results[name].error


def test_results_schema_matches_reference(bench_run):
    """Field-for-field parity with the reference JSON layout
    (benchmark_results.json:1-89)."""
    _, saved = bench_run
    assert set(saved.keys()) >= {"timestamp", "config", "results"}
    for name, rec in saved["results"].items():
        assert {
            "method",
            "perplexity",
            "model_size_mb",
            "model_size_bits",
            "bits_per_byte",
            "runtime_seconds",
            "error",
            "config",
        } <= set(rec.keys())
        assert rec["error"] is None
        assert rec["perplexity"] > 1.0


def test_quantized_smaller_than_raw(bench_run):
    """Reference test_model_size: 4-bit size < fp32 size, sane ratios."""
    bench, saved = bench_run
    raw = saved["results"]["raw"]
    awq = saved["results"]["awq"]
    assert awq["model_size_mb"] < raw["model_size_mb"]
    # raw accounted at fp32 over bf16 storage → bits_per_byte 16
    assert raw["bits_per_byte"] == pytest.approx(16.0)
    # awq W4 g64: 4 + 16/64 + 4/64 bits / 2 bytes
    assert awq["bits_per_byte"] == pytest.approx((4 + 20 / 64) / 2)


def test_size_accounting_formula():
    """get_model_size parity with quantization_utils.py:329-355."""
    params = {"a": np.zeros((10, 20)), "b": np.zeros(5)}
    n = count_params(params)
    assert n == 205
    assert get_model_size(params, 16, -1) == n * 16
    assert get_model_size(params, 4, 128, True) == n * (4 + 16 / 128 + 4 / 128)
    assert get_model_size(params, 4, 128, False) == n * (4 + 16 / 128)
    assert get_model_size(params, 8, 64, True) == n * (8 + 20 / 64)


def test_mib_constant():
    assert MiB == 1024 * 1024 * 8  # bits, reference quantization_utils.py:38-41


def test_config_defaults_and_validation():
    cfg = validate_config({"model_name": "tiny-test"})
    for key in ("quantization_methods", "quantization_config", "mesh"):
        assert key in cfg
    for m in cfg["quantization_methods"]:
        assert m in cfg["quantization_config"]


def test_presets(tmp_path):
    names = list_presets()
    assert {"quick_test", "comprehensive_benchmark", "extreme_compression"} <= set(
        names
    )
    out = tmp_path / "c.json"
    cfg = setup_config("quick_test", str(out))
    assert out.exists()
    assert "description" not in cfg
    loaded = json.loads(out.read_text())
    assert loaded["model_name"] == cfg["model_name"]


def test_default_config_complete():
    cfg = default_config()
    for m in ("awq", "gptq", "pot", "apot", "smoothquant"):
        assert m in cfg["quantization_config"]
        assert "w_bit" in cfg["quantization_config"][m]


def test_serving_benchmark_phase():
    """The serving-throughput phase records tokens/s in the results JSON."""
    cfg = dict(TINY_BENCH_CONFIG)
    cfg["quantization_methods"] = ["rtn"]
    cfg["quantization_config"] = {"rtn": {"w_bit": 4, "q_group_size": 64}}
    cfg["serving"] = {
        "benchmark": True,
        "pack_method": "rtn",
        "max_batch_size": 2,
        "kv_cache_dtype": "int8",
    }
    bench = QuantizationBenchmark(cfg)
    bench.run_all_benchmarks()
    sv = bench.results["serving"]
    assert sv.is_success(), sv.error
    assert sv.tokens_per_second is not None and sv.tokens_per_second > 0
    assert "tokens_per_second" in sv.to_dict()


def test_save_artifacts_flow(tmp_path):
    """Benchmark → packed artifact → reload → serve: the calibrate-once
    serve-many lifecycle (SURVEY §5.4)."""
    import jax
    import jax.numpy as jnp

    from qtpu.ckpt import load_quantized
    from qtpu.models import get_model_config
    from qtpu.models.llama import forward

    cfg = dict(TINY_BENCH_CONFIG)
    cfg["quantization_methods"] = ["awq"]
    cfg["quantization_config"] = {
        "awq": {"w_bit": 4, "q_group_size": 64, "protect_ratio": 0.01, "scale_factor": 2.0}
    }
    cfg["save_artifacts"] = {"dir": str(tmp_path / "art"), "method": "awq"}
    bench = QuantizationBenchmark(cfg)
    bench.run_all_benchmarks()
    params, qmeta, meta = load_quantized(tmp_path / "art")
    assert meta["method"] == "awq"
    mc = get_model_config("tiny-test")
    ids = jax.random.randint(jax.random.PRNGKey(0), (1, 32), 0, mc.vocab_size)
    logits = forward(params, ids, mc, qmeta=qmeta)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_results_record_environment(tmp_path):
    cfg = dict(TINY_BENCH_CONFIG)
    cfg["quantization_methods"] = ["rtn"]
    cfg["quantization_config"] = {"rtn": {"w_bit": 8, "q_group_size": 64}}
    bench = QuantizationBenchmark(cfg)
    bench.run_all_benchmarks()
    out = tmp_path / "r.json"
    bench.save_results(str(out))
    rec = json.loads(out.read_text())
    assert rec["environment"]["backend"] in ("cpu", "tpu")
    assert rec["environment"]["jax_version"]


def test_packed_eval_column(bench_run):
    """"packed_eval": true records the really-packed serving artifact's
    perplexity next to the fake-quant number (packed-vs-fake audit). For
    RTN-family methods the packed path is the same math as fake-quant, so
    the two perplexities must agree closely; pot@w8 has no packed form
    (codebook packing is 4-bit) and must record packed_error instead of
    failing the run."""
    bench, saved = bench_run
    for name in ("rtn", "awq", "smoothquant"):
        r = bench.results[name]
        assert r.packed_perplexity is not None, name
        assert (
            abs(r.packed_perplexity - r.perplexity) / r.perplexity < 0.05
        ), (name, r.packed_perplexity, r.perplexity)
        assert "packed_perplexity" in saved["results"][name], name
    assert bench.results["pot"].packed_error is not None
