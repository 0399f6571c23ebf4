"""GPT-2 family: forward, capture, quantization and benchmark wiring."""

import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from qtpu.bench import QuantizationBenchmark
from qtpu.calib import collect_calibration_stats
from qtpu.models import get_model_config
from qtpu.models.gpt2 import forward, init_params
from qtpu.quant import quantize_model


@pytest.fixture(scope="module")
def setup():
    cfg = get_model_config("tiny-gpt2-test")
    params = init_params(cfg, jax.random.PRNGKey(0))
    batches = [
        jax.random.randint(jax.random.PRNGKey(i), (1, 64), 0, cfg.vocab_size)
        for i in range(3)
    ]
    stats = collect_calibration_stats(forward, params, batches, cfg)
    return cfg, params, batches, stats


def test_forward_and_capture(setup):
    cfg, params, batches, stats = setup
    logits = forward(params, batches[0], cfg)
    assert logits.shape == (1, 64, cfg.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))
    assert stats.mean_abs["attn_in"].shape == (3, cfg.num_layers, cfg.hidden_size)
    assert stats.mean_abs["proj_in"].shape == (
        3,
        cfg.num_layers,
        cfg.intermediate_size,
    )


@pytest.mark.parametrize(
    "method,mcfg",
    [
        ("rtn", {"w_bit": 8, "q_group_size": 64}),
        ("awq", {"w_bit": 4, "q_group_size": 64, "protect_ratio": 0.01, "scale_factor": 2.0}),
        ("smoothquant", {"w_bit": 8, "q_group_size": 64, "alpha": 0.5}),
        ("gptq", {"w_bit": 4, "q_group_size": 64, "error_compensation": False}),
        ("pot", {"w_bit": 8, "q_group_size": 64, "grid_step": 0.2}),
    ],
)
def test_quantize_gpt2(setup, method, mcfg):
    cfg, params, batches, stats = setup
    qp = quantize_model(params, method, mcfg, stats, arch="gpt2")
    logits = forward(qp, batches[0], cfg)
    assert bool(jnp.all(jnp.isfinite(logits)))
    assert not bool(
        jnp.allclose(qp["layers"]["c_attn"]["w"], params["layers"]["c_attn"]["w"])
    )
    # biases must survive quantization untouched
    assert bool(
        jnp.allclose(qp["layers"]["c_attn"]["b"], params["layers"]["c_attn"]["b"])
    )


def test_gpt2_benchmark_end_to_end(tmp_path):
    cfg = {
        "model_name": "tiny-gpt2-test",
        "quantization_methods": ["rtn", "awq"],
        "calibration_dataset": "synthetic",
        "test_dataset": "synthetic",
        "n_calibration_samples": 3,
        "calibration_block_size": 64,
        "n_test_samples": 2,
        "test_block_size": 128,
        "quantization_config": {
            "rtn": {"w_bit": 8, "q_group_size": 64},
            "awq": {"w_bit": 4, "q_group_size": 64, "protect_ratio": 0.01, "scale_factor": 2.0},
        },
        "verbose": False,
    }
    bench = QuantizationBenchmark(cfg)
    bench.run_all_benchmarks()
    for name in ("raw", "rtn", "awq"):
        assert bench.results[name].is_success(), bench.results[name].error


def test_gpt2_cached_decode_matches_forward(setup):
    """GPT-2 cached greedy decode must equal teacher-forced argmax."""
    import numpy as np

    from qtpu.serve import init_cache
    from qtpu.serve.decode import greedy_generate

    cfg, params, batches, _ = setup
    prompt = batches[0][:, :8]
    ids = list(np.asarray(prompt).reshape(-1))
    expect = []
    for _ in range(4):
        logits = forward(params, jnp.asarray([ids]), cfg)
        tok = int(jnp.argmax(logits[0, -1]))
        expect.append(tok)
        ids.append(tok)
    cache = init_cache(cfg, 1, 64)
    toks, _ = greedy_generate(
        params, prompt, cache, cfg, n_tokens=4, arch="gpt2"
    )
    assert list(np.asarray(toks[0])) == expect
