"""OPT family: forward, quantization, cached-decode parity, benchmark."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from qtpu.bench import QuantizationBenchmark
from qtpu.calib import collect_calibration_stats
from qtpu.models import get_model_config
from qtpu.models.opt import forward, init_params
from qtpu.quant import quantize_model


@pytest.fixture(scope="module")
def setup():
    cfg = get_model_config("tiny-opt-test")
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
    assert stats.mean_abs["fc2_in"].shape == (
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
    ],
)
def test_quantize_opt(setup, method, mcfg):
    cfg, params, batches, stats = setup
    qp = quantize_model(params, method, mcfg, stats, arch="opt")
    logits = forward(qp, batches[0], cfg)
    assert bool(jnp.all(jnp.isfinite(logits)))
    assert not bool(
        jnp.allclose(qp["layers"]["fc1"]["w"], params["layers"]["fc1"]["w"])
    )


def test_opt_cached_decode_matches_forward(setup):
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
    toks, _ = greedy_generate(params, prompt, cache, cfg, n_tokens=4, arch="opt")
    assert list(np.asarray(toks[0])) == expect


def test_opt_benchmark_end_to_end():
    cfg = {
        "model_name": "tiny-opt-test",
        "quantization_methods": ["rtn", "gptq"],
        "calibration_dataset": "synthetic",
        "test_dataset": "synthetic",
        "n_calibration_samples": 3,
        "calibration_block_size": 64,
        "n_test_samples": 2,
        "test_block_size": 128,
        "quantization_config": {
            "rtn": {"w_bit": 8, "q_group_size": 64},
            "gptq": {"w_bit": 4, "q_group_size": 64, "error_compensation": False},
        },
        "verbose": False,
    }
    bench = QuantizationBenchmark(cfg)
    bench.run_all_benchmarks()
    for name in ("raw", "rtn", "gptq"):
        assert bench.results[name].is_success(), bench.results[name].error
