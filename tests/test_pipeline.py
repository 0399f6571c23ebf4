"""Pipeline parallelism (SURVEY §2.3 P3): GPipe-style microbatch schedule
over a `pipe` mesh axis, layers sharded by stage, activations moved with
ppermute. Equality-tested against the single-device NLL math on the
virtual CPU mesh (the multi-device-on-CPU strategy of SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from qtpu.models.config import TINY_TEST
from qtpu.models.llama import forward, init_params
from qtpu.quant.apply import pack_model
from qtpu.sharding.pipeline import (
    make_pipe_mesh,
    pipeline_nll,
    shard_params_pipeline,
)

CFG = TINY_TEST  # 2 layers → 2 stages


def _reference_nll(params, batches, cfg, qmeta=None):
    """Single-device shifted-CE × block per microbatch (the reference ppl
    math, quantization_utils.py:309-318)."""
    out = []
    for ids in batches:
        logits = forward(params, ids, cfg, qmeta=qmeta).astype(jnp.float32)
        lp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        ll = jnp.take_along_axis(lp, ids[:, 1:][..., None], axis=-1)[..., 0]
        out.append(-jnp.mean(ll) * ids.shape[1])
    return jnp.stack(out)


@pytest.mark.parametrize("n_stages", [2])
def test_pipeline_nll_matches_single_device(n_stages):
    params = init_params(CFG, jax.random.PRNGKey(0))
    M, b, S = 4, 2, 32
    batches = jax.random.randint(
        jax.random.PRNGKey(1), (M, b, S), 0, CFG.vocab_size
    )
    want = np.asarray(_reference_nll(params, batches, CFG))

    mesh = make_pipe_mesh(pipe=n_stages, data=1)
    sp = shard_params_pipeline(params, mesh)
    got = np.asarray(pipeline_nll(sp, batches, CFG, mesh, n_stages))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_pipeline_nll_packed():
    """Pipeline over PACKED (W4) layer params: the fused-dequant path runs
    inside each stage's local scan."""
    params = init_params(CFG, jax.random.PRNGKey(2))
    packed, qmeta = pack_model(
        params, "rtn", {"w_bit": 4, "q_group_size": 64}
    )
    M, b, S = 2, 1, 32
    batches = jax.random.randint(
        jax.random.PRNGKey(3), (M, b, S), 0, CFG.vocab_size
    )
    want = np.asarray(_reference_nll(packed, batches, CFG, qmeta=qmeta))
    mesh = make_pipe_mesh(pipe=2)
    sp = shard_params_pipeline(packed, mesh)
    got = np.asarray(pipeline_nll(sp, batches, CFG, mesh, 2, qmeta=qmeta))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_evaluate_perplexity_routes_to_pipeline():
    """evaluate_perplexity(mesh with pipe axis) == single-device ppl —
    the config-driven product path (VERDICT r2 task #4)."""
    from qtpu.eval.perplexity import evaluate_perplexity

    params = init_params(CFG, jax.random.PRNGKey(4))
    ids = jax.random.randint(jax.random.PRNGKey(5), (1, 4 * 32), 0, CFG.vocab_size)
    want = evaluate_perplexity(params, ids, CFG, n_samples=4, block_size=32)
    mesh = make_pipe_mesh(pipe=2)
    sp = shard_params_pipeline(params, mesh)
    got = evaluate_perplexity(
        sp, ids, CFG, n_samples=4, block_size=32, mesh=mesh
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_runner_pipe_mesh_config():
    """End-to-end: config {"mesh": {"pipe": 2}} drives a pipelined raw
    eval through QuantizationBenchmark with the same ppl as single-device."""
    from qtpu.bench.runner import QuantizationBenchmark

    base = {
        "model_name": "tiny-test",
        "quantization_methods": [],
        "calibration_dataset": "synthetic",
        "test_dataset": "synthetic",
        "n_calibration_samples": 2,
        "calibration_block_size": 32,
        "n_test_samples": 4,
        "test_block_size": 32,
        "verbose": False,
    }
    single = QuantizationBenchmark(dict(base))
    single.setup()
    r0 = single.benchmark_raw_model()
    piped = QuantizationBenchmark(dict(base, mesh={"pipe": 2}))
    piped.setup()
    assert piped.mesh is not None and piped.mesh.shape["pipe"] == 2
    r1 = piped.benchmark_raw_model()
    assert r0.error is None and r1.error is None
    np.testing.assert_allclose(r1.perplexity, r0.perplexity, rtol=2e-3)


def test_pipeline_rejects_unsupported_arch():
    params = init_params(CFG, jax.random.PRNGKey(0))
    mesh = make_pipe_mesh(pipe=2)
    sp = shard_params_pipeline(params, mesh)
    batches = jnp.zeros((2, 1, 16), jnp.int32)
    with pytest.raises(NotImplementedError):
        pipeline_nll(sp, batches, CFG, mesh, 2, arch="gpt2")
