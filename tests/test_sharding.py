"""Multi-device tests on the 8-way virtual CPU mesh: sharded forward equals
single-device forward (the multi-device story the reference lacks,
SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtpu.models import TINY_TEST, forward, init_params
from qtpu.quant.apply import pack_model
from qtpu.sharding import make_mesh, shard_params
from jax.sharding import NamedSharding, PartitionSpec as P

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def setup():
    cfg = TINY_TEST
    params = init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 64), 0, cfg.vocab_size)
    return cfg, params, ids


def test_mesh_shapes():
    mesh = make_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh(model=2)
    assert mesh.shape == {"data": 4, "model": 2}


@pytest.mark.parametrize("dp,tp", [(4, 2), (2, 2), (8, 1)])
def test_sharded_forward_matches_single_device(setup, dp, tp):
    cfg, params, ids = setup
    expect = np.asarray(forward(params, ids, cfg))

    mesh = make_mesh(data=dp, model=tp)
    p_sh = shard_params(params, mesh)
    ids_sh = jax.device_put(ids, NamedSharding(mesh, P("data", None)))
    with jax.sharding.set_mesh(mesh):
        got = np.asarray(forward(p_sh, ids_sh, cfg))
    np.testing.assert_allclose(got, expect, rtol=2e-2, atol=2e-2)


def test_sharded_packed_forward(setup):
    cfg, params, ids = setup
    packed, qmeta = pack_model(params, "rtn", {"w_bit": 4, "q_group_size": 64})
    expect = np.asarray(forward(packed, ids, cfg, qmeta=qmeta))

    mesh = make_mesh(data=2, model=2)
    p_sh = shard_params(packed, mesh)
    ids_sh = jax.device_put(ids, NamedSharding(mesh, P("data", None)))
    with jax.sharding.set_mesh(mesh):
        got = np.asarray(forward(p_sh, ids_sh, cfg, qmeta=qmeta))
    np.testing.assert_allclose(got, expect, rtol=2e-2, atol=2e-2)


def test_sharded_actorder_packed_forward(setup):
    """GPTQ actorder_shards=2 under a 2-way model mesh: the serve-time
    perm gather stays shard-local, so the sharded packed forward equals
    the single-device one (VERDICT r2 task #8)."""
    from qtpu.calib.stats import collect_calibration_stats

    cfg, params, ids = setup
    batches = [
        jax.random.randint(jax.random.PRNGKey(40 + i), (1, 32), 0, cfg.vocab_size)
        for i in range(2)
    ]
    stats = collect_calibration_stats(forward, params, batches, cfg)
    packed, qmeta = pack_model(
        params,
        "gptq",
        {"w_bit": 4, "q_group_size": 64, "actorder": True,
         "actorder_shards": 2, "nsamples": 8},
        stats,
    )
    expect = np.asarray(forward(packed, ids, cfg, qmeta=qmeta))
    mesh = make_mesh(data=2, model=2)
    p_sh = shard_params(packed, mesh)
    ids_sh = jax.device_put(ids, NamedSharding(mesh, P("data", None)))
    with jax.sharding.set_mesh(mesh):
        got = np.asarray(forward(p_sh, ids_sh, cfg, qmeta=qmeta))
    np.testing.assert_allclose(got, expect, rtol=2e-2, atol=2e-2)


def test_gptq_export_support_matrix():
    """check_packed_export is the single gate for the packed-export knob
    matrix (qtpu.quant.gptq docstring)."""
    from qtpu.quant.gptq import check_packed_export

    # effective blocksize aligns up to the group
    assert check_packed_export(4, 64, 32, False, 1, 256) == 64
    assert check_packed_export(8, 128, 256, True, 2, 256) == 256
    with pytest.raises(ValueError, match="w_bit"):
        check_packed_export(3, 64, 64, False, 1, 256)
    with pytest.raises(ValueError, match="q_group_size"):
        check_packed_export(4, -1, 64, False, 1, 256)
    with pytest.raises(ValueError, match="divide K"):
        check_packed_export(4, 96, 96, False, 1, 256)
    with pytest.raises(ValueError, match="error_compensation"):
        check_packed_export(4, 64, 64, False, 1, 256, error_compensation=False)
    with pytest.raises(ValueError, match="shard"):
        check_packed_export(4, 64, 64, True, 3, 256)
    # shards only constrain when actorder is on
    assert check_packed_export(4, 64, 64, False, 3, 256) == 64


def test_sharded_packed_decode(setup):
    """TP+DP serving: prefill + decode steps with sharded fused-packed
    params must match the single-device cached path (SURVEY §5.8 — the
    scaling story the reference lacks, applied to the serving path)."""
    from qtpu.quant.apply import fuse_packed_sites
    from qtpu.serve import init_cache
    from qtpu.serve.decode import decode_step, prefill

    cfg, params, ids = setup
    packed, qmeta = pack_model(params, "rtn", {"w_bit": 4, "q_group_size": 64})
    packed, qmeta = fuse_packed_sites(packed, qmeta)
    prompt = ids[:4, :16]

    def run(p):
        cache = init_cache(cfg, 4, 32)
        logits, cache = prefill(p, prompt, cache, cfg, qmeta=qmeta)
        outs = [np.asarray(logits)]
        tok = jnp.argmax(logits, axis=-1)
        pos = jnp.full((4,), prompt.shape[1], jnp.int32)
        for _ in range(3):
            logits, cache = decode_step(p, tok, pos, cache, cfg, qmeta=qmeta)
            outs.append(np.asarray(logits))
            tok = jnp.argmax(logits, axis=-1)
            pos = pos + 1
        return outs

    expect = run(packed)
    mesh = make_mesh(data=2, model=2)
    p_sh = shard_params(packed, mesh)
    with jax.sharding.set_mesh(mesh):
        got = run(p_sh)
    for e, g in zip(expect, got):
        np.testing.assert_allclose(g, e, rtol=2e-2, atol=2e-2)


def test_data_parallel_calibration_stats(setup):
    """Stats from a sharded batch must equal single-device stats: the psum
    over the data axis is exact for XᵀX and mean-abs sums."""
    cfg, params, _ = setup
    ids = jax.random.randint(jax.random.PRNGKey(3), (8, 64), 0, cfg.vocab_size)
    _, stats1 = forward(params, ids, cfg, capture="stats")

    mesh = make_mesh(data=8, model=1)
    p_sh = shard_params(params, mesh)
    ids_sh = jax.device_put(ids, NamedSharding(mesh, P("data", None)))
    with jax.sharding.set_mesh(mesh):
        _, stats8 = forward(p_sh, ids_sh, cfg, capture="stats")
    a = np.asarray(stats1["attn_in"]["mean_abs"])
    b = np.asarray(stats8["attn_in"]["mean_abs"])
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=1e-4)


def test_sharded_perplexity_matches_serial(setup):
    """Block-parallel eval over the data axis == serial eval (blocks are
    independent; SURVEY §5.7)."""
    import numpy as np

    from qtpu.eval import evaluate_perplexity

    cfg, params, _ = setup
    stream = np.random.default_rng(0).integers(
        0, cfg.vocab_size, (1, 6 * 64), dtype=np.int32
    )
    serial = evaluate_perplexity(params, stream, cfg, n_samples=6, block_size=64)
    mesh = make_mesh(data=4, model=2)
    sharded = evaluate_perplexity(
        params, stream, cfg, n_samples=6, block_size=64, mesh=mesh
    )
    assert abs(sharded - serial) / serial < 0.02, (sharded, serial)


@pytest.mark.parametrize("arch_name,model", [("gpt2", "tiny-gpt2-test"), ("opt", "tiny-opt-test")])
def test_sharded_forward_other_archs(arch_name, model):
    """Arch-generic TP specs: gpt2/opt sharded forwards match single-device."""
    from qtpu.models import get_arch, get_model_config

    arch = get_arch(arch_name)
    cfg = get_model_config(model)
    params = arch.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 64), 0, cfg.vocab_size)
    expect = np.asarray(arch.forward(params, ids, cfg))
    mesh = make_mesh(data=2, model=2)
    p_sh = shard_params(params, mesh, arch=arch_name)
    ids_sh = jax.device_put(ids, NamedSharding(mesh, P("data", None)))
    with jax.sharding.set_mesh(mesh):
        got = np.asarray(arch.forward(p_sh, ids_sh, cfg))
    np.testing.assert_allclose(got, expect, rtol=3e-2, atol=3e-2)


def test_runner_mesh_config():
    """config["mesh"] drives a sharded benchmark end-to-end."""
    from qtpu.bench import QuantizationBenchmark

    cfg = {
        "model_name": "tiny-test",
        "quantization_methods": ["awq"],
        "calibration_dataset": "synthetic",
        "test_dataset": "synthetic",
        "n_calibration_samples": 4,
        "calibration_block_size": 64,
        "n_test_samples": 4,
        "test_block_size": 64,
        "quantization_config": {
            "awq": {"w_bit": 4, "q_group_size": 64, "protect_ratio": 0.01, "scale_factor": 2.0}
        },
        "mesh": {"data": 4, "model": 2},
        "verbose": False,
    }
    bench = QuantizationBenchmark(cfg)
    bench.run_all_benchmarks()
    assert bench.mesh is not None and bench.mesh.shape == {"data": 4, "model": 2}
    assert bench.results["raw"].is_success(), bench.results["raw"].error
    assert bench.results["awq"].is_success(), bench.results["awq"].error


def test_runner_bitwidth_sweep():
    """w_bit given as a list sweeps and records method@wN results."""
    from qtpu.bench import QuantizationBenchmark

    cfg = {
        "model_name": "tiny-test",
        "quantization_methods": ["rtn"],
        "calibration_dataset": "synthetic",
        "test_dataset": "synthetic",
        "n_calibration_samples": 2,
        "calibration_block_size": 64,
        "n_test_samples": 2,
        "test_block_size": 64,
        "quantization_config": {"rtn": {"w_bit": [2, 8], "q_group_size": 64}},
        "verbose": False,
    }
    bench = QuantizationBenchmark(cfg)
    bench.run_all_benchmarks()
    assert bench.results["rtn@w2"].is_success()
    assert bench.results["rtn@w8"].is_success()
    # more bits → lower ppl on the same data
    assert (
        bench.results["rtn@w8"].perplexity < bench.results["rtn@w2"].perplexity
    )
