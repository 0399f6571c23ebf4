"""Scaling-sweep harness: functional on the virtual CPU mesh (efficiency
numbers are only meaningful on real hardware; here we assert the sharded
decode path runs and the report schema is right)."""

import jax
import pytest

from qtpu.bench.scaling import scaling_sweep
from qtpu.models import TINY_TEST, init_params
from qtpu.quant.apply import pack_model

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs 4 virtual devices"
)


def test_scaling_sweep_runs():
    cfg = TINY_TEST
    params = init_params(cfg, jax.random.PRNGKey(0))
    packed, qmeta = pack_model(params, "rtn", {"w_bit": 4, "q_group_size": 64})
    out = scaling_sweep(
        packed,
        cfg,
        qmeta,
        mesh_shapes=((1, 1), (2, 1), (2, 2)),
        batch_per_data_shard=2,
        prompt_len=16,
        n_steps=4,
    )
    assert len(out) == 3
    for rec in out:
        assert rec["tokens_per_second"] > 0
        assert 0 < rec["scaling_efficiency"]
    assert out[0]["scaling_efficiency"] == 1.0
