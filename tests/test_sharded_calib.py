"""Sharded calibration equals single-device calibration; explicit psum
Hessian combination; multi-host helpers; debug utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtpu.calib import collect_calibration_stats
from qtpu.calib.sharded import (
    collect_calibration_stats_sharded,
    psum_hessian_shardmap,
)
from qtpu.models import TINY_TEST, forward, init_params
from qtpu.sharding import make_mesh
from qtpu.sharding.multihost import initialize_multihost, is_primary
from qtpu.utils.debug import assert_all_finite, checked, debug_nans

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_sharded_stats_match_single_device():
    cfg = TINY_TEST
    params = init_params(cfg, jax.random.PRNGKey(0))
    batches = [
        np.asarray(
            jax.random.randint(jax.random.PRNGKey(i), (1, 64), 0, cfg.vocab_size)
        )
        for i in range(6)  # deliberately NOT a multiple of dp=4 (pads)
    ]
    ref = collect_calibration_stats(
        forward, params, batches, cfg, collect_hessian=True
    )
    mesh = make_mesh(data=4, model=2)
    got = collect_calibration_stats_sharded(
        forward, params, batches, cfg, mesh, collect_hessian=True
    )
    for site in ref.mean_abs:
        np.testing.assert_allclose(
            np.asarray(got.mean_abs[site]),
            np.asarray(ref.mean_abs[site]),
            rtol=2e-2,
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(got.max_abs[site]),
            np.asarray(ref.max_abs[site]),
            rtol=2e-2,
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(got.hessian[site]),
            np.asarray(ref.hessian[site]),
            rtol=5e-2,
            atol=1e-3,
        )


def test_psum_hessian_shardmap():
    mesh = make_mesh(data=8, model=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 16))
    with jax.sharding.set_mesh(mesh):
        got = psum_hessian_shardmap(x, mesh)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(jnp.sum(x, 0)), rtol=1e-5, atol=1e-5
    )


def test_multihost_noop_single_process():
    info = initialize_multihost()
    assert info["process_count"] == 1
    assert is_primary()


def test_debug_utils():
    assert_all_finite({"a": jnp.ones(3)}, "ok")
    with pytest.raises(AssertionError):
        assert_all_finite({"a": jnp.array([1.0, jnp.nan])}, "bad")

    f = checked(lambda x: jnp.log(x))
    f(jnp.ones(3))  # fine
    with pytest.raises(Exception):
        f(-jnp.ones(3))  # NaN from log(-1)

    with debug_nans(False):
        pass  # toggles without error
