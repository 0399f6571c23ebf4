"""Checkpoint round-trip tests (SURVEY §5.4)."""

import jax
import jax.numpy as jnp
import numpy as np

from qtpu.ckpt import load_quantized, save_quantized
from qtpu.models import TINY_TEST, forward, init_params
from qtpu.quant.apply import pack_model


def test_roundtrip_packed(tmp_path, rng):
    cfg = TINY_TEST
    params = init_params(cfg, rng)
    packed, qmeta = pack_model(params, "rtn", {"w_bit": 4, "q_group_size": 64})
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 32), 0, cfg.vocab_size)
    before = forward(packed, ids, cfg, qmeta=qmeta)

    save_quantized(tmp_path / "ck", packed, qmeta, {"method": "rtn", "w_bit": 4})
    loaded, qmeta2, meta = load_quantized(tmp_path / "ck")
    assert qmeta2 == qmeta
    assert meta["method"] == "rtn"
    after = forward(loaded, ids, cfg, qmeta=qmeta2)
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))


def test_roundtrip_dense_bf16(tmp_path, rng):
    cfg = TINY_TEST
    params = init_params(cfg, rng)
    save_quantized(tmp_path / "ck", params)
    loaded, qmeta, _ = load_quantized(tmp_path / "ck")
    assert qmeta is None
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(loaded)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x.dtype == y.dtype
        np.testing.assert_array_equal(
            np.asarray(x, np.float32), np.asarray(y, np.float32)
        )
