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


def test_v1_artifact_automigrates(tmp_path, rng):
    """A pre-excess-8 (pack_format 1) artifact loads with its W4 hi
    nibbles migrated, producing identical forwards."""
    import json

    cfg = TINY_TEST
    params = init_params(cfg, rng)
    packed, qmeta = pack_model(params, "rtn", {"w_bit": 4, "q_group_size": 64})
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 32), 0, cfg.vocab_size)
    before = forward(packed, ids, cfg, qmeta=qmeta)

    save_quantized(tmp_path / "ck", packed, qmeta, {"method": "rtn"})
    # rewrite the artifact as a version-1 one: plain (lo | hi << 4) bytes,
    # no pack_format field
    meta = json.loads((tmp_path / "ck" / "meta.json").read_text())
    assert meta["pack_format"] == 2
    del meta["pack_format"]
    (tmp_path / "ck" / "meta.json").write_text(json.dumps(meta))
    w4_sites = {s for s, m in qmeta if m[0] == 4}
    data = dict(np.load(tmp_path / "ck" / "params.npz").items())
    for k, a in data.items():
        parts = k.split("::")
        if a.dtype == np.int8 and parts[-1] == "data" and parts[-2] in w4_sites:
            data[k] = (a.view(np.uint8) ^ np.uint8(0x80)).view(np.int8)
    np.savez(tmp_path / "ck" / "params.npz", **data)

    loaded, qmeta2, _ = load_quantized(tmp_path / "ck")
    assert qmeta2 == qmeta
    after = forward(loaded, ids, cfg, qmeta=qmeta2)
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))

    # and a FUTURE format is rejected, not silently misread
    meta["pack_format"] = 99
    (tmp_path / "ck" / "meta.json").write_text(json.dumps(meta))
    import pytest

    with pytest.raises(ValueError, match="pack_format"):
        load_quantized(tmp_path / "ck")


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
