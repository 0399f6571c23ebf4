"""Frozen dataset fixtures: pre-tokenized calibration/eval shards on disk.

The reference validates accuracy on real TinyLlama + WikiText-2
(results/benchmark_results_{4,8}bit.json); this container has zero egress,
so real-data runs decouple into two steps:

  1. On any machine WITH HF caches:  python tools/make_fixture.py
     tokenizes WikiText-2 with the model's tokenizer using the EXACT
     reference preprocessing (quantization_utils.py:104-197 — seed-42
     shuffle, blank/overlong filters, concat+block-split for calibration;
     "\n\n"-join single tokenization for test) and writes a fixture
     directory.
  2. Anywhere (fully offline): point a benchmark config's dataset fields
     at "fixture:<dir>" — the pipelines load the frozen tokens with no
     datasets/tokenizer dependency, so the measured perplexity is
     bit-comparable to a reference run over the same tokens.

Fixture layout:
  meta.json            {"model_name", "block_size_calib", "created_by",
                        "dataset", "n_calib_blocks", "n_test_tokens"}
  calib_blocks.npy     [n_blocks, block_size] int32
  test_tokens.npy      [1, N] int32
"""

from __future__ import annotations

import json
import os

import numpy as np


def save_fixture(
    out_dir: str,
    calib_blocks,
    test_tokens,
    meta: dict | None = None,
) -> None:
    os.makedirs(out_dir, exist_ok=True)
    blocks = np.stack([np.asarray(b).reshape(-1) for b in calib_blocks])
    test = np.asarray(test_tokens, np.int32).reshape(1, -1)
    np.save(os.path.join(out_dir, "calib_blocks.npy"), blocks.astype(np.int32))
    np.save(os.path.join(out_dir, "test_tokens.npy"), test)
    info = {
        "n_calib_blocks": int(blocks.shape[0]),
        "block_size_calib": int(blocks.shape[1]),
        "n_test_tokens": int(test.shape[1]),
    }
    info.update(meta or {})
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(info, f, indent=1)


def load_fixture_calibration(
    fixture_dir: str, n_samples: int, block_size: int
) -> list[np.ndarray]:
    """First n_samples [1, block_size] calibration blocks of the fixture.
    The fixture must have been built at the same block size (the reference
    filters rows against it BEFORE blocking, so re-splitting here would
    change the sample set)."""
    blocks = np.load(os.path.join(fixture_dir, "calib_blocks.npy"))
    if blocks.shape[1] != block_size:
        raise ValueError(
            f"fixture calibration block size {blocks.shape[1]} != requested "
            f"{block_size}; rebuild the fixture (tools/make_fixture.py)"
        )
    if n_samples > blocks.shape[0]:
        raise ValueError(
            f"fixture has {blocks.shape[0]} calibration blocks, "
            f"requested {n_samples}"
        )
    return [blocks[i : i + 1].astype(np.int32) for i in range(n_samples)]


def load_fixture_test(fixture_dir: str) -> np.ndarray:
    return np.load(os.path.join(fixture_dir, "test_tokens.npy")).astype(
        np.int32
    )


def fixture_meta(fixture_dir: str) -> dict:
    with open(os.path.join(fixture_dir, "meta.json")) as f:
        return json.load(f)
