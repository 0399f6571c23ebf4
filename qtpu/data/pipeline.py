"""Calibration/test dataset pipelines (reference C4 + C5).

Reproduces the reference preprocessing exactly when HF datasets are
available (quantization_utils.py:104-197): seed-42 shuffle, blank-line and
len>block_size filters, concatenate-then-resplit into fixed blocks for
calibration; "\n\n"-joined single tokenization for test. When the dataset
is "synthetic" (or HF loading fails — this container has zero egress), a
deterministic synthetic corpus with the same shapes is used instead.
"""

from __future__ import annotations

import numpy as np

from qtpu.data.synthetic import synthetic_blocks, synthetic_token_stream


def get_calibration_dataset(
    tokenizer,
    dataset_name: str,
    dataset_config,
    split: str,
    n_samples: int = 256,
    block_size: int = 512,
    vocab_size: int | None = None,
    seed: int = 42,
) -> list[np.ndarray]:
    """Returns a list of [1, block_size] int32 arrays."""
    if dataset_name.startswith("fixture:"):
        from qtpu.data.fixture import load_fixture_calibration

        return load_fixture_calibration(
            dataset_name[len("fixture:"):], n_samples, block_size
        )
    if dataset_name == "synthetic" or tokenizer is None:
        if vocab_size is None:
            raise ValueError("synthetic calibration needs vocab_size")
        return synthetic_blocks(vocab_size, n_samples, block_size, seed)

    from datasets import load_dataset

    if dataset_config is None:
        dataset = load_dataset(dataset_name, split=split)
    else:
        dataset = load_dataset(dataset_name, dataset_config, split=split)
    return prepare_calibration_samples(
        dataset, tokenizer, n_samples, block_size, seed
    )


def prepare_calibration_samples(
    dataset, tokenizer, n_samples: int, block_size: int, seed: int = 42
) -> list[np.ndarray]:
    """Reference C4 preprocessing on an in-memory dataset
    (quantization_utils.py:132-164): seed shuffle, strip, drop blanks and
    rows tokenizing longer than block_size, stop at n_samples, concat along
    the sequence dim, floor-split into fixed blocks."""
    dataset = dataset.shuffle(seed=seed)
    samples = []
    n_run = 0
    for data in dataset:
        line = data["text"].strip()
        if not line:
            continue
        encoded = tokenizer.encode(line)
        if len(encoded) > block_size:
            continue
        if len(encoded) == 0:
            continue
        samples.append(np.asarray([encoded], np.int32))
        n_run += 1
        if n_run == n_samples:
            break
    if not samples:
        raise ValueError("No valid samples found in dataset")
    # concat + fixed-block split via the native C++ packer when built
    # (qtpu/native, numpy fallback inside)
    from qtpu import native

    return native.block_pack([s[0] for s in samples], block_size)


def get_test_dataset(
    tokenizer,
    dataset_name: str,
    dataset_config,
    split: str,
    n_samples: int = 40,
    block_size: int = 2048,
    vocab_size: int | None = None,
    seed: int = 1234,
) -> np.ndarray:
    """Returns a single [1, N] int32 token stream."""
    if dataset_name.startswith("fixture:"):
        from qtpu.data.fixture import load_fixture_test

        return load_fixture_test(dataset_name[len("fixture:"):])
    if dataset_name == "synthetic" or tokenizer is None:
        if vocab_size is None:
            raise ValueError("synthetic test set needs vocab_size")
        return synthetic_token_stream(
            vocab_size, n_samples * block_size, seed
        )

    from datasets import load_dataset

    if dataset_config is None:
        dataset = load_dataset(dataset_name, split=split)
    else:
        dataset = load_dataset(dataset_name, dataset_config, split=split)
    text_data = "\n\n".join(dataset["text"])
    ids = tokenizer(text_data, return_tensors="np").input_ids
    return ids.astype(np.int32)
