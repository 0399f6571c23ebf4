#!/usr/bin/env python
"""Build the committed zero-egress real-text fixture (fixtures/public_bytes).

The reference's central accuracy artifact is real-data WikiText-2
perplexity (results/benchmark_results_4bit.json:64-128). This container
has zero egress — no WikiText, no HF tokenizer — so this tool freezes the
next-best thing a third party can replay bit-for-bit: a REAL public
English corpus that ships inside every container of this image, tokenized
WITHOUT any downloaded tokenizer:

  corpus    = Python's own documentation topics (pydoc_data.topics, PSF
              license, ~500 KB of natural-language prose) + the Debian
              common-licenses texts (~240 KB)
  tokenizer = raw UTF-8 bytes (vocab 256 — valid ids for every model here)
  protocol  = the reference's calibration preprocessing shape
              (quantization_utils.py:132-164): per-line rows, strip, drop
              blanks and rows longer than block_size bytes, deterministic
              seed-42 shuffle, concat + floor-split into 512-byte blocks;
              test = "\n\n"-join of held-out documents, single encoding

The frozen token arrays (fixtures/public_bytes/*.npy) are committed, so
`dataset: "fixture:fixtures/public_bytes"` in any benchmark config
reproduces the exact measurement in results/fixture_public_bytes_*.json
on any machine, with no network and no tokenizer:

  python -m qtpu.configs quick_test --out /tmp/f/config.json
  # edit: "calib_dataset"/"dataset" -> "fixture:fixtures/public_bytes"
  python -m qtpu.bench /tmp/f/config.json --out results.json

Regenerate with:  python tools/make_public_fixture.py
(meta.json records the corpus sha256; a changed Python version changes
pydoc topics and therefore the hash — the committed fixture is the frozen
reference, regeneration is only for auditing the recipe.)
"""

import glob
import hashlib
import json
import sys

sys.path.insert(0, ".")

import numpy as np

N_CALIB = 64
CALIB_BLOCK = 512
TEST_FRACTION = 0.2
SEED = 42


def collect_documents() -> list[tuple[str, str]]:
    docs = []
    import pydoc_data.topics

    for name in sorted(pydoc_data.topics.topics):
        docs.append((f"pydoc:{name}", pydoc_data.topics.topics[name]))
    for path in sorted(glob.glob("/usr/share/common-licenses/*")):
        try:
            with open(path, "r", errors="strict") as f:
                docs.append((f"license:{path.rsplit('/', 1)[1]}", f.read()))
        except (OSError, UnicodeDecodeError):
            continue
    return docs


def main():
    from qtpu import native
    from qtpu.data.fixture import save_fixture

    docs = collect_documents()
    corpus_sha = hashlib.sha256(
        "\x00".join(name + "\x01" + text for name, text in docs).encode()
    ).hexdigest()

    rng = np.random.default_rng(SEED)
    perm = rng.permutation(len(docs))
    n_test = max(1, int(len(docs) * TEST_FRACTION))
    test_docs = [docs[i] for i in perm[:n_test]]
    calib_docs = [docs[i] for i in perm[n_test:]]

    # calibration: reference row protocol on LINES of the calib documents
    rows = []
    for _, text in calib_docs:
        rows.extend(text.split("\n"))
    row_perm = rng.permutation(len(rows))
    encoded = []
    total = 0
    for i in row_perm:
        line = rows[i].strip()
        if not line:
            continue
        ids = list(line.encode("utf-8"))
        if len(ids) > CALIB_BLOCK or len(ids) == 0:
            continue
        encoded.append(np.asarray(ids, np.int32))
        total += len(ids)
        if total >= (N_CALIB + 1) * CALIB_BLOCK:  # fills N_CALIB blocks
            break
    calib = native.block_pack(encoded, CALIB_BLOCK)[:N_CALIB]

    test_text = "\n\n".join(text for _, text in test_docs)
    test = np.asarray(
        [list(test_text.encode("utf-8"))], np.int32
    )

    save_fixture(
        "fixtures/public_bytes",
        calib,
        test,
        meta={
            "model_name": "byte-level (vocab 256)",
            "dataset": "pydoc_data.topics + /usr/share/common-licenses",
            "tokenizer": "utf-8 bytes",
            "corpus_sha256": corpus_sha,
            "python": sys.version.split()[0],
            "n_documents": len(docs),
            "n_test_documents": n_test,
            "seed": SEED,
            "created_by": "tools/make_public_fixture.py",
        },
    )
    print(
        json.dumps(
            {
                "calib_blocks": len(calib),
                "block": CALIB_BLOCK,
                "test_tokens": int(test.shape[1]),
                "corpus_sha256": corpus_sha[:16],
            }
        )
    )


if __name__ == "__main__":
    main()
