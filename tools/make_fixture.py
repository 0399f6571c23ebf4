#!/usr/bin/env python
"""Build a frozen real-data fixture (run on a machine WITH HF caches).

One command:
  python tools/make_fixture.py --model TinyLlama/TinyLlama_v1.1 \
      --dataset wikitext --config wikitext-2-raw-v1 \
      --calib-split train --test-split test \
      --n-calib 32 --calib-block 512 --out fixtures/tinyllama_wikitext2

This reproduces the reference's Run A/B data exactly
(results/benchmark_results_4bit.json: 32 calibration samples at block 512
from the train split, test split tokenized once) and freezes the token ids
so offline environments (zero egress) can evaluate bit-comparable
perplexity via dataset "fixture:<dir>" (see qtpu/data/fixture.py and
tools/repro_real.py).
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="TinyLlama/TinyLlama_v1.1")
    ap.add_argument("--dataset", default="wikitext")
    ap.add_argument("--config", default="wikitext-2-raw-v1")
    ap.add_argument("--calib-split", default="train")
    ap.add_argument("--test-split", default="test")
    ap.add_argument("--n-calib", type=int, default=32)
    ap.add_argument("--calib-block", type=int, default=512)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from transformers import AutoTokenizer

    from qtpu.data.fixture import save_fixture
    from qtpu.data.pipeline import get_calibration_dataset, get_test_dataset

    tok = AutoTokenizer.from_pretrained(args.model, use_fast=True)
    calib = get_calibration_dataset(
        tok,
        args.dataset,
        args.config,
        args.calib_split,
        n_samples=args.n_calib,
        block_size=args.calib_block,
    )
    test = get_test_dataset(tok, args.dataset, args.config, args.test_split)
    save_fixture(
        args.out,
        calib,
        test,
        meta={
            "model_name": args.model,
            "dataset": f"{args.dataset}/{args.config}",
            "calib_split": args.calib_split,
            "test_split": args.test_split,
            "created_by": "tools/make_fixture.py",
        },
    )
    print(f"fixture written to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
