#!/usr/bin/env python
"""Reproduce the reference's real-data accuracy runs (Run A W4 / Run B W8,
BASELINE.md) and print a qtpu-vs-reference delta table.

Needs either:
  * --ckpt <dir>: a local TinyLlama/TinyLlama_v1.1 HF checkpoint directory
    (config.json + safetensors), plus
  * --fixture <dir>: a frozen WikiText-2 fixture (tools/make_fixture.py),
    or HF caches present so the live dataset path works.

One command (HF-cache machine):
  python tools/repro_real.py --ckpt ~/.cache/.../TinyLlama_v1.1 \
      --fixture fixtures/tinyllama_wikitext2 --w-bit 4 \
      --out results/real_tinyllama_w4.json

Offline (this container): both inputs are local files; zero egress needed.
The reference numbers below are its checked-in results
(/root/reference/results/benchmark_results_{4,8}bit.json:64-128).
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

# reference per-method ppl at W4/W8 (TinyLlama_v1.1, WikiText-2,
# 10 x 1024-token blocks, 32 calib samples; raw fp16 ppl 9.4898)
REFERENCE = {
    4: {"raw": 9.4898, "awq": 10.2086, "gptq": 14.2332, "pot": 11.7573,
        "apot": 9.7452},
    8: {"raw": 9.4898, "awq": 9.4884, "gptq": 9.5864, "pot": 11.6771,
        "apot": 9.7084},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="local HF checkpoint dir")
    ap.add_argument("--fixture", default=None, help="frozen token fixture")
    ap.add_argument("--w-bit", type=int, default=4, choices=(4, 8))
    ap.add_argument("--n-test", type=int, default=10)
    ap.add_argument("--test-block", type=int, default=1024)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--methods", default="awq,gptq,pot,apot",
        help="comma-separated subset",
    )
    args = ap.parse_args()

    from qtpu.bench import QuantizationBenchmark

    if args.fixture:
        ds = f"fixture:{args.fixture}"
        calib = {"calibration_dataset": ds, "calibration_dataset_config": None,
                 "calibration_split": "train"}
        test = {"test_dataset": ds, "test_dataset_config": None,
                "test_split": "test"}
    else:
        calib = {"calibration_dataset": "wikitext",
                 "calibration_dataset_config": "wikitext-2-raw-v1",
                 "calibration_split": "train"}
        test = {"test_dataset": "wikitext",
                "test_dataset_config": "wikitext-2-raw-v1",
                "test_split": "test"}

    wb = args.w_bit
    config = {
        "model_name": "TinyLlama/TinyLlama_v1.1",
        "checkpoint_path": args.ckpt,
        "quantization_methods": args.methods.split(","),
        **calib,
        **test,
        "n_calibration_samples": 32,
        "calibration_block_size": 512,
        "n_test_samples": args.n_test,
        "test_block_size": args.test_block,
        "packed_eval": True,
        "quantization_config": {
            # the reference Run A/B configs (q_group_size 128)
            "awq": {"w_bit": wb, "q_group_size": 128, "protect_ratio": 0.01,
                    "scale_factor": 2.0},
            "gptq": {"w_bit": wb, "q_group_size": 128, "perp_damp": 0.01,
                     "blocksize": 128, "nsamples": 128, "actorder": False,
                     # reference parity: compensation skipped
                     "error_compensation": False},
            "pot": {"w_bit": wb, "q_group_size": 128},
            "apot": {"w_bit": wb, "q_group_size": 128, "k": 2},
            "smoothquant": {"w_bit": wb, "q_group_size": 128, "alpha": 0.5},
            "rtn": {"w_bit": wb, "q_group_size": 128},
        },
        "verbose": True,
    }
    bench = QuantizationBenchmark(config)
    bench.run_all_benchmarks()
    if args.out:
        bench.save_results(args.out)

    ref = REFERENCE[wb]
    print(f"\nqtpu vs reference — TinyLlama W{wb} g128, WikiText-2")
    print(f"{'method':<12} {'ref ppl':>10} {'ref Δ':>8} "
          f"{'qtpu ppl':>10} {'qtpu Δ':>8} {'packed ppl':>11}")
    raw = bench.results.get("raw")
    raw_ppl = raw.perplexity if raw and raw.perplexity else float("nan")
    for m in ["raw"] + config["quantization_methods"]:
        r = bench.results.get(m)
        if r is None:
            continue
        q = r.perplexity if r.perplexity is not None else float("nan")
        rp = ref.get(m, float("nan"))
        print(
            f"{m:<12} {rp:>10.4f} {rp - ref['raw']:>8.4f} "
            f"{q:>10.4f} {q - raw_ppl:>8.4f} "
            f"{(r.packed_perplexity or float('nan')):>11.4f}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
