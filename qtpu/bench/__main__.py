"""Benchmark CLI — the reference `python benchmark_runner.py <config.json>`
equivalent (benchmark_runner.py:750-764).

Usage: python -m qtpu.bench [config.json] [--out results.json]
"""

import sys

from qtpu.bench.runner import QuantizationBenchmark


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    config_path = "config.json"
    out_path = None
    args = [a for a in argv]
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i : i + 2]
    if args:
        config_path = args[0]
    print(f"Loading configuration from: {config_path}")
    bench = QuantizationBenchmark(config_path)
    bench.run_all_benchmarks()
    bench.save_results(out_path or bench.config.get("output_path", "benchmark_results.json"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
