from qtpu.bench.results import BenchmarkResult  # noqa: F401
from qtpu.bench.runner import QuantizationBenchmark  # noqa: F401
