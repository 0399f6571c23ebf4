"""Benchmark result container (reference C16, benchmark_runner.py:46-84).

Serialises to the exact reference results-JSON schema — that schema is the
comparison surface against the reference's checked-in results
(benchmark_results.json, results/*.json).
"""

from __future__ import annotations

from typing import Optional


class BenchmarkResult:
    def __init__(self, method_name: str, config: dict):
        self.method_name = method_name
        self.config = config
        self.perplexity: Optional[float] = None
        self.model_size_bits: Optional[float] = None
        self.model_size_mb: Optional[float] = None
        self.bits_per_byte: Optional[float] = None
        self.runtime_seconds: Optional[float] = None
        self.error: Optional[str] = None
        # qtpu extensions: really-packed size (the reference can only
        # account) and serving throughput (the reference has no serving)
        self.packed_size_bits: Optional[int] = None
        self.tokens_per_second: Optional[float] = None
        # perplexity of the REALLY-PACKED serving artifact (integer codes +
        # fused dequant kernels), next to the fake-quant number — the
        # packed-vs-fake accuracy audit (e.g. APOT's 16-level packed
        # codebook vs the reference's 32-level fake-quant cap)
        self.packed_perplexity: Optional[float] = None
        self.packed_error: Optional[str] = None

    def is_success(self) -> bool:
        return self.error is None and (
            self.perplexity is not None or self.tokens_per_second is not None
        )

    def to_dict(self) -> dict:
        d = {
            "method": self.method_name,
            "perplexity": self.perplexity,
            "model_size_mb": self.model_size_mb,
            "model_size_bits": self.model_size_bits,
            "bits_per_byte": self.bits_per_byte,
            "runtime_seconds": self.runtime_seconds,
            "error": self.error,
            "config": self.config,
        }
        if self.packed_size_bits is not None:
            d["packed_size_bits"] = self.packed_size_bits
        if self.tokens_per_second is not None:
            d["tokens_per_second"] = self.tokens_per_second
        if self.packed_perplexity is not None:
            d["packed_perplexity"] = self.packed_perplexity
        if self.packed_error is not None:
            d["packed_error"] = self.packed_error
        return d

    def __str__(self) -> str:
        if not self.is_success():
            return f"{self.method_name:<12} | ERROR: {self.error}"
        if self.perplexity is None and self.tokens_per_second is not None:
            return (
                f"{self.method_name:<12} | "
                f"{self.tokens_per_second:8.1f} tokens/s/chip | "
                f"Time: {self.runtime_seconds or 0:.2f}s"
            )
        bits = (
            f"{self.bits_per_byte:.2f}" if self.bits_per_byte is not None else "N/A"
        )
        return (
            f"{self.method_name:<12} | "
            f"PPL: {self.perplexity:8.2f} | "
            f"Size: {self.model_size_mb:8.2f} MB | "
            f"Bits/Byte: {bits} | "
            f"Time: {self.runtime_seconds or 0:.2f}s"
        )
