"""Pallas TPU kernel: fused dequant + matmul (placeholder gate).

Filled in by the kernels milestone; raising NotImplementedError here routes
callers to the XLA reference path in dequant_matmul.py.
"""


def pallas_quantized_matmul(x, data, scales, zeros, meta):
    raise NotImplementedError
