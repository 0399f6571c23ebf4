from qtpu.kernels.dequant_matmul import quantized_matmul  # noqa: F401
