from qtpu.ckpt.io import load_quantized, save_quantized  # noqa: F401
