from qtpu.serve.kvcache import KVCache, init_cache  # noqa: F401
from qtpu.serve.decode import decode_step, greedy_generate, prefill  # noqa: F401
from qtpu.serve.batching import ContinuousBatcher, Request  # noqa: F401
