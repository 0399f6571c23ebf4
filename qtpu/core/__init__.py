from qtpu.core import dtypes, groups, packing, sizing  # noqa: F401
