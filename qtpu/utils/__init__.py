from qtpu.utils.timing import Timer, timed  # noqa: F401
