from qtpu.data.pipeline import (  # noqa: F401
    get_calibration_dataset,
    get_test_dataset,
)
