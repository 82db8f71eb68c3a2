from adell_mri_tpu.inference.sliding_window import (
    SlidingWindowSegmentation,
    sliding_window_grid,
    sliding_window_inference,
)
from adell_mri_tpu.inference.tta import FlippedInference, SegmentationInference

__all__ = [
    "sliding_window_inference",
    "sliding_window_grid",
    "SlidingWindowSegmentation",
    "FlippedInference",
    "SegmentationInference",
]
