from adell_mri_tpu.eval.lesion import (
    Metrics,
    evaluate,
    evaluate_case,
    extract_lesion_candidates,
)
from adell_mri_tpu.eval.metrics import (
    auc_score,
    binary_metrics,
    dice_score,
    expected_calibration_error,
    iou_score,
    multiclass_metrics,
    segmentation_class_metrics,
)
from adell_mri_tpu.eval.bootstrap import bootstrap_metric

__all__ = [
    "extract_lesion_candidates",
    "evaluate_case",
    "evaluate",
    "Metrics",
    "dice_score",
    "auc_score",
    "binary_metrics",
    "multiclass_metrics",
    "segmentation_class_metrics",
    "iou_score",
    "expected_calibration_error",
    "bootstrap_metric",
]
