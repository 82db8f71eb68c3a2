from adell_mri_tpu.models.detection.yolo3d import YOLONet3d, CoarseDetector3d
from adell_mri_tpu.models.detection.losses import (
    complete_iou_loss,
    yolo_loss,
)
from adell_mri_tpu.models.detection.nms import nms_3d, box_iou
from adell_mri_tpu.models.detection.map import mean_average_precision
from adell_mri_tpu.models.detection.anchors import (
    load_anchors_csv,
    boxes_to_anchor_targets,
    boxes_to_anchor_targets_jax,
    transform_boxes_affine,
    anchor_targets_to_boxes,
)

__all__ = [
    "YOLONet3d",
    "CoarseDetector3d",
    "complete_iou_loss",
    "yolo_loss",
    "nms_3d",
    "box_iou",
    "mean_average_precision",
    "load_anchors_csv",
    "boxes_to_anchor_targets",
    "boxes_to_anchor_targets_jax",
    "transform_boxes_affine",
    "anchor_targets_to_boxes",
]
