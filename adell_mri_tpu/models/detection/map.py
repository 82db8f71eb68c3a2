"""
Mean average precision for detection.

Parity target: adell_mri/modules/object_detection/map.py:11 (mAP
torchmetric). Numpy implementation over per-image (boxes, scores) vs GT.
"""

from typing import List, Sequence

import numpy as np

from adell_mri_tpu.models.detection.nms import box_iou


def average_precision(
    pred_boxes: List[np.ndarray],
    pred_scores: List[np.ndarray],
    true_boxes: List[np.ndarray],
    iou_threshold: float = 0.5,
) -> float:
    """AP at one IoU threshold over a list of images."""
    records = []  # (score, is_tp)
    n_gt = 0
    for pb, ps, tb in zip(pred_boxes, pred_scores, true_boxes):
        pb, ps, tb = np.asarray(pb), np.asarray(ps), np.asarray(tb)
        n_gt += len(tb)
        if len(pb) == 0:
            continue
        order = np.argsort(-ps)
        matched = np.zeros(len(tb), bool)
        ious = box_iou(pb, tb) if len(tb) else np.zeros((len(pb), 0))
        for i in order:
            best = -1
            best_iou = iou_threshold
            for j in range(len(tb)):
                if not matched[j] and ious[i, j] >= best_iou:
                    best, best_iou = j, ious[i, j]
            if best >= 0:
                matched[best] = True
                records.append((ps[i], 1))
            else:
                records.append((ps[i], 0))
    if n_gt == 0 or not records:
        return float("nan")
    records.sort(key=lambda r: -r[0])
    tps = np.cumsum([r[1] for r in records])
    fps = np.cumsum([1 - r[1] for r in records])
    recall = tps / n_gt
    precision = tps / np.maximum(tps + fps, 1)
    # 101-point interpolation
    ap = 0.0
    for r in np.linspace(0, 1, 101):
        mask = recall >= r
        ap += precision[mask].max() if mask.any() else 0.0
    return float(ap / 101)


def mean_average_precision(
    pred_boxes: List[np.ndarray],
    pred_scores: List[np.ndarray],
    true_boxes: List[np.ndarray],
    iou_thresholds: Sequence[float] = (0.5,),
) -> float:
    aps = [
        average_precision(pred_boxes, pred_scores, true_boxes, t)
        for t in iou_thresholds
    ]
    finite = [a for a in aps if np.isfinite(a)]
    return float(np.mean(finite)) if finite else float("nan")
