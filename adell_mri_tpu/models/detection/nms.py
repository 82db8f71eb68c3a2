"""
3D non-maximum suppression and box IoU.

Parity target: adell_mri/modules/object_detection/utils.py:40 (3D NMS).
Numpy host-side (runs on small candidate sets post-decode).
"""

from typing import Tuple

import numpy as np


def box_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise IoU of corner boxes [N, 2*ndim] x [M, 2*ndim] -> [N, M]."""
    ndim = a.shape[-1] // 2
    lo = np.maximum(a[:, None, :ndim], b[None, :, :ndim])
    hi = np.minimum(a[:, None, ndim:], b[None, :, ndim:])
    inter = np.prod(np.maximum(hi - lo, 0.0), axis=-1)
    vol_a = np.prod(np.maximum(a[:, ndim:] - a[:, :ndim], 0.0), axis=-1)
    vol_b = np.prod(np.maximum(b[:, ndim:] - b[:, :ndim], 0.0), axis=-1)
    union = vol_a[:, None] + vol_b[None, :] - inter
    return inter / np.maximum(union, 1e-9)


def nms_3d(
    boxes: np.ndarray, scores: np.ndarray, iou_threshold: float = 0.5
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Greedy NMS. Returns (kept_boxes, kept_scores, kept_indices)."""
    order = np.argsort(-np.asarray(scores))
    boxes = np.asarray(boxes)[order]
    scores = np.asarray(scores)[order]
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in range(len(boxes)):
        if suppressed[i]:
            continue
        keep.append(i)
        if i + 1 < len(boxes):
            ious = box_iou(boxes[i : i + 1], boxes[i + 1 :])[0]
            suppressed[i + 1 :] |= ious > iou_threshold
    keep = np.asarray(keep, int)
    return boxes[keep], scores[keep], order[keep]
