"""
Anchor handling and box<->grid target conversion.

Parity targets: anchors from CSV (adell_mri/utils/utils.py:379,
utils/detection.py:17) and BBToAdjustedAnchorsd
(utils/monai_transforms/bounding_boxes.py:198 — rasterizes GT boxes onto the
YOLO anchor grid). Boxes are corner format [x1,y1,z1,x2,y2,z2] in voxels.
"""

from typing import Sequence, Tuple

import numpy as np


def load_anchors_csv(path: str) -> np.ndarray:
    """Anchor sizes [A, ndim] from a CSV of one anchor per line."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            out.append([float(x) for x in line.replace(";", ",").split(",")])
    return np.asarray(out, np.float32)


def boxes_to_anchor_targets(
    boxes: np.ndarray,
    classes: np.ndarray,
    grid_shape: Sequence[int],
    anchors: np.ndarray,
    input_shape: Sequence[int],
    n_classes: int = 2,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """
    Rasterizes GT corner boxes onto the anchor grid (host-side, per sample;
    parity: BBToAdjustedAnchorsd). Returns (objectness [A, *G],
    center_offsets [A*ndim, *G], size_targets [A*ndim, *G] (log-scale),
    class_targets [C, *G]) — channels-first over the anchor axis to match
    the prediction layout, converted later.
    """
    ndim = len(grid_shape)
    A = len(anchors)
    stride = np.asarray(input_shape, np.float32) / np.asarray(
        grid_shape, np.float32
    )
    obj = np.zeros((A,) + tuple(grid_shape), np.float32)
    ctr = np.zeros((A, ndim) + tuple(grid_shape), np.float32)
    sz = np.zeros((A, ndim) + tuple(grid_shape), np.float32)
    cls = np.zeros((max(1, n_classes - 1),) + tuple(grid_shape), np.float32)

    for box, c in zip(np.asarray(boxes), np.asarray(classes)):
        lo, hi = box[:ndim], box[ndim:]
        center = (lo + hi) / 2.0
        size = np.maximum(hi - lo, 1e-3)
        cell = np.minimum(
            (center / stride).astype(int), np.asarray(grid_shape) - 1
        )
        # pick the anchor with best size IoU
        inter = np.prod(np.minimum(anchors, size), axis=1)
        union = np.prod(anchors, axis=1) + np.prod(size) - inter
        a = int(np.argmax(inter / np.maximum(union, 1e-6)))
        idx = (a,) + tuple(cell)
        obj[idx] = 1.0
        offset = center / stride - cell  # in [0,1)
        for d in range(ndim):
            ctr[(a, d) + tuple(cell)] = offset[d]
            sz[(a, d) + tuple(cell)] = np.log(
                size[d] / max(anchors[a, d], 1e-6)
            )
        if n_classes > 2:
            cls[(int(c),) + tuple(cell)] = 1.0
        else:
            cls[(0,) + tuple(cell)] = float(c)
    return (
        obj,
        ctr.reshape((A * ndim,) + tuple(grid_shape)),
        sz.reshape((A * ndim,) + tuple(grid_shape)),
        cls,
    )


def anchor_targets_to_boxes(
    objectness: np.ndarray,
    centers: np.ndarray,
    sizes: np.ndarray,
    anchors: np.ndarray,
    input_shape: Sequence[int],
    threshold: float = 0.5,
):
    """
    Decodes grid predictions back to corner boxes + scores
    (inverse of boxes_to_anchor_targets; used at predict time before NMS).
    """
    A = len(anchors)
    grid_shape = objectness.shape[1:]
    ndim = len(grid_shape)
    stride = np.asarray(input_shape, np.float32) / np.asarray(
        grid_shape, np.float32
    )
    centers = centers.reshape((A, ndim) + tuple(grid_shape))
    sizes = sizes.reshape((A, ndim) + tuple(grid_shape))
    boxes, scores = [], []
    hits = np.argwhere(objectness > threshold)
    for hit in hits:
        a, cell = int(hit[0]), hit[1:]
        offset = np.asarray(
            [centers[(a, d) + tuple(cell)] for d in range(ndim)]
        )
        log_size = np.asarray(
            [sizes[(a, d) + tuple(cell)] for d in range(ndim)]
        )
        center = (cell + offset) * stride
        size = anchors[a] * np.exp(log_size)
        boxes.append(
            np.concatenate([center - size / 2, center + size / 2])
        )
        scores.append(float(objectness[tuple(hit)]))
    if not boxes:
        return np.zeros((0, 2 * ndim), np.float32), np.zeros((0,), np.float32)
    return np.asarray(boxes, np.float32), np.asarray(scores, np.float32)
