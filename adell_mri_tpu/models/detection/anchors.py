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
    # channel count mirrors the YOLONet3d class head: 1 sigmoid channel
    # for binary, n_classes one-hot channels for multiclass (class ids
    # index DIRECTLY, so ids 0..n_classes-1 are all valid)
    cls = np.zeros(
        (1 if n_classes == 2 else n_classes,) + tuple(grid_shape),
        np.float32,
    )

    for box, c in zip(np.asarray(boxes), np.asarray(classes)):
        lo, hi = box[:ndim], box[ndim:]
        center = (lo + hi) / 2.0
        size = np.maximum(hi - lo, 1e-3)
        # a center cropped out of the volume must be DROPPED: the old
        # upper-only clamp let negative cells wrap through numpy indexing,
        # rasterizing a ghost positive at the OPPOSITE border (the jax
        # twin marks such boxes invalid)
        if np.any(center < 0) or np.any(
            center >= np.asarray(input_shape, np.float32)
        ):
            continue
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


def transform_boxes_affine(
    boxes,
    matrix,
    valid,
    out_shape: Sequence[int],
    min_size: float = 1.0,
):
    """
    Transforms corner boxes consistently with an image warped by
    ``warp_affine(image, matrix)`` (parity: RandAffineWithBoxesd /
    RandRotateWithBoxesd, utils/monai_transforms/bounding_boxes.py:449,537).

    ``warp_affine`` maps OUTPUT voxel o to input sample ``matrix @ o``, so
    image content at input point p lands at ``inv(matrix) @ p``; each box's
    2^ndim corners are mapped and re-wrapped in an axis-aligned box (the
    reference does the same corner/AABB dance in torch). Degenerate or
    fully out-of-frame boxes are invalidated.

    boxes [M, 2*ndim] voxel corners; matrix [(ndim+1)]^2 homogeneous;
    valid [M] bool. Returns (new_boxes, new_valid); jit-safe.
    """
    import itertools

    import jax.numpy as jnp

    ndim = boxes.shape[-1] // 2
    inv = jnp.linalg.inv(matrix)
    lo, hi = boxes[:, :ndim], boxes[:, ndim:]
    corner_list = []
    for bits in itertools.product((0, 1), repeat=ndim):
        sel = jnp.asarray(bits, jnp.float32)
        corner_list.append(lo * (1 - sel) + hi * sel)
    corners = jnp.stack(corner_list, axis=1)  # [M, 2^ndim, ndim]
    ones = jnp.ones(corners.shape[:-1] + (1,), corners.dtype)
    homo = jnp.concatenate([corners, ones], axis=-1)  # [M, 2^ndim, ndim+1]
    mapped = jnp.einsum("ij,mcj->mci", inv, homo)[..., :ndim]
    new_lo = jnp.min(mapped, axis=1)
    new_hi = jnp.max(mapped, axis=1)
    bound = jnp.asarray(out_shape, jnp.float32)
    new_lo_c = jnp.clip(new_lo, 0.0, bound - 1.0)
    new_hi_c = jnp.clip(new_hi, 0.0, bound - 1.0)
    new_valid = (
        valid
        & jnp.all(new_hi_c - new_lo_c >= min_size, axis=-1)
    )
    return jnp.concatenate([new_lo_c, new_hi_c], axis=-1), new_valid


def boxes_to_anchor_targets_jax(
    boxes,
    classes,
    valid,
    grid_shape: Sequence[int],
    anchors,
    input_shape: Sequence[int],
    n_classes: int = 2,
):
    """
    Jit-safe rasterization of padded corner boxes onto the anchor grid —
    the on-device re-rasterization used after geometric augmentation
    (device analogue of ``boxes_to_anchor_targets``; parity:
    BBToAdjustedAnchorsd, utils/monai_transforms/bounding_boxes.py:198).

    boxes [M, 2*ndim]; classes [M]; valid [M] bool (padding rows False).
    Returns CHANNELS-LAST targets matching the batch layout:
    (objectness [*G, A], center_offsets [*G, A*ndim],
    sizes [*G, A*ndim] log-scale, class_targets [*G, max(1, n_classes-1)]).
    Invalid boxes scatter to index -1 which jnp drops (mode="drop").
    """
    import jax.numpy as jnp

    ndim = len(grid_shape)
    anchors = jnp.asarray(anchors, jnp.float32)
    A = anchors.shape[0]
    stride = jnp.asarray(input_shape, jnp.float32) / jnp.asarray(
        grid_shape, jnp.float32
    )
    lo, hi = boxes[:, :ndim], boxes[:, ndim:]
    center = (lo + hi) / 2.0
    size = jnp.maximum(hi - lo, 1e-3)
    cell = jnp.clip(
        (center / stride).astype(jnp.int32),
        0,
        jnp.asarray(grid_shape, jnp.int32) - 1,
    )
    inter = jnp.prod(jnp.minimum(anchors[None, :, :], size[:, None, :]), -1)
    union = (
        jnp.prod(anchors, -1)[None, :] + jnp.prod(size, -1)[:, None] - inter
    )
    a = jnp.argmax(inter / jnp.maximum(union, 1e-6), axis=-1)  # [M]
    offset = center / stride - cell.astype(jnp.float32)
    logsz = jnp.log(size / jnp.maximum(anchors[a], 1e-6))

    # invalid rows scatter to a POSITIVE out-of-bounds index (dropped by
    # mode="drop"); negative indices would wrap around to the last cell
    cell_w = jnp.where(
        valid[:, None], cell, jnp.asarray(grid_shape, jnp.int32)
    )
    idx = tuple(cell_w[:, d] for d in range(ndim))
    G = tuple(grid_shape)
    obj = jnp.zeros(G + (A,)).at[idx + (a,)].set(1.0, mode="drop")
    ctr = jnp.zeros(G + (A * ndim,))
    sz = jnp.zeros(G + (A * ndim,))
    for d in range(ndim):
        ctr = ctr.at[idx + (a * ndim + d,)].set(offset[:, d], mode="drop")
        sz = sz.at[idx + (a * ndim + d,)].set(logsz[:, d], mode="drop")
    # same channel layout as the numpy builder / YOLONet3d class head
    n_cls = 1 if n_classes == 2 else n_classes
    cls = jnp.zeros(G + (n_cls,))
    if n_classes > 2:
        cls = cls.at[idx + (classes.astype(jnp.int32),)].set(1.0, mode="drop")
    else:
        cls = cls.at[idx + (jnp.zeros_like(a),)].set(
            classes.astype(jnp.float32), mode="drop"
        )
    return obj, ctr, sz, cls
