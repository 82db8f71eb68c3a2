"""
Detection losses.

Parity targets: adell_mri/modules/object_detection/losses.py —
complete_iou_loss (:7) and the YOLO composite loss used by YOLONet3dPL
(object_detection/pl.py:37): focal objectness + CIoU/regression on positive
cells + class CE.
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax


def box_volume(boxes):
    ndim = boxes.shape[-1] // 2
    return jnp.prod(
        jnp.maximum(boxes[..., ndim:] - boxes[..., :ndim], 0.0), axis=-1
    )


def complete_iou_loss(pred_boxes, true_boxes, eps: float = 1e-6):
    """
    CIoU in n dims (parity: losses.py:7): 1 - IoU + center distance /
    enclosing diagonal + aspect consistency.
    """
    ndim = pred_boxes.shape[-1] // 2
    lo = jnp.maximum(pred_boxes[..., :ndim], true_boxes[..., :ndim])
    hi = jnp.minimum(pred_boxes[..., ndim:], true_boxes[..., ndim:])
    inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
    union = box_volume(pred_boxes) + box_volume(true_boxes) - inter
    iou = inter / jnp.maximum(union, eps)

    pc = (pred_boxes[..., :ndim] + pred_boxes[..., ndim:]) / 2
    tc = (true_boxes[..., :ndim] + true_boxes[..., ndim:]) / 2
    center_dist = jnp.sum((pc - tc) ** 2, axis=-1)
    enc_lo = jnp.minimum(pred_boxes[..., :ndim], true_boxes[..., :ndim])
    enc_hi = jnp.maximum(pred_boxes[..., ndim:], true_boxes[..., ndim:])
    diag = jnp.sum((enc_hi - enc_lo) ** 2, axis=-1)

    ps = jnp.maximum(pred_boxes[..., ndim:] - pred_boxes[..., :ndim], eps)
    ts = jnp.maximum(true_boxes[..., ndim:] - true_boxes[..., :ndim], eps)
    v = jnp.mean((jnp.arctan(ts) - jnp.arctan(ps)) ** 2, axis=-1) * (
        4 / jnp.pi**2
    )
    alpha = v / jnp.maximum(1 - iou + v, eps)
    return 1 - iou + center_dist / jnp.maximum(diag, eps) + alpha * v


def yolo_loss(
    predictions: Dict,
    targets: Dict,
    lam_obj: float = 1.0,
    lam_reg: float = 5.0,
    lam_cls: float = 1.0,
    focal_gamma: float = 2.0,
    n_classes: int = 2,
):
    """
    Composite YOLO loss. predictions/targets: channels-last grid maps
    (targets built by boxes_to_anchor_targets, moved to channels-last).
    """
    obj_logits = predictions["objectness"]
    obj_t = targets["objectness"]
    # focal objectness
    p = jax.nn.sigmoid(obj_logits)
    pt = obj_t * p + (1 - obj_t) * (1 - p)
    bce = optax.sigmoid_binary_cross_entropy(obj_logits, obj_t)
    obj_loss = jnp.mean((1 - pt) ** focal_gamma * bce)

    pos = obj_t  # [B, *G, A]
    ndim = (predictions["center_offsets"].shape[-1]) // obj_t.shape[-1]
    pos_rep = jnp.repeat(pos, ndim, axis=-1)
    ctr_loss = jnp.sum(
        pos_rep * (predictions["center_offsets"] - targets["center_offsets"]) ** 2
    ) / jnp.maximum(jnp.sum(pos_rep), 1.0)
    size_loss = jnp.sum(
        pos_rep * (predictions["sizes"] - targets["sizes"]) ** 2
    ) / jnp.maximum(jnp.sum(pos_rep), 1.0)

    cls_logits = predictions["classes"]
    cls_t = targets["classes"]
    pos_any = jnp.max(pos, axis=-1, keepdims=True)
    cls_loss = jnp.sum(
        pos_any * optax.sigmoid_binary_cross_entropy(cls_logits, cls_t)
    ) / jnp.maximum(jnp.sum(pos_any), 1.0)

    total = (
        lam_obj * obj_loss
        + lam_reg * (ctr_loss + size_loss)
        + lam_cls * cls_loss
    )
    return total, {
        "objectness": obj_loss,
        "center": ctr_loss,
        "size": size_loss,
        "class": cls_loss,
    }
