"""
Detection losses.

Parity targets: adell_mri/modules/object_detection/losses.py —
complete_iou_loss (:7) and the YOLO composite loss used by YOLONet3dPL
(object_detection/pl.py:37): focal objectness + CIoU/regression on positive
cells + class CE.
"""

from typing import Dict

import jax
import jax.numpy as jnp
import optax


def box_volume(boxes):
    ndim = boxes.shape[-1] // 2
    return jnp.prod(
        jnp.maximum(boxes[..., ndim:] - boxes[..., :ndim], 0.0), axis=-1
    )


def complete_iou_components(pred_boxes, true_boxes, eps: float = 1e-6):
    """
    The reference's CIoU decomposition, formula-exact (ref
    object_detection/losses.py:7 — INCLUSIVE box sizes (+1), pairwise
    arctan aspect-RATIO terms over dimension pairs, cpd = center dist /
    enclosing-box diagonal). Returns (iou, cpd_component, ar_component).
    """
    from itertools import combinations

    ndim = pred_boxes.shape[-1] // 2
    a_tl, b_tl = pred_boxes[..., :ndim], true_boxes[..., :ndim]
    a_br, b_br = pred_boxes[..., ndim:], true_boxes[..., ndim:]
    inter_tl = jnp.maximum(a_tl, b_tl)
    inter_br = jnp.minimum(a_br, b_br)
    a_size = a_br - a_tl + 1
    b_size = b_br - b_tl + 1
    inter_size = inter_br - inter_tl + 1
    a_center = (a_tl + a_br) / 2
    b_center = (b_tl + b_br) / 2
    diag_tl = jnp.minimum(a_tl, b_tl)
    diag_br = jnp.maximum(a_br, b_br)
    inter_area = jnp.prod(inter_size, axis=-1)
    union_area = (
        jnp.prod(a_size, axis=-1) + jnp.prod(b_size, axis=-1) - inter_area
    )
    iou = jnp.where(union_area > 0.0, inter_area / union_area, 0.0)
    center_distance = jnp.sum((a_center - b_center) ** 2, axis=-1)
    bb_distance = jnp.sum((diag_br - diag_tl) ** 2, axis=-1)
    # eps guard: bb_distance is 0 only for IDENTICAL boxes (0/0 in the
    # reference); NaN here would poison masked grid-wide evaluations via
    # 0 * NaN even at cells the loss ignores
    cpd_component = center_distance / jnp.maximum(bb_distance, eps)
    pis = jnp.pi**2
    ar_list = [
        4
        / pis
        * (
            jnp.arctan(a_size[..., i] / a_size[..., j])
            - jnp.arctan(b_size[..., i] / b_size[..., j])
        )
        ** 2
        for i, j in combinations(range(ndim), 2)
    ]
    v = sum(ar_list) / len(ar_list)
    # eps guard: the reference's alpha is 0/0=NaN for IDENTICAL boxes
    # (iou=1, v=0); indistinguishable for any real pair, NaN-free in
    # training when a prediction lands exactly on its target
    alpha = v / jnp.maximum((1 - iou) + v, eps)
    ar_component = v * alpha
    return iou, cpd_component, ar_component


def complete_iou_loss(pred_boxes, true_boxes, eps: float = 1e-6):
    """Combined CIoU loss: 1 - IoU + cpd + ar (the reference's PL step
    combines the three components the same way, object_detection/pl.py)."""
    iou, cpd, ar = complete_iou_components(pred_boxes, true_boxes, eps)
    return 1 - iou + cpd + ar


def yolo_loss(
    predictions: Dict,
    targets: Dict,
    lam_obj: float = 1.0,
    lam_reg: float = 5.0,
    lam_cls: float = 1.0,
    focal_gamma: float = 2.0,
    n_classes: int = 2,
    anchors=None,
    input_shape=None,
):
    """
    Composite YOLO loss. predictions/targets: channels-last grid maps
    (targets built by boxes_to_anchor_targets, moved to channels-last).

    With ``anchors`` + ``input_shape`` the regression term is the
    reference's CIoU composition on decoded boxes at positive cells —
    (1-IoU) + cpd + ar — and the objectness target at positive cells is
    the detached IoU (object_detection/pl.py calculate_loss:143-186).
    Without them it falls back to plain MSE on the grid encodings.
    Multiclass class targets take softmax CE at positive cells (the
    reference's long-target cross entropy); binary stays sigmoid BCE.
    """
    obj_logits = predictions["objectness"]
    obj_t = targets["objectness"]
    pos = obj_t  # [B, *G, A]
    A = obj_t.shape[-1]
    ndim = predictions["center_offsets"].shape[-1] // A
    grid_shape = obj_t.shape[1:-1]
    npos = jnp.maximum(jnp.sum(pos), 1.0)

    if anchors is not None and input_shape is not None:
        anchors_a = jnp.asarray(anchors, jnp.float32)  # [A, ndim]
        stride = jnp.asarray(input_shape, jnp.float32) / jnp.asarray(
            grid_shape, jnp.float32
        )

        def decode(ctr, sz):
            # [B, *G, A*ndim] -> corner boxes [B, *G, A, 2*ndim]
            shp = ctr.shape[:-1] + (A, ndim)
            ctr = ctr.reshape(shp)
            sz = sz.reshape(shp)
            cells = jnp.stack(
                jnp.meshgrid(
                    *[
                        jnp.arange(g, dtype=jnp.float32)
                        for g in grid_shape
                    ],
                    indexing="ij",
                ),
                axis=-1,
            )[None, ..., None, :]  # [1, *G, 1, ndim]
            center = (cells + ctr) * stride
            size = anchors_a * jnp.exp(sz)
            return jnp.concatenate(
                [center - size / 2, center + size / 2], axis=-1
            )

        pb = decode(predictions["center_offsets"], predictions["sizes"])
        tb = decode(targets["center_offsets"], targets["sizes"])
        iou, cpd, ar = complete_iou_components(pb, tb)
        ctr_loss = jnp.sum(pos * ((1.0 - iou) + cpd)) / npos
        size_loss = jnp.sum(pos * ar) / npos
        # soft objectness target: detached IoU at positive cells (ref
        # :175-177); clipped because the inclusive-size IoU is unbounded
        # below for disjoint boxes and BCE needs a [0,1] target
        obj_t = jnp.where(
            pos > 0,
            jax.lax.stop_gradient(jnp.clip(iou, 0.0, 1.0)),
            0.0,
        )
    else:
        pos_rep = jnp.repeat(pos, ndim, axis=-1)
        ctr_loss = jnp.sum(
            pos_rep
            * (predictions["center_offsets"] - targets["center_offsets"])
            ** 2
        ) / jnp.maximum(jnp.sum(pos_rep), 1.0)
        size_loss = jnp.sum(
            pos_rep * (predictions["sizes"] - targets["sizes"]) ** 2
        ) / jnp.maximum(jnp.sum(pos_rep), 1.0)

    # focal objectness
    p = jax.nn.sigmoid(obj_logits)
    pt = obj_t * p + (1 - obj_t) * (1 - p)
    bce = optax.sigmoid_binary_cross_entropy(obj_logits, obj_t)
    obj_loss = jnp.mean((1 - pt) ** focal_gamma * bce)

    cls_logits = predictions["classes"]
    cls_t = targets["classes"]
    pos_any = jnp.max(pos, axis=-1, keepdims=True)
    if n_classes > 2:
        ce = optax.softmax_cross_entropy(cls_logits, cls_t)[..., None]
        cls_loss = jnp.sum(pos_any * ce) / jnp.maximum(
            jnp.sum(pos_any), 1.0
        )
    else:
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
