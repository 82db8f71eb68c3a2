"""
Scalar evaluation metrics (numpy; device-independent).

Parity: the torchmetrics dictionaries assembled at
adell_mri/modules/segmentation/pl.py:145-192 (Dice/IoU) and
classification/pl.py:99-160 (AUC, F1, calibration error).
"""

from typing import Dict

import numpy as np


def dice_score(pred: np.ndarray, target: np.ndarray, threshold: float = 0.5) -> float:
    p = np.asarray(pred) > threshold
    t = np.asarray(target) > 0.5
    denom = p.sum() + t.sum()
    if denom == 0:
        return 1.0
    return float(2 * np.logical_and(p, t).sum() / denom)


def iou_score(pred: np.ndarray, target: np.ndarray, threshold: float = 0.5) -> float:
    p = np.asarray(pred) > threshold
    t = np.asarray(target) > 0.5
    union = np.logical_or(p, t).sum()
    if union == 0:
        return 1.0
    return float(np.logical_and(p, t).sum() / union)


def auc_score(pred: np.ndarray, target: np.ndarray) -> float:
    from sklearn.metrics import roc_auc_score

    target = np.asarray(target)
    if len(np.unique(target)) < 2:
        return float("nan")
    return float(roc_auc_score(target, np.asarray(pred)))


def expected_calibration_error(
    pred: np.ndarray, target: np.ndarray, n_bins: int = 10
) -> float:
    pred = np.asarray(pred, np.float64)
    target = np.asarray(target, np.float64)
    bins = np.linspace(0, 1, n_bins + 1)
    ece = 0.0
    for i, (lo, hi) in enumerate(zip(bins[:-1], bins[1:])):
        # top bin closes at 1.0 — saturated predictions (exactly 1.0,
        # routine for confident f32 sigmoids) must not fall out of ECE
        mask = (
            (pred >= lo) & (pred <= hi)
            if i == n_bins - 1
            else (pred >= lo) & (pred < hi)
        )
        if mask.sum() == 0:
            continue
        conf = pred[mask].mean()
        acc = target[mask].mean()
        ece += mask.mean() * abs(conf - acc)
    return float(ece)


def binary_metrics(
    pred: np.ndarray, target: np.ndarray, threshold: float = 0.5
) -> Dict[str, float]:
    """Binary metric dictionary (parity: get_metric_dict nc==2,
    classification/pl.py:125-133 — Rec/Spe/Pr/F1/AUC/CalErr)."""
    from sklearn.metrics import f1_score, precision_score, recall_score

    pred = np.asarray(pred)
    target = np.asarray(target).astype(int)
    hard = (pred > threshold).astype(int)
    tn = int(np.sum((hard == 0) & (target == 0)))
    fp = int(np.sum((hard == 1) & (target == 0)))
    out = {
        "accuracy": float((hard == target).mean()),
        "precision": float(precision_score(target, hard, zero_division=0)),
        "recall": float(recall_score(target, hard, zero_division=0)),
        "specificity": float(tn / max(tn + fp, 1)),
        "f1": float(f1_score(target, hard, zero_division=0)),
        "auc": auc_score(pred, target),
        "ece": expected_calibration_error(pred, target),
    }
    return out


def multiclass_metrics(
    probs: np.ndarray, target: np.ndarray, average: str = "macro"
) -> Dict[str, float]:
    """Multiclass metric dictionary (parity: get_metric_dict nc>2,
    classification/pl.py:134-155 — macro Rec/Spe/Pr/F1, OvR AUROC,
    max-probability calibration error). ``probs``: [N, C]; ``target``: [N].
    Also emits per-class precision/recall/f1 (``*_c{k}``)."""
    from sklearn.metrics import (
        f1_score,
        precision_score,
        recall_score,
        roc_auc_score,
    )

    probs = np.asarray(probs, np.float64)
    target = np.asarray(target).astype(int).reshape(-1)
    nc = probs.shape[-1]
    hard = probs.argmax(-1)
    out = {
        "accuracy": float((hard == target).mean()),
        "precision": float(
            precision_score(target, hard, average=average, zero_division=0)
        ),
        "recall": float(
            recall_score(target, hard, average=average, zero_division=0)
        ),
        "f1": float(
            f1_score(target, hard, average=average, zero_division=0)
        ),
    }
    # macro specificity: TN / (TN + FP) one-vs-rest
    specs = []
    for k in range(nc):
        tn = np.sum((hard != k) & (target != k))
        fp = np.sum((hard == k) & (target != k))
        specs.append(tn / max(tn + fp, 1))
    out["specificity"] = float(np.mean(specs))
    present = np.unique(target)
    if len(present) > 1:
        try:
            out["auc"] = float(
                roc_auc_score(
                    target,
                    probs / np.maximum(probs.sum(-1, keepdims=True), 1e-12),
                    multi_class="ovr",
                    average=average,
                    labels=np.arange(nc),
                )
            )
        except ValueError:
            out["auc"] = float("nan")
    else:
        out["auc"] = float("nan")
    # top-label calibration error (torchmetrics CalibrationError semantics)
    conf = probs.max(-1)
    correct = (hard == target).astype(np.float64)
    out["ece"] = expected_calibration_error(conf, correct)
    per_class_p = precision_score(
        target, hard, average=None, zero_division=0, labels=np.arange(nc)
    )
    per_class_r = recall_score(
        target, hard, average=None, zero_division=0, labels=np.arange(nc)
    )
    per_class_f = f1_score(
        target, hard, average=None, zero_division=0, labels=np.arange(nc)
    )
    for k in range(nc):
        out[f"precision_c{k}"] = float(per_class_p[k])
        out[f"recall_c{k}"] = float(per_class_r[k])
        out[f"f1_c{k}"] = float(per_class_f[k])
    return out


def segmentation_class_metrics(
    pred: np.ndarray, target: np.ndarray, n_classes: int
) -> Dict[str, float]:
    """Per-class + macro Dice/IoU for multiclass label maps (parity: the
    per-phase torchmetrics dicts at segmentation/pl.py:145-192)."""
    pred = np.asarray(pred)
    target = np.asarray(target)
    out: Dict[str, float] = {}
    dices, ious = [], []
    for k in range(1, n_classes):  # skip background
        p = pred == k
        t = target == k
        denom = p.sum() + t.sum()
        inter = np.logical_and(p, t).sum()
        union = np.logical_or(p, t).sum()
        d = 1.0 if denom == 0 else float(2 * inter / denom)
        i = 1.0 if union == 0 else float(inter / union)
        out[f"dice_c{k}"] = d
        out[f"iou_c{k}"] = i
        dices.append(d)
        ious.append(i)
    out["dice_macro"] = float(np.mean(dices)) if dices else float("nan")
    out["iou_macro"] = float(np.mean(ious)) if ious else float("nan")
    return out
