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
    for lo, hi in zip(bins[:-1], bins[1:]):
        mask = (pred >= lo) & (pred < hi)
        if mask.sum() == 0:
            continue
        conf = pred[mask].mean()
        acc = target[mask].mean()
        ece += mask.mean() * abs(conf - acc)
    return float(ece)


def binary_metrics(
    pred: np.ndarray, target: np.ndarray, threshold: float = 0.5
) -> Dict[str, float]:
    from sklearn.metrics import f1_score, precision_score, recall_score

    pred = np.asarray(pred)
    target = np.asarray(target).astype(int)
    hard = (pred > threshold).astype(int)
    out = {
        "accuracy": float((hard == target).mean()),
        "precision": float(precision_score(target, hard, zero_division=0)),
        "recall": float(recall_score(target, hard, zero_division=0)),
        "f1": float(f1_score(target, hard, zero_division=0)),
        "auc": auc_score(pred, target),
        "ece": expected_calibration_error(pred, target),
    }
    return out
