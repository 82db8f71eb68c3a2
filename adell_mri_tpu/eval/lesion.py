"""
Lesion-level evaluation (PI-CAI style).

Parity targets: adell_mri/modules/extract_lesion_candidates.py (:19,58,137 —
static/dynamic-threshold candidate extraction with connected components) and
adell_mri/modules/segmentation/picai_eval/ (eval.py:53,294 per-case lesion
matching + thread-pooled evaluate; metrics.py:37 Metrics with lesion-level
AP and case-level AUC). Pure numpy/scipy (device-independent), matching the
reference's published semantics: a candidate hits a GT lesion when IoU >
``min_overlap``; unmatched candidates are false positives; case-level score
is the max lesion confidence.
"""

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from scipy import ndimage


def extract_lesion_candidates(
    softmax: np.ndarray,
    threshold: str = "dynamic",
    min_voxels: int = 10,
    max_prob_round_decimals: int = 4,
    num_lesions_to_extract: int = 5,
    dynamic_threshold_factor: float = 2.5,
) -> Tuple[np.ndarray, List[Tuple[int, float]], np.ndarray]:
    """
    Extracts lesion candidates from a heatmap
    (parity: extract_lesion_candidates.py:137).

    Returns (all_hard_blobs, [(index, confidence)...], indexed_pred).
    ``dynamic``: iteratively take the max-probability blob above
    max/dynamic_threshold_factor, remove, repeat.
    """
    softmax = np.asarray(softmax, np.float32)
    all_hard_blobs = np.zeros_like(softmax)
    indexed_pred = np.zeros_like(softmax, dtype=np.int32)
    confidences: List[Tuple[int, float]] = []

    if threshold == "dynamic":
        working = softmax.copy()
        idx = 0
        while idx < num_lesions_to_extract:
            max_prob = float(working.max())
            if max_prob < 1e-5:
                break
            thr = max_prob / dynamic_threshold_factor
            mask = working > thr
            labels, n = ndimage.label(mask)
            if n == 0:
                break
            # the blob containing the global max
            max_pos = np.unravel_index(np.argmax(working), working.shape)
            blob_id = labels[max_pos]
            blob = labels == blob_id
            if blob.sum() >= min_voxels:
                idx += 1
                conf = round(max_prob, max_prob_round_decimals)
                confidences.append((idx, conf))
                all_hard_blobs[blob] = conf
                indexed_pred[blob] = idx
            working[blob] = 0.0
    else:
        thr = float(threshold)
        mask = softmax > thr
        labels, n = ndimage.label(mask)
        idx = 0
        for blob_id in range(1, n + 1):
            blob = labels == blob_id
            if blob.sum() < min_voxels:
                continue
            idx += 1
            conf = round(float(softmax[blob].max()), max_prob_round_decimals)
            confidences.append((idx, conf))
            all_hard_blobs[blob] = conf
            indexed_pred[blob] = idx
    return all_hard_blobs, confidences, indexed_pred


def evaluate_case(
    y_det: np.ndarray,
    y_true: np.ndarray,
    min_overlap: float = 0.10,
    y_det_postprocess_func=None,
) -> Tuple[List[Tuple[int, float]], float]:
    """
    Single-case lesion matching (parity: picai_eval/eval.py:53).
    Returns (lesion_results, case_confidence): lesion_results is
    [(is_lesion, confidence)] per GT lesion and per unmatched candidate FP.
    """
    if y_det_postprocess_func is not None:
        y_det = y_det_postprocess_func(y_det)
    _, confidences, indexed_pred = extract_lesion_candidates(y_det)

    y_true = np.asarray(y_true) > 0.5
    gt_labels, n_gt = ndimage.label(y_true)
    lesion_results: List[Tuple[int, float]] = []
    matched_candidates = set()

    for gt_id in range(1, n_gt + 1):
        gt = gt_labels == gt_id
        best_iou, best_cand, best_conf = 0.0, None, 0.0
        for cand_id, conf in confidences:
            if cand_id in matched_candidates:
                continue
            cand = indexed_pred == cand_id
            inter = np.logical_and(gt, cand).sum()
            union = np.logical_or(gt, cand).sum()
            iou = inter / union if union else 0.0
            if iou > best_iou:
                best_iou, best_cand, best_conf = iou, cand_id, conf
        if best_iou > min_overlap and best_cand is not None:
            matched_candidates.add(best_cand)
            lesion_results.append((1, best_conf))
        else:
            lesion_results.append((1, 0.0))  # missed lesion
    for cand_id, conf in confidences:
        if cand_id not in matched_candidates:
            lesion_results.append((0, conf))

    case_conf = max((c for _, c in confidences), default=0.0)
    return lesion_results, case_conf


@dataclass
class Metrics:
    """
    Aggregated lesion/case metrics (parity: picai_eval/metrics.py:37):
    lesion-level average precision (AP), case-level AUROC, and their mean
    ("PI-CAI score").
    """

    lesion_results: Dict[str, List[Tuple[int, float]]] = field(
        default_factory=dict
    )
    case_pred: Dict[str, float] = field(default_factory=dict)
    case_target: Dict[str, int] = field(default_factory=dict)

    @property
    def AP(self) -> float:
        from sklearn.metrics import average_precision_score

        flat = [r for rs in self.lesion_results.values() for r in rs]
        if not flat or not any(is_l for is_l, _ in flat):
            return float("nan")
        y = np.asarray([is_l for is_l, _ in flat])
        p = np.asarray([conf for _, conf in flat])
        return float(average_precision_score(y, p))

    @property
    def auroc(self) -> float:
        from sklearn.metrics import roc_auc_score

        y = np.asarray(list(self.case_target.values()))
        p = np.asarray(list(self.case_pred.values()))
        if len(np.unique(y)) < 2:
            return float("nan")
        return float(roc_auc_score(y, p))

    @property
    def score(self) -> float:
        return float(np.nanmean([self.AP, self.auroc]))

    def precision_recall(self):
        from sklearn.metrics import precision_recall_curve

        flat = [r for rs in self.lesion_results.values() for r in rs]
        y = np.asarray([is_l for is_l, _ in flat])
        p = np.asarray([conf for _, conf in flat])
        prec, rec, thr = precision_recall_curve(y, p)
        return prec, rec, thr


def evaluate(
    y_det: Sequence[np.ndarray],
    y_true: Sequence[np.ndarray],
    subject_list: Optional[Sequence[str]] = None,
    min_overlap: float = 0.10,
    y_det_postprocess_func=None,
    num_parallel_calls: int = 4,
) -> Metrics:
    """Thread-pooled multi-case evaluation (parity: picai_eval/eval.py:294)."""
    if subject_list is None:
        subject_list = [str(i) for i in range(len(y_det))]
    m = Metrics()

    def run_one(args):
        sid, det, true = args
        lesion_results, case_conf = evaluate_case(
            det, true, min_overlap, y_det_postprocess_func
        )
        return sid, lesion_results, case_conf, int(np.any(true > 0.5))

    with ThreadPoolExecutor(max_workers=num_parallel_calls) as pool:
        for sid, lr, conf, target in pool.map(
            run_one, zip(subject_list, y_det, y_true)
        ):
            m.lesion_results[sid] = lr
            m.case_pred[sid] = conf
            m.case_target[sid] = target
    return m
