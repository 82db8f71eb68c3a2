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


_STRUCT = np.ones((3, 3, 3))


def _extract_static(
    softmax: np.ndarray,
    threshold: float,
    min_voxels_detection: int,
    max_prob_round_decimals,
) -> Tuple[np.ndarray, List[Tuple[int, float]], np.ndarray]:
    """Static-threshold extraction, formula-exact vs the reference
    (extract_lesion_candidates.py:19-55): values BELOW threshold are
    cleared (>= survives), 26-connectivity labelling, components with
    count <= min_voxels_detection removed."""
    struct = _STRUCT[
        tuple(slice(None) if d < softmax.ndim else 1 for d in range(3))
    ]
    all_hard_blobs = np.zeros_like(softmax)
    confidences: List[Tuple[int, float]] = []
    clipped = softmax.copy()
    clipped[softmax < threshold] = 0
    blobs_index, num_blobs = ndimage.label(clipped, structure=struct)
    for idx in range(1, num_blobs + 1):
        hard_mask = blobs_index == idx
        if np.count_nonzero(hard_mask) <= min_voxels_detection:
            blobs_index[hard_mask] = 0
            continue
        hard_blob = hard_mask * clipped
        max_prob = np.max(hard_blob)
        if max_prob_round_decimals is not None:
            max_prob = np.round(max_prob, max_prob_round_decimals)
        hard_blob[hard_blob > 0] = max_prob
        all_hard_blobs += hard_blob
        confidences.append((idx, float(max_prob)))
    return all_hard_blobs, confidences, blobs_index


def extract_lesion_candidates(
    softmax: np.ndarray,
    threshold="dynamic-fast",
    min_voxels: int = 10,
    max_prob_round_decimals=None,
    num_lesions_to_extract: int = 5,
    dynamic_threshold_factor: float = 2.5,
    remove_adjacent_lesion_candidates: bool = True,
) -> Tuple[np.ndarray, List[Tuple[int, float]], np.ndarray]:
    """
    Extracts lesion candidates from a heatmap — formula-exact vs the
    reference (extract_lesion_candidates.py:137, defaults included;
    tests/test_reference_parity.py compares against it directly).

    Returns (all_hard_blobs, [(index, confidence)...], indexed_pred).
    ``dynamic``: iteratively take the global-max blob at threshold
    max/dynamic_threshold_factor, skip candidates adjacent to already
    extracted ones, remove, repeat. ``dynamic-fast``: one static pass at
    max/dynamic_threshold_factor. Float: static threshold.
    """
    softmax = np.asarray(softmax, np.float32)

    if threshold == "dynamic":
        struct = _STRUCT[
            tuple(slice(None) if d < softmax.ndim else 1 for d in range(3))
        ]
        working = softmax.copy()
        dynamic_hard_blobs = np.zeros_like(softmax)
        confidences: List[Tuple[int, float]] = []
        dynamic_indexed = np.zeros_like(softmax, dtype=np.int32)
        while len(confidences) < num_lesions_to_extract:
            tumor_index = 1 + len(confidences)
            max_prob = np.max(working)
            if max_prob < 0.01:  # ref failsafe stopping threshold
                break
            thr = max_prob / dynamic_threshold_factor
            all_hard_blobs, _, _ = _extract_static(
                working, thr, min_voxels, max_prob_round_decimals
            )
            # re-computed max: the global max may sit in a too-small blob
            max_prob = np.max(all_hard_blobs)
            if max_prob <= 0.0:
                # every blob at this threshold was below min_voxels —
                # without this guard mask_current = (blobs == 0) selects
                # the ENTIRE volume as one bogus confidence-0 candidate
                break
            mask_current = all_hard_blobs == max_prob
            mask_idx, _ = ndimage.label(mask_current, structure=struct)
            mask_current = mask_idx == 1
            hard_blob = all_hard_blobs * mask_current
            grown = ndimage.binary_dilation(
                dynamic_hard_blobs > 0, structure=struct
            )
            has_overlap = (mask_current & grown).any()
            if not (remove_adjacent_lesion_candidates and has_overlap):
                dynamic_hard_blobs += hard_blob
                confidences.append((tumor_index, float(max_prob)))
                dynamic_indexed += mask_current * tumor_index
            working = working * (~mask_current)
        return dynamic_hard_blobs, confidences, dynamic_indexed

    if threshold == "dynamic-fast":
        threshold = float(np.max(softmax) / dynamic_threshold_factor)
    return _extract_static(
        softmax, float(threshold), min_voxels, max_prob_round_decimals
    )


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

    Matching is the reference's OPTIMAL assignment
    (picai_eval/analysis_utils.py:80, scipy linear_sum_assignment over the
    candidate/GT IoU matrix), not greedy best-first: with overlapping
    candidates, greedy can steal a candidate from the only lesion it could
    match.
    """
    if y_det_postprocess_func is not None:
        y_det = y_det_postprocess_func(y_det)
    # detection-map contract (ref eval.py:53): y_det holds connected
    # components of uniform confidence; candidates ARE its components with
    # their (unrounded) max. Candidate extraction from a raw softmax map is
    # the caller's job via y_det_postprocess_func (the reference wires
    # extract_lesion_candidates there, segmentation/pl.py:604-611)
    y_det = np.asarray(y_det, np.float32)
    # 26-connectivity like the reference's parse_detection_map
    # (analysis_utils.py:27-38) — 6-connectivity would split diagonal blobs
    struct = _STRUCT[
        tuple(slice(None) if d < y_det.ndim else 1 for d in range(3))
    ]
    indexed_pred, n_cand = ndimage.label(y_det > 0, structure=struct)
    confidences = [
        (cand_id, float(y_det[indexed_pred == cand_id].max()))
        for cand_id in range(1, n_cand + 1)
    ]

    y_true = np.asarray(y_true) > 0.5
    gt_labels, n_gt = ndimage.label(y_true, structure=struct)
    lesion_results: List[Tuple[int, float]] = []
    matched_candidates = set()

    if n_gt > 0 and confidences:
        from scipy.optimize import linear_sum_assignment

        iou = np.zeros((n_gt, len(confidences)), np.float64)
        gts = [gt_labels == gt_id for gt_id in range(1, n_gt + 1)]
        cands = [indexed_pred == cand_id for cand_id, _ in confidences]
        for i, gt in enumerate(gts):
            for j, cand in enumerate(cands):
                inter = np.logical_and(gt, cand).sum()
                union = np.logical_or(gt, cand).sum()
                iou[i, j] = inter / union if union else 0.0
        # reference semantics (picai_eval/eval.py:176-185): zero
        # sub-threshold overlaps, then add 1 to every remaining pair so
        # the assignment maximizes the NUMBER of matched lesions first and
        # the amount of overlap only second
        iou[iou < min_overlap] = 0.0
        iou[iou > 0] += 1.0
        rows, cols = linear_sum_assignment(iou, maximize=True)
        assigned = {}
        for i, j in zip(rows, cols):
            if iou[i, j] > 0:
                assigned[i] = j
                matched_candidates.add(confidences[j][0])
        for i in range(n_gt):
            if i in assigned:
                lesion_results.append((1, confidences[assigned[i]][1]))
            else:
                lesion_results.append((1, 0.0))  # missed lesion
        # unmatched candidates that still overlap SOME GT lesion above
        # threshold are not FPs (reference default
        # allow_unmatched_candidates_with_minimal_overlap=True,
        # eval.py:219-226)
        for j, (cand_id, _) in enumerate(confidences):
            if (iou[:, j] > 0).any():
                matched_candidates.add(cand_id)
    else:
        lesion_results.extend((1, 0.0) for _ in range(n_gt))
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
        from sklearn.metrics import precision_recall_curve

        flat = [r for rs in self.lesion_results.values() for r in rs]
        if not flat or not any(is_l for is_l, _ in flat):
            return float("nan")
        y = np.asarray([is_l for is_l, _ in flat])
        p = np.asarray([conf for _, conf in flat])
        precision, recall, thresholds = precision_recall_curve(y, p)
        # missed lesions enter as confidence-0 placeholders; the reference
        # zeroes precision at the zero threshold so they convey recall
        # without crediting precision (picai_eval/metrics.py:371-374) —
        # plain average_precision_score inflates AP whenever a GT lesion
        # is missed
        precision[:-1][thresholds == 0] = 0
        return float(-np.sum(np.diff(recall) * np.asarray(precision)[:-1]))

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
        # same zero-threshold precision zeroing as AP (missed-lesion
        # placeholders must not credit precision) — without it the
        # returned curve integrates to a HIGHER value than the AP it is
        # plotted next to whenever any GT lesion was missed
        prec = np.array(prec)
        prec[:-1][thr == 0] = 0
        return prec, rec, thr

    def froc(self) -> Tuple[np.ndarray, np.ndarray]:
        """
        FROC curve (parity: picai_eval/analysis_utils.py:200): lesion
        sensitivity vs mean false positives per case, swept over candidate
        confidence thresholds. Returns (fp_per_case, sensitivity), both
        increasing with decreasing threshold.
        """
        n_cases = max(len(self.lesion_results), 1)
        gts, fps = [], []
        for rs in self.lesion_results.values():
            for is_l, conf in rs:
                (gts if is_l else fps).append(conf)
        gts_arr = np.asarray(gts, np.float64)
        fps_arr = np.asarray(fps, np.float64)
        n_gt = max(len(gts_arr), 1)
        thresholds = np.unique(
            np.concatenate([gts_arr[gts_arr > 0], fps_arr])
        )[::-1]
        sens, fp_rate = [], []
        for t in thresholds:
            sens.append(float((gts_arr >= t).sum()) / n_gt)
            fp_rate.append(float((fps_arr >= t).sum()) / n_cases)
        return np.asarray(fp_rate), np.asarray(sens)

    def froc_score(self, fp_points: Sequence[float] = (0.125, 0.25, 0.5, 1, 2, 4, 8)):
        """Mean sensitivity at the standard FROC FP/case operating points."""
        fp, sens = self.froc()
        if len(fp) == 0:
            return float("nan")
        vals = [
            float(sens[fp <= pt][-1]) if np.any(fp <= pt) else 0.0
            for pt in fp_points
        ]
        return float(np.mean(vals))

    def bootstrap(
        self, n_bootstraps: int = 1000, ci: float = 0.95, seed: int = 42
    ) -> Dict[str, Tuple[float, float, float]]:
        """
        Case-resampled bootstrap CIs for AP/AUROC/score (parity:
        utils/bootstrap_metrics.py + picai_eval bootstrapping). Returns
        {metric: (point, ci_low, ci_high)}.
        """
        rng = np.random.default_rng(seed)
        sids = list(self.lesion_results.keys())
        n = len(sids)
        samples: Dict[str, List[float]] = {"AP": [], "auroc": [], "score": []}
        for _ in range(n_bootstraps):
            pick = rng.integers(0, n, size=n)
            m = Metrics(
                lesion_results={
                    f"{i}_{sids[j]}": self.lesion_results[sids[j]]
                    for i, j in enumerate(pick)
                },
                case_pred={
                    f"{i}_{sids[j]}": self.case_pred[sids[j]]
                    for i, j in enumerate(pick)
                },
                case_target={
                    f"{i}_{sids[j]}": self.case_target[sids[j]]
                    for i, j in enumerate(pick)
                },
            )
            # evaluate each curve ONCE; the score property would recompute
            # AP and auroc a second time per resample
            ap, auc = m.AP, m.auroc
            sc = float(np.nanmean([ap, auc]))
            for k, v in (("AP", ap), ("auroc", auc), ("score", sc)):
                if np.isfinite(v):
                    samples[k].append(v)
        alpha = (1 - ci) / 2
        out = {}
        ap, auc = self.AP, self.auroc
        for k, point in (
            ("AP", ap),
            ("auroc", auc),
            ("score", float(np.nanmean([ap, auc]))),
        ):
            vs = samples[k]
            if vs:
                out[k] = (
                    float(point),
                    float(np.quantile(vs, alpha)),
                    float(np.quantile(vs, 1 - alpha)),
                )
            else:
                out[k] = (float(point), float("nan"), float("nan"))
        return out

    # -- persistence (parity: picai_eval/metrics.py:466-499 save/load via
    # data_utils.py save_metrics/load_metrics: sterilized JSON, atomic
    # tmp+rename write) --------------------------------------------------
    def minimal_dict(self) -> Dict:
        return {
            "lesion_results": {
                k: [[int(tp), float(conf)] for tp, conf in v]
                for k, v in self.lesion_results.items()
            },
            "case_pred": {k: float(v) for k, v in self.case_pred.items()},
            "case_target": {k: int(v) for k, v in self.case_target.items()},
        }

    def as_dict(self) -> Dict:
        return {
            **self.minimal_dict(),
            "AP": self.AP,
            "auroc": self.auroc,
            "score": self.score,
        }

    def save(self, path: str):
        import json
        import os

        tmp = str(path) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.as_dict(), f, indent=4)
        os.rename(tmp, path)

    @classmethod
    def load(cls, path: str) -> "Metrics":
        import json

        with open(path) as f:
            d = json.load(f)
        return cls(
            lesion_results={
                k: [(int(tp), float(conf)) for tp, conf in v]
                for k, v in d["lesion_results"].items()
            },
            case_pred={k: float(v) for k, v in d["case_pred"].items()},
            case_target={
                k: int(float(v)) for k, v in d["case_target"].items()
            },
        )


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
