"""
Bootstrap confidence intervals for metrics
(parity: adell_mri/utils/bootstrap_metrics.py).
"""

from typing import Callable, Tuple

import numpy as np


def bootstrap_metric(
    metric_fn: Callable[[np.ndarray, np.ndarray], float],
    pred: np.ndarray,
    target: np.ndarray,
    n_bootstraps: int = 1000,
    ci: float = 0.95,
    seed: int = 42,
) -> Tuple[float, float, float]:
    """Returns (point_estimate, ci_low, ci_high) by case resampling."""
    rng = np.random.default_rng(seed)
    pred = np.asarray(pred)
    target = np.asarray(target)
    n = len(pred)
    values = []
    for _ in range(n_bootstraps):
        idx = rng.integers(0, n, size=n)
        try:
            v = metric_fn(pred[idx], target[idx])
        except ValueError:
            continue
        if np.isfinite(v):
            values.append(v)
    if not values:
        return float("nan"), float("nan"), float("nan")
    alpha = (1 - ci) / 2
    return (
        float(metric_fn(pred, target)),
        float(np.quantile(values, alpha)),
        float(np.quantile(values, 1 - alpha)),
    )
