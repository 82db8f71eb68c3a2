"""
Conformal prediction (adaptive prediction sets).

Parity target: adell_mri/modules/conformal_prediction/conformal.py:7
(AdaptivePredictionSets, used by ClassPLABC.calibrate /
predict_calibrated_step, classification/pl.py:394-459).
"""

from typing import Optional

import numpy as np


class AdaptivePredictionSets:
    """
    APS: calibrate a cumulative-probability threshold on held-out data so
    that prediction sets contain the true label with prob >= 1 - alpha.
    """

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.q_hat: Optional[float] = None

    def calibrate(self, probs: np.ndarray, labels: np.ndarray):
        """probs [N, C] softmax; labels [N] int."""
        probs = np.asarray(probs)
        labels = np.asarray(labels).astype(int)
        n = len(probs)
        order = np.argsort(-probs, axis=1)
        ranks = np.empty_like(order)
        rows = np.arange(n)[:, None]
        ranks[rows, order] = np.arange(probs.shape[1])[None]
        sorted_probs = np.take_along_axis(probs, order, axis=1)
        cumsum = np.cumsum(sorted_probs, axis=1)
        true_rank = ranks[np.arange(n), labels]
        scores = cumsum[np.arange(n), true_rank]
        q_level = np.ceil((n + 1) * (1 - self.alpha)) / n
        # method="higher" is load-bearing: linear interpolation yields a
        # smaller threshold and forfeits the finite-sample >= 1-alpha
        # coverage guarantee (parity: conformal torch.quantile
        # interpolation='higher')
        self.q_hat = float(
            np.quantile(scores, min(q_level, 1.0), method="higher")
        )
        return self

    def __call__(self, probs: np.ndarray) -> np.ndarray:
        """Returns boolean membership [N, C] of the prediction sets."""
        if self.q_hat is None:
            raise RuntimeError("call calibrate() first")
        probs = np.asarray(probs)
        order = np.argsort(-probs, axis=1)
        sorted_probs = np.take_along_axis(probs, order, axis=1)
        cumsum = np.cumsum(sorted_probs, axis=1)
        include_sorted = cumsum <= self.q_hat
        # always include the top-1
        include_sorted[:, 0] = True
        out = np.zeros_like(include_sorted)
        np.put_along_axis(out, order, include_sorted, axis=1)
        return out
