"""
On-device batch-level preprocessing: label smoothing, mixup, partial mixup.

Parity target: adell_mri/utils/batch_preprocessing.py — mixup (:30),
partial_mixup (:68), BatchPreprocessing (:116). Runs inside the jit step
(it already did in the reference — the one piece of its pipeline that was
on-device).
"""

from typing import Optional

import jax
import jax.numpy as jnp


def label_smoothing(y, smoothing: float):
    """y in [0,1] -> y*(1-2s)+s (binary convention of the reference)."""
    return y * (1.0 - 2.0 * smoothing) + smoothing


def mixup(key, x, y, alpha: float):
    """Beta(alpha, alpha) convex combination with a shuffled batch (:30)."""
    lam = jax.random.beta(key, alpha, alpha)
    perm = jax.random.permutation(
        jax.random.fold_in(key, 1), x.shape[0]
    )
    x_mix = lam * x + (1 - lam) * x[perm]
    y = y.astype(jnp.float32)
    y_mix = lam * y + (1 - lam) * y[perm]
    return x_mix, y_mix


def partial_mixup(key, x, y, alpha: float, fraction: float):
    """Mixup applied to a random fraction of the batch (:68)."""
    x_mix, y_mix = mixup(key, x, y, alpha)
    sel = jax.random.bernoulli(
        jax.random.fold_in(key, 2), fraction, (x.shape[0],)
    )
    sel_x = sel.reshape((-1,) + (1,) * (x.ndim - 1))
    sel_y = sel.reshape((-1,) + (1,) * (y.ndim - 1))
    return (
        jnp.where(sel_x, x_mix, x),
        jnp.where(sel_y, y_mix, y.astype(jnp.float32)),
    )


class BatchPreprocessing:
    """Callable bundle (parity: batch_preprocessing.py:116).

    The reference's smoothing/mixup are binary-only ("works only for
    binary", batch_preprocessing.py:17); mixing INTEGER class indices for
    n_classes > 2 fabricates wrong classes (lam=0.6 over classes 2 and 0
    -> 1.2 -> class 1). For multiclass this one-hots the labels first and
    returns SOFT [B, C] targets (cross_entropy_loss consumes them
    directly)."""

    def __init__(
        self,
        label_smoothing_param: Optional[float] = None,
        mixup_alpha: Optional[float] = None,
        partial_mixup_fraction: Optional[float] = None,
        seed: int = 42,
        n_classes: int = 2,
    ):
        self.label_smoothing = label_smoothing_param
        self.mixup_alpha = mixup_alpha
        self.partial_mixup_fraction = partial_mixup_fraction
        self.n_classes = n_classes

    def __call__(self, key, x, y):
        multiclass = self.n_classes > 2
        if multiclass and y.ndim == 1:
            y = jax.nn.one_hot(y.astype(jnp.int32), self.n_classes)
        if self.mixup_alpha is not None:
            if self.partial_mixup_fraction is not None:
                x, y = partial_mixup(
                    key, x, y, self.mixup_alpha, self.partial_mixup_fraction
                )
            else:
                x, y = mixup(key, x, y, self.mixup_alpha)
        if self.label_smoothing is not None:
            s = self.label_smoothing
            if multiclass:
                y = y.astype(jnp.float32) * (1.0 - s) + s / self.n_classes
            else:
                y = label_smoothing(y.astype(jnp.float32), s)
        return x, y
