"""
Classification losses.

Parity targets: adell_mri/modules/classification/losses.py —
ordinal_sigmoidal_loss (:9), OrdinalSigmoidalLoss (:82); plus the standard
CE/BCE/focal wrappers routed by utils.loss_factory in classification
entrypoints.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import optax


def binary_logistic_loss(logits, labels, weight: Optional[float] = None):
    """BCE-with-logits; ``weight`` scales the positive class."""
    logits = logits[..., 0] if logits.ndim > labels.ndim else logits
    labels = labels.astype(logits.dtype)
    per = optax.sigmoid_binary_cross_entropy(logits, labels)
    if weight is not None:
        per = per * jnp.where(labels > 0.5, weight, 1.0)
    return jnp.mean(per)


def cross_entropy_loss(logits, labels, weight=None, label_smoothing: float = 0.0):
    n_classes = logits.shape[-1]
    if labels.ndim == logits.ndim and labels.shape[-1] == n_classes:
        # soft targets (mixup / pre-smoothed one-hot from
        # BatchPreprocessing with n_classes > 2)
        oh = labels.astype(jnp.float32)
    else:
        oh = jax.nn.one_hot(labels.astype(jnp.int32), n_classes)
    if label_smoothing > 0:
        oh = oh * (1 - label_smoothing) + label_smoothing / n_classes
    logp = jax.nn.log_softmax(logits)
    per = -jnp.sum(oh * logp, axis=-1)
    if weight is not None:
        # soft targets: expected class weight under the target distribution
        w = jnp.sum(oh * jnp.asarray(weight), axis=-1)
        per = per * w
    return jnp.mean(per)


def focal_loss(logits, labels, alpha: float = 0.25, gamma: float = 2.0):
    """Binary focal on logits."""
    logits = logits[..., 0] if logits.ndim > labels.ndim else logits
    labels = labels.astype(logits.dtype)
    p = jax.nn.sigmoid(logits)
    pt = labels * p + (1 - labels) * (1 - p)
    alpha_t = labels * alpha + (1 - labels) * (1 - alpha)
    return jnp.mean(-alpha_t * (1 - pt) ** gamma * jnp.log(jnp.clip(pt, 1e-6)))


def ordinal_sigmoidal_loss(
    logits, labels, n_classes: int, weight=None
):
    """
    Ordinal loss on cumulative-threshold logits [B, n_classes-1]
    (parity: classification/losses.py:9): target k -> first k thresholds
    positive.
    """
    k = labels.astype(jnp.int32)
    thresholds = jnp.arange(n_classes - 1)
    target = (thresholds[None, :] < k[:, None]).astype(logits.dtype)
    per = optax.sigmoid_binary_cross_entropy(logits, target)
    if weight is not None:
        w = jnp.asarray(weight)[k]
        per = per * w[:, None]
    return jnp.mean(jnp.sum(per, axis=-1))


def ordinal_prediction_to_class(logits):
    """Predicted class = number of positive thresholds."""
    return jnp.sum(jax.nn.sigmoid(logits) > 0.5, axis=-1)


def ordinal_to_class_probs(logits):
    """Cumulative threshold logits [..., n_classes-1] -> class probabilities.

    OrdNet emits ``P(y > k)`` logits; treating them as class logits makes
    class ``n_classes-1`` unreachable under argmax and corrupts AUC/accuracy.
    ``P(y = k) = P(y > k-1) - P(y > k)`` with ``P(y > -1) = 1`` and
    ``P(y > n_classes-1) = 0``; clamped at 1e-9 and renormalized because
    unordered threshold estimates can make the difference negative.
    Shared by the validation-epoch callback and the test/predict
    entrypoints so train-time and serving metrics agree.
    """
    cum = jax.nn.sigmoid(logits)
    upper = jnp.concatenate([jnp.ones_like(cum[..., :1]), cum], axis=-1)
    lower = jnp.concatenate([cum, jnp.zeros_like(cum[..., :1])], axis=-1)
    p = jnp.maximum(upper - lower, 1e-9)
    return p / jnp.sum(p, axis=-1, keepdims=True)
