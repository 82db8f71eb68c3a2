"""
Segmentation loss zoo.

Parity target: adell_mri/modules/segmentation/losses.py (:79-810) and the
loss_factory registry (adell_mri/utils/utils.py:38-58) — binary and
multiclass ("categorical") versions of cross-entropy, focal, generalized
Dice, Tversky-focal, combo, hybrid-focal, unified-focal; weighted MSE;
CompoundLoss (:811-885).

Conventions (channels-last, matching the model outputs):
- binary: ``pred`` are probabilities in [0,1] shaped [B, *S, 1] or [B, *S];
  ``target`` is {0,1} with the same (broadcastable) shape.
- multiclass: ``pred`` are softmax probabilities [B, *S, C]; ``target`` is
  integer class indices [B, *S] (one-hot handled internally).
All functions reduce to a scalar (batch mean), are pure jnp, and are safe
under jit/grad (eps-guarded logs and divisions).
"""

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


def _flatten_binary(pred, target):
    if pred.ndim == target.ndim + 1 and pred.shape[-1] == 1:
        pred = pred[..., 0]
    elif target.ndim == pred.ndim + 1 and target.shape[-1] == 1:
        target = target[..., 0]
    b = pred.shape[0]
    return pred.reshape(b, -1), target.reshape(b, -1).astype(pred.dtype)


def _one_hot(target, n_classes):
    return jax.nn.one_hot(target.astype(jnp.int32), n_classes)


# ---------------------------------------------------------------------------
# binary losses
# ---------------------------------------------------------------------------


def binary_cross_entropy(pred, target, weight=1.0, scale=1.0, eps=1e-6):
    """Weighted BCE on probabilities (parity: losses.py:79)."""
    p, t = _flatten_binary(pred, target)
    p = jnp.clip(p, eps, 1 - eps)
    loss = -(weight * t * jnp.log(p) + (1 - t) * jnp.log(1 - p)) * scale
    return jnp.mean(jnp.mean(loss, axis=-1))


def binary_focal_loss(pred, target, alpha=0.25, gamma=2.0, eps=1e-6, scale=1.0):
    """alpha * (1-pt)^gamma * CE (parity: losses.py:112)."""
    p, t = _flatten_binary(pred, target)
    p = jnp.clip(p, eps, 1 - eps)
    pt = t * p + (1 - t) * (1 - p)
    alpha_t = t * alpha + (1 - t) * (1 - alpha)
    loss = -alpha_t * (1 - pt) ** gamma * jnp.log(pt) * scale
    return jnp.mean(jnp.mean(loss, axis=-1))


def weighted_mse(pred, target, threshold=0.5, weight=1.0):
    """MSE with extra weight above threshold (parity: losses.py:218)."""
    p, t = _flatten_binary(pred, target)
    se = (p - t) ** 2
    w = jnp.where(t > threshold, weight, 1.0)
    return jnp.mean(jnp.mean(se * w, axis=-1))


def binary_generalized_dice_loss(pred, target, weight=1.0, smooth=1e-5, eps=1e-6):
    """
    Generalized Dice with inverse-square class weights over {fg,bg}
    (parity: losses.py:251).
    """
    p, t = _flatten_binary(pred, target)
    w_fg = 1.0 / jnp.maximum(jnp.sum(t, axis=-1) ** 2, eps)
    w_bg = 1.0 / jnp.maximum(jnp.sum(1 - t, axis=-1) ** 2, eps)
    inter = w_fg * jnp.sum(p * t, axis=-1) * weight + w_bg * jnp.sum(
        (1 - p) * (1 - t), axis=-1
    )
    denom = w_fg * jnp.sum(p + t, axis=-1) + w_bg * jnp.sum(
        (1 - p) + (1 - t), axis=-1
    )
    dice = (2 * inter + smooth) / (denom + smooth)
    return jnp.mean(1.0 - dice)


def binary_focal_tversky_loss(pred, target, alpha=0.5, beta=0.5, gamma=1.0, smooth=1.0):
    """(1 - TverskyIndex)^(1/gamma) (parity: losses.py:295)."""
    p, t = _flatten_binary(pred, target)
    tp = jnp.sum(p * t, axis=-1)
    fn = jnp.sum((1 - p) * t, axis=-1)
    fp = jnp.sum(p * (1 - t), axis=-1)
    ti = (tp + smooth) / (tp + alpha * fn + beta * fp + smooth)
    return jnp.mean((1.0 - ti) ** (1.0 / gamma))


def combo_loss(pred, target, alpha=0.5, beta=1.0, eps=1e-6, scale=1.0):
    """alpha*Dice + (1-alpha)*weighted-BCE (parity: losses.py:339)."""
    dice = binary_generalized_dice_loss(pred, target, eps=eps)
    bce = binary_cross_entropy(pred, target, weight=beta, scale=scale, eps=eps)
    return alpha * dice + (1 - alpha) * bce


def hybrid_focal_loss(pred, target, lam=0.5, focal_params=None, tversky_params=None):
    """lam*focal + (1-lam)*focal-Tversky (parity: losses.py:386)."""
    focal_params = focal_params or {}
    tversky_params = tversky_params or {}
    return lam * binary_focal_loss(pred, target, **focal_params) + (
        1 - lam
    ) * binary_focal_tversky_loss(pred, target, **tversky_params)


def unified_focal_loss(pred, target, delta=0.6, gamma=0.5, lam=0.5, scale=1.0):
    """Asymmetric unified focal loss (parity: losses.py:421)."""
    focal = binary_focal_loss(
        pred, target, alpha=delta, gamma=1 - gamma, scale=scale
    )
    tversky = binary_focal_tversky_loss(
        pred, target, alpha=delta, beta=1 - delta, gamma=1.0 / gamma
        if gamma > 0
        else 1.0,
    )
    return lam * focal + (1 - lam) * tversky


# ---------------------------------------------------------------------------
# multiclass ("categorical") losses
# ---------------------------------------------------------------------------


def cat_cross_entropy(pred, target, weight=None, scale=1.0, eps=1e-6):
    """CE on softmax probabilities (parity: losses.py:528)."""
    n_classes = pred.shape[-1]
    t = _one_hot(target, n_classes)
    p = jnp.clip(pred, eps, 1.0)
    ce = -t * jnp.log(p)
    if weight is not None:
        ce = ce * jnp.asarray(weight).reshape((1,) * (ce.ndim - 1) + (-1,))
    return jnp.mean(jnp.sum(ce, axis=-1)) * scale


def mc_focal_loss(pred, target, alpha=None, gamma=2.0, eps=1e-6, scale=1.0):
    """Multiclass focal (parity: losses.py:565)."""
    n_classes = pred.shape[-1]
    t = _one_hot(target, n_classes)
    p = jnp.clip(pred, eps, 1.0)
    focal = -t * (1 - p) ** gamma * jnp.log(p)
    if alpha is not None:
        focal = focal * jnp.asarray(alpha).reshape(
            (1,) * (focal.ndim - 1) + (-1,)
        )
    return jnp.mean(jnp.sum(focal, axis=-1)) * scale


def mc_generalized_dice_loss(pred, target, weight=1.0, smooth=1e-5, eps=1e-6):
    """Generalized Dice over classes (parity: losses.py:610)."""
    n_classes = pred.shape[-1]
    t = _one_hot(target, n_classes)
    b = pred.shape[0]
    p = pred.reshape(b, -1, n_classes)
    t = t.reshape(b, -1, n_classes)
    w = 1.0 / jnp.maximum(jnp.sum(t, axis=1) ** 2, eps)  # [B, C]
    inter = jnp.sum(w * jnp.sum(p * t, axis=1) * weight, axis=-1)
    denom = jnp.sum(w * jnp.sum(p + t, axis=1), axis=-1)
    dice = (2 * inter + smooth) / (denom + smooth)
    return jnp.mean(1.0 - dice)


def mc_focal_tversky_loss(pred, target, alpha=0.5, beta=0.5, gamma=1.0, smooth=1.0):
    n_classes = pred.shape[-1]
    t = _one_hot(target, n_classes)
    b = pred.shape[0]
    p = pred.reshape(b, -1, n_classes)
    t = t.reshape(b, -1, n_classes)
    tp = jnp.sum(p * t, axis=1)
    fn = jnp.sum((1 - p) * t, axis=1)
    fp = jnp.sum(p * (1 - t), axis=1)
    ti = (tp + smooth) / (tp + alpha * fn + beta * fp + smooth)
    return jnp.mean((1.0 - ti) ** (1.0 / gamma))


def mc_combo_loss(pred, target, alpha=0.5, beta=1.0, eps=1e-6, scale=1.0):
    return alpha * mc_generalized_dice_loss(pred, target, eps=eps) + (
        1 - alpha
    ) * cat_cross_entropy(pred, target, scale=scale, eps=eps)


def mc_hybrid_focal_loss(pred, target, lam=0.5, focal_params=None, tversky_params=None):
    focal_params = focal_params or {}
    tversky_params = tversky_params or {}
    return lam * mc_focal_loss(pred, target, **focal_params) + (
        1 - lam
    ) * mc_focal_tversky_loss(pred, target, **tversky_params)


def mc_unified_focal_loss(pred, target, delta=0.6, gamma=0.5, lam=0.5, scale=1.0):
    focal = mc_focal_loss(pred, target, gamma=1 - gamma, scale=scale)
    tversky = mc_focal_tversky_loss(
        pred,
        target,
        alpha=delta,
        beta=1 - delta,
        gamma=1.0 / gamma if gamma > 0 else 1.0,
    )
    return lam * focal + (1 - lam) * tversky


def mse_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


# ---------------------------------------------------------------------------
# metric helpers + registry + CompoundLoss
# ---------------------------------------------------------------------------


def generalised_dice_score(pred, target, smooth=1e-5):
    """Soft Dice score (not loss); binary (parity: losses.py:14)."""
    p, t = _flatten_binary(pred, target)
    inter = jnp.sum(p * t, axis=-1)
    denom = jnp.sum(p, axis=-1) + jnp.sum(t, axis=-1)
    return jnp.mean((2 * inter + smooth) / (denom + smooth))


loss_factory: Dict[str, Dict[str, Callable]] = {
    "binary": {
        "cross_entropy": binary_cross_entropy,
        "focal": binary_focal_loss,
        "dice": binary_generalized_dice_loss,
        "tversky_focal": binary_focal_tversky_loss,
        "combo": combo_loss,
        "hybrid_focal": hybrid_focal_loss,
        "unified_focal": unified_focal_loss,
    },
    "categorical": {
        "cross_entropy": cat_cross_entropy,
        "focal": mc_focal_loss,
        "dice": mc_generalized_dice_loss,
        "tversky_focal": mc_focal_tversky_loss,
        "combo": mc_combo_loss,
        "hybrid_focal": mc_hybrid_focal_loss,
        "unified_focal": mc_unified_focal_loss,
    },
    "regression": {"mse": mse_loss, "weighted_mse": weighted_mse},
}


class CompoundLoss:
    """
    Weighted sum of named losses with per-loss kwargs
    (parity: losses.py:811-885 incl. ``replace_item`` weight injection).
    Returns (total, per_loss_dict) so each component can be logged like the
    reference's ``log_loss`` (segmentation/pl.py:372).
    """

    def __init__(self, losses: Dict[str, Dict], weights: Optional[Dict[str, float]] = None):
        """
        Args:
            losses: ``{name: {"fn": callable, "params": {...}}}`` or
                ``{name: params_dict}`` with the fn looked up in
                loss_factory by name and task inferred by the caller.
            weights: per-loss scalar weights (default 1).
        """
        self.losses = {}
        for name, spec in losses.items():
            if callable(spec):
                self.losses[name] = {"fn": spec, "params": {}}
            elif "fn" in spec:
                self.losses[name] = {
                    "fn": spec["fn"],
                    "params": dict(spec.get("params", {})),
                }
            else:
                raise ValueError(f"loss spec for {name!r} needs 'fn'")
        self.weights = dict(weights or {})

    def replace_item(self, name: str, key: str, value):
        """Injects/overrides a param of one loss (parity: losses.py:853)."""
        self.losses[name]["params"][key] = value

    def __call__(self, pred, target):
        total = 0.0
        individual = {}
        for name, spec in self.losses.items():
            value = spec["fn"](pred, target, **spec["params"])
            individual[name] = value
            total = total + self.weights.get(name, 1.0) * value
        return total, individual
