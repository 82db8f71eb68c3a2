"""
Segmentation loss zoo — formula-exact against the reference.

Parity target: adell_mri/modules/segmentation/losses.py (:57-810) and the
loss_factory registry (adell_mri/utils/utils.py:38-58) — binary and
multiclass ("categorical") versions of cross-entropy, focal, generalized
Dice, Tversky-focal, combo, hybrid-focal, unified-focal; weighted MSE;
CompoundLoss (:811-885). Every formula below reproduces the reference's
arithmetic exactly (tests/test_reference_parity.py compares against the
reference file imported directly), INCLUDING its idiosyncrasies, because
the north-star accuracy-parity claim requires identical training
dynamics:

- ``binary_focal_loss`` modulates the positive term by ``pred**gamma``
  (not ``(1-pred)**gamma``; ref losses.py:152-160);
- ``generalised_dice_score`` adds ``smooth`` PER-VOXEL inside the
  denominator sum and applies class weights to numerator and denominator
  (ref losses.py:14-56) — no inverse-square class weighting;
- the categorical CE target is ``t*(1-ls) + 1/C`` — the ``+1/C`` applies
  even with no label smoothing (ref losses.py:583,595);
- ``mc_focal_tversky_loss`` carries a double ``+1`` smooth in the
  denominator (``n`` already includes one; ref losses.py:725-728);
- ``unified_focal_loss`` maps ``weight``->focal ``gamma`` and
  ``1-gamma``->focal ``alpha`` (positional call in ref losses.py:458).

Conventions (channels-last, matching the model outputs):
- binary: ``pred`` are probabilities in [0,1] shaped [B, *S, 1] or [B, *S];
  ``target`` is {0,1} with the same (broadcastable) shape.
- multiclass: ``pred`` are softmax probabilities [B, *S, C]; ``target`` is
  integer class indices [B, *S] (one-hot handled internally) or one-hot
  [B, *S, C].
All functions reduce to a scalar — the batch mean of the reference's
per-batch vector — and are safe under jit/grad.
"""

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

eps = 1e-6
FOCAL_DEFAULT = {"alpha": None, "gamma": 1}
TVERSKY_DEFAULT = {"alpha": 1, "beta": 1, "gamma": 1}


def _flatten_binary(pred, target):
    if pred.ndim == target.ndim + 1 and pred.shape[-1] == 1:
        pred = pred[..., 0]
    elif target.ndim == pred.ndim + 1 and target.shape[-1] == 1:
        target = target[..., 0]
    b = pred.shape[0]
    return pred.reshape(b, -1), target.reshape(b, -1).astype(pred.dtype)


def _one_hot(target, n_classes):
    return jax.nn.one_hot(target.astype(jnp.int32), n_classes)


def _mc_flat(pred, target):
    """[B, *S, C] (+ int/one-hot target) -> ([B, V, C], [B, V, C])."""
    n_classes = pred.shape[-1]
    if target.shape != pred.shape:
        target = _one_hot(target, n_classes)
    b = pred.shape[0]
    return (
        pred.reshape(b, -1, n_classes),
        target.reshape(b, -1, n_classes).astype(pred.dtype),
    )


# ---------------------------------------------------------------------------
# binary losses
# ---------------------------------------------------------------------------


def binary_cross_entropy(
    pred, target, weight=1.0, scale=1.0, label_smoothing=0.0, eps=eps
):
    """Weighted BCE on probabilities (parity: losses.py:79-110)."""
    p, t = _flatten_binary(pred, target)
    t = t * (1 - label_smoothing) + label_smoothing / 2
    a = weight * t * jnp.log(p + eps)
    b = (1 - t) * jnp.log(1 - p + eps)
    return jnp.mean(-jnp.mean((a + b) * scale, axis=1))


def binary_focal_loss(
    pred,
    target,
    gamma=1.0,
    alpha=1.0,
    threshold=0.5,
    scale=1.0,
    label_smoothing=0.0,
    eps=eps,
):
    """Reference binary focal loss (parity: losses.py:112-166). NOTE the
    positive term's modulating factor is ``pred**gamma`` — the reference's
    arithmetic, reproduced deliberately (see module docstring)."""
    if alpha is None:
        alpha = 1.0
    p, t = _flatten_binary(pred, target)
    p = jnp.maximum(p, eps)
    p_inv = jnp.maximum(1 - p, eps)
    t = (t > threshold).astype(p.dtype)
    t = t * (1 - label_smoothing) + label_smoothing / 2
    loss = (
        -(
            alpha * (p**gamma) * jnp.log(p) * t
            + (p_inv**gamma) * jnp.log(p_inv) * (1 - t)
        )
        * scale
    )
    return jnp.mean(jnp.mean(loss, axis=-1))


def weighted_mse(pred, target, alpha=1.0, threshold=0.5):
    """MSE with the negative-class term divided by ``alpha``
    (parity: losses.py:218-248; masked means made jit-static)."""
    p, t = _flatten_binary(pred, target)
    se = (p - t) ** 2
    pos = (t >= threshold).astype(p.dtype)
    n_pos = jnp.sum(pos)
    n_neg = jnp.sum(1 - pos)
    pos_mse = jnp.sum(se * pos) / jnp.maximum(n_pos, 1)
    neg_mse = jnp.sum(se * (1 - pos)) / jnp.maximum(n_neg, 1)
    return pos_mse + neg_mse / alpha


def generalised_dice_score(
    pred, target, weight=None, smooth=0.0, scale=1.0, eps=eps
):
    """
    Reference generalised dice score on pre-flattened [B, C, V] operands
    (parity: losses.py:14-56). ``smooth`` adds per-voxel inside the
    denominator sum; ``weight`` (scalar or [C]) multiplies numerator AND
    denominator class sums. Returns a [B] vector like the reference.
    """
    if weight is None:
        w = jnp.ones(())
    else:
        w = jnp.asarray(weight, pred.dtype)
    if w.ndim == 1:
        w = w[None]  # [1, C]
    num = jnp.sum(w * jnp.sum(jnp.maximum(target * pred * scale, 0.0), -1), -1)
    den = jnp.sum(
        w * jnp.sum(jnp.maximum((target + pred + smooth) * scale, eps), -1), -1
    )
    return num / den


def binary_generalized_dice_loss(
    pred, target, weight=1.0, smooth=1.0, scale=1.0, eps=eps
):
    """``1 - 2 * gds`` (parity: losses.py:251-293)."""
    p, t = _flatten_binary(pred, target)
    gds = generalised_dice_score(
        p[:, None, :], t[:, None, :], weight, smooth, scale, eps
    )
    return jnp.mean(1.0 - 2.0 * gds)


def binary_focal_tversky_loss(pred, target, alpha=1.0, beta=1.0, gamma=1.0):
    """``1 - ((tp+1)/(tp + a*[p(1-t)] + b*[(1-p)t] + 1))**gamma``
    (parity: losses.py:295-337 — the reference's fn/fp naming is swapped
    relative to convention; the arithmetic is matched, not the names)."""
    p, t = _flatten_binary(pred, target)
    tp = jnp.sum(p * t, axis=-1)
    d1 = jnp.sum(p * (1 - t), axis=-1)
    d2 = jnp.sum((1 - p) * t, axis=-1)
    nd = (tp + 1.0) / (tp + alpha * d1 + beta * d2 + 1.0)
    return jnp.mean(1.0 - nd**gamma)


def combo_loss(pred, target, alpha=0.5, weight=1.0, gamma=1.0, scale=1.0, eps=eps):
    """``alpha*focal + (1-alpha)*dice`` with dice smooth=eps
    (parity: losses.py:339-384 incl. the positional smooth=eps)."""
    bdl = (
        binary_generalized_dice_loss(pred, target, weight, eps) * scale
    )
    bce = binary_focal_loss(
        pred, target, gamma=gamma, alpha=weight, scale=scale
    )
    return alpha * bce + (1 - alpha) * bdl


def hybrid_focal_loss(pred, target, lam=0.5, focal_params=None, tversky_params=None):
    """lam*focal + (1-lam)*focal-Tversky (parity: losses.py:386-419)."""
    focal_params = dict(focal_params or FOCAL_DEFAULT)
    tversky_params = dict(tversky_params or TVERSKY_DEFAULT)
    a = focal_params.get("alpha")
    if a is None or isinstance(a, (int, float)):
        focal_params["alpha"] = 1.0
    bfl = binary_focal_loss(pred, target, **focal_params)
    bftl = binary_focal_tversky_loss(pred, target, **tversky_params)
    return lam * bfl + (1 - lam) * bftl


def unified_focal_loss(
    pred, target, weight=1.0, gamma=0.5, lam=0.5, threshold=0.5, scale=1.0
):
    """Asymmetric unified focal loss (parity: losses.py:421-462). The
    focal member receives ``gamma=weight`` and ``alpha=1-gamma`` — the
    reference's positional call (:458), reproduced deliberately."""
    bfl = binary_focal_loss(
        pred, target, gamma=weight, alpha=1 - gamma,
        threshold=threshold, scale=scale,
    )
    bftl = binary_focal_tversky_loss(
        pred, target, alpha=weight, beta=1 - weight, gamma=gamma
    )
    return lam * bfl + (1 - lam) * bftl


# ---------------------------------------------------------------------------
# multiclass ("categorical") losses
# ---------------------------------------------------------------------------


def cat_cross_entropy(
    pred, target, weight=1.0, scale=1.0, label_smoothing=0.0, eps=eps
):
    """CE on softmax probabilities; the target picks up a constant
    ``+1/C`` (parity: losses.py:528-563, :583)."""
    n_classes = pred.shape[-1]
    p, t = _mc_flat(pred, target)
    t = t * (1 - label_smoothing) + 1.0 / n_classes
    ce = -t * jnp.log(p + eps)
    if weight is not None:
        w = jnp.asarray(weight, p.dtype)
        if w.ndim == 1:
            w = w.reshape((1,) * (ce.ndim - 1) + (-1,))
        ce = ce * w
    b = pred.shape[0]
    return jnp.mean(jnp.mean(ce.reshape(b, -1), axis=-1) * scale)


def mc_focal_loss(
    pred, target, alpha=None, gamma=1.0, scale=1.0, label_smoothing=0.0, eps=eps
):
    """Multiclass focal: ``alpha * (1-pt+eps)**gamma * ce``
    (parity: losses.py:565-608)."""
    n_classes = pred.shape[-1]
    p, t = _mc_flat(pred, target)
    if alpha is None:
        a = jnp.ones(())
    else:
        a = jnp.asarray(alpha, p.dtype)
    if a.ndim == 1:
        a = a[None, None]
    p_t = jnp.where(t > 0.5, p, 1 - p)  # mc_pt (losses.py:464)
    t_s = t * (1 - label_smoothing) + 1.0 / n_classes
    ce = -t_s * jnp.log(p + eps)
    out = a * ((1 - p_t + eps) ** gamma) * ce
    b = pred.shape[0]
    return jnp.mean(jnp.mean(out.reshape(b, -1), axis=-1) * scale)


def mc_generalized_dice_loss(
    pred, target, weight=1.0, smooth=1.0, scale=1.0, eps=eps
):
    """Generalized Dice over classes, ``1 - 2*gds``
    (parity: losses.py:610-654)."""
    p, t = _mc_flat(pred, target)
    gds = generalised_dice_score(
        jnp.swapaxes(p, 1, 2), jnp.swapaxes(t, 1, 2), weight, smooth, scale,
        eps,
    )
    return jnp.mean(1.0 - 2.0 * gds)


def mc_focal_tversky_loss(pred, target, alpha=1.0, beta=1.0, gamma=1.0):
    """Per-class Tversky with the reference's double +1 smooth
    (parity: losses.py:656-729)."""
    p, t = _mc_flat(pred, target)
    n = jnp.sum(p * t, axis=1) + 1.0  # [B, C]
    d1 = jnp.asarray(alpha) * jnp.sum(p * (1 - t), axis=1)
    d2 = jnp.asarray(beta) * jnp.sum((1 - p) * t, axis=1)
    d = n + d1 + d2 + 1.0
    return jnp.mean(jnp.mean(1.0 - (n / d) ** gamma, axis=-1))


def mc_combo_loss(pred, target, alpha=0.5, weight=1.0, scale=1.0, eps=eps):
    """``alpha*ce + (1-alpha)*dice`` with dice smooth=scale — the
    reference's positional call (parity: losses.py:701-735)."""
    bdl = mc_generalized_dice_loss(pred, target, weight, scale)
    bce = cat_cross_entropy(pred, target, weight, scale)
    return alpha * bce + (1 - alpha) * bdl


def mc_hybrid_focal_loss(pred, target, lam=1.0, focal_params=None, tversky_params=None):
    """lam*focal + (1-lam)*Tversky; default lam=1.0 like the reference
    (parity: losses.py:737-770)."""
    focal_params = dict(focal_params or FOCAL_DEFAULT)
    tversky_params = dict(tversky_params or TVERSKY_DEFAULT)
    a = focal_params.get("alpha")
    if a is None or isinstance(a, (int, float)):
        focal_params["alpha"] = 1.0
    fl = mc_focal_loss(pred, target, **focal_params)
    ftl = mc_focal_tversky_loss(pred, target, **tversky_params)
    return lam * fl + (1 - lam) * ftl


def mc_unified_focal_loss(pred, target, delta=0.6, gamma=0.5, lam=0.5, scale=1.0):
    """(parity: losses.py:772-810 — focal gets gamma=1-gamma, Tversky
    alpha=delta/beta=1-delta.)"""
    fl = mc_focal_loss(pred, target, alpha=delta, gamma=1 - gamma, scale=scale)
    ftl = mc_focal_tversky_loss(
        pred, target, alpha=delta, beta=1 - delta, gamma=gamma
    )
    return lam * fl + (1 - lam) * ftl


def mse_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


# ---------------------------------------------------------------------------
# registry + CompoundLoss
# ---------------------------------------------------------------------------


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
    Mean of weighted named losses with per-loss kwargs
    (parity: losses.py:811-885 incl. ``replace_item`` weight injection;
    the reference trains on the MEAN of the stacked per-loss values,
    segmentation/pl.py:414-416). Returns (total, per_loss_dict) so each
    component can be logged like the reference's ``log_loss``
    (segmentation/pl.py:372).
    """

    def __init__(self, losses: Dict[str, Dict], weights: Optional[Dict[str, float]] = None):
        """
        Args:
            losses: ``{name: callable}`` or
                ``{name: {"fn": callable, "params": {...}}}``. Name-only
                specs are NOT resolved here — the task-aware lookup in
                loss_factory lives in ``config.parsing.build_compound_loss``
                (the constructor cannot infer binary vs multiclass).
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
        # the reference stacks the per-loss means and trains on
        # loss.mean() (segmentation/pl.py:414-416), i.e. the total is
        # sum(w_i * l_i) / k, NOT the weighted sum — with the flagship's
        # dice+focal config a sum would double the effective learning
        # rate relative to the reference at identical hyperparameters
        return total / max(len(self.losses), 1), individual
