"""
Semi-supervised segmentation losses.

Parity targets: adell_mri/modules/semi_supervised_segmentation/losses.py —
AnatomicalContrastiveLoss (:75), NearestNeighbourLoss (:244),
PseudoLabelCrossEntropy (:430), LocalContrastiveLoss (:463 + anchors :512).
Used by the UNetContrastiveSemiSL flow (pl.py:15): a supervised batch plus
two unlabeled views with an EMA teacher.
"""

from typing import Optional

import jax
import jax.numpy as jnp


def pseudo_label_cross_entropy(
    student_probs,
    teacher_probs,
    threshold: float = 0.5,
    confidence_threshold: Optional[float] = None,
    eps=1e-6,
):
    """
    CE against teacher pseudo-labels (parity: losses.py:430 —
    ``CE(pred, (proba > threshold))`` over ALL voxels). Binary: probs
    [B, *S, 1]. ``confidence_threshold`` is an OPTIONAL FixMatch-style
    extension beyond the reference: when set, only voxels whose teacher
    probability is confident (> ct or < 1-ct) contribute.
    """
    teacher = jax.lax.stop_gradient(teacher_probs)
    pseudo = (teacher > threshold).astype(student_probs.dtype)
    p = jnp.clip(student_probs, eps, 1 - eps)
    ce = -(pseudo * jnp.log(p) + (1 - pseudo) * jnp.log(1 - p))
    if confidence_threshold is None:
        return jnp.mean(ce)
    confident = jnp.logical_or(
        teacher > confidence_threshold,
        teacher < 1 - confidence_threshold,
    ).astype(student_probs.dtype)
    return jnp.sum(ce * confident) / jnp.maximum(jnp.sum(confident), 1.0)


def local_contrastive_loss(
    feat1, feat2, temperature: float = 0.1, n_samples: int = 256, key=None
):
    """
    Pixel-level contrastive loss between two views' feature maps
    (parity: losses.py:463): corresponding positions are positives, other
    sampled positions negatives. feat*: [B, *S, F].
    """
    b = feat1.shape[0]
    f1 = feat1.reshape(b, -1, feat1.shape[-1])
    f2 = feat2.reshape(b, -1, feat2.shape[-1])
    n = f1.shape[1]
    if key is not None and n > n_samples:
        idx = jax.random.choice(key, n, (n_samples,), replace=False)
        f1 = f1[:, idx]
        f2 = f2[:, idx]
    f1 = f1 / jnp.maximum(jnp.linalg.norm(f1, axis=-1, keepdims=True), 1e-6)
    f2 = f2 / jnp.maximum(jnp.linalg.norm(f2, axis=-1, keepdims=True), 1e-6)
    logits = jnp.einsum("bnf,bmf->bnm", f1, f2) / temperature
    labels = jnp.arange(f1.shape[1])
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(logp[:, labels, labels])


def nearest_neighbour_loss(
    features,
    memory_bank,
    feature_labels=None,
    bank_labels=None,
    temperature: float = 0.1,
):
    """
    Class-conditional soft-nearest-neighbour loss (parity: losses.py:244,
    Frosst 2019): maximize similarity to SAME-class bank elements with
    every bank element in the softmax denominator. features [N, F],
    memory_bank [M, F], feature_labels [N] int, bank_labels [M] int.

    Without labels, falls back to attracting each feature to the full
    bank — note that objective is minimized by collapsing onto the single
    best-aligned prototype, so pass labels for the real SNN semantics.
    """
    f = features / jnp.maximum(
        jnp.linalg.norm(features, axis=-1, keepdims=True), 1e-6
    )
    m = memory_bank / jnp.maximum(
        jnp.linalg.norm(memory_bank, axis=-1, keepdims=True), 1e-6
    )
    sims = f @ m.T / temperature  # [N, M]
    if feature_labels is None or bank_labels is None:
        return -jnp.mean(
            jax.nn.logsumexp(sims, axis=-1) - jnp.log(m.shape[0])
        )
    same = (
        feature_labels.astype(jnp.int32)[:, None]
        == bank_labels.astype(jnp.int32)[None, :]
    )
    num = jax.nn.logsumexp(jnp.where(same, sims, -jnp.inf), axis=-1)
    den = jax.nn.logsumexp(sims, axis=-1)
    # features whose class has no bank element contribute nothing
    valid = same.any(axis=-1)
    per = jnp.where(valid, num - den, 0.0)
    return -jnp.sum(per) / jnp.maximum(jnp.sum(valid), 1.0)


class AnatomicalContrastiveLoss:
    """
    Class-prototype contrastive loss (parity: losses.py:75): per-class mean
    features (prototypes) computed from the labeled batch; hard negatives
    are the top-k most confident wrong-class pixels.
    """

    def __init__(
        self,
        n_classes: int = 2,
        temperature: float = 0.1,
        top_k: int = 128,
    ):
        self.n_classes = n_classes
        self.temperature = temperature
        self.top_k = top_k

    def __call__(self, features, probs, labels):
        """features [B,*S,F]; probs [B,*S,1]; labels [B,*S]."""
        f = features.reshape(-1, features.shape[-1])
        p = probs.reshape(-1)
        y = labels.reshape(-1)
        f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-6)
        losses = []
        for c in range(self.n_classes):
            mask = (y == c).astype(f.dtype)
            denom = jnp.maximum(jnp.sum(mask), 1.0)
            proto = jnp.sum(f * mask[:, None], axis=0) / denom
            proto = proto / jnp.maximum(jnp.linalg.norm(proto), 1e-6)
            sims = f @ proto / self.temperature
            # attract same-class, repel confident other-class (hard negatives)
            wrong = 1.0 - mask
            conf_wrong = wrong * jnp.where(c == 1, p, 1.0 - p)
            k = min(self.top_k, f.shape[0])
            hard_vals, _ = jax.lax.top_k(conf_wrong * sims, k)
            attract = -jnp.sum(sims * mask) / denom
            repel = jnp.mean(jax.nn.relu(hard_vals))
            losses.append(attract + repel)
        return sum(losses) / self.n_classes
