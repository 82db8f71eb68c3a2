"""
Deconfounded classification.

Parity target: adell_mri/modules/classification/deconfounded_classification.py
— DeconfoundedNetGeneric (:141): backbone features are split into a
classification subspace and confounder subspaces (categorical/continuous
surrogates); auxiliary heads predict the confounders from their subspace and
a decorrelation penalty keeps the classification features orthogonal to them.
"""

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from adell_mri_tpu.models.layers.blocks import GlobalPooling


def correlation_penalty(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Mean squared cross-correlation between feature blocks [B, Fa]x[B, Fb]."""
    a = a - jnp.mean(a, axis=0, keepdims=True)
    b = b - jnp.mean(b, axis=0, keepdims=True)
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=0, keepdims=True), 1e-6)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=0, keepdims=True), 1e-6)
    corr = a.T @ b
    return jnp.mean(jnp.square(corr))


class DeconfoundedNet(nn.Module):
    """
    Args mirror the reference: n_features_deconfounder splits off the
    confounder subspace; n_cat_deconfounder / n_cont_deconfounder size the
    surrogate heads.
    """

    backbone: Any  # module with (x, train, return_features=True) -> [B, F]
    n_classes: int = 2
    n_features_deconfounder: int = 32
    n_cat_deconfounder: Sequence[int] = ()  # classes per categorical confound
    n_cont_deconfounder: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False, return_all: bool = True):
        feats = self.backbone(x, train=train, return_features=True)
        if feats.ndim > 2:
            feats = GlobalPooling()(feats)
        f_conf = nn.Dense(self.n_features_deconfounder, name="conf_proj")(feats)
        f_cls = nn.Dense(
            max(feats.shape[-1] - self.n_features_deconfounder, 16),
            name="cls_proj",
        )(feats)

        logits = nn.Dense(
            1 if self.n_classes == 2 else self.n_classes, name="classifier"
        )(nn.relu(f_cls))
        cat_preds = [
            nn.Dense(nc, name=f"cat_conf_{i}")(nn.relu(f_conf))
            for i, nc in enumerate(self.n_cat_deconfounder)
        ]
        cont_preds = (
            nn.Dense(self.n_cont_deconfounder, name="cont_conf")(
                nn.relu(f_conf)
            )
            if self.n_cont_deconfounder > 0
            else None
        )
        penalty = correlation_penalty(f_cls, f_conf)
        if return_all:
            return logits, cat_preds, cont_preds, penalty
        return logits
