"""
Property-based ordering tests over the entire segmentation loss factory:
for any random target, a perfect probability map must score strictly
better (lower) than a maximally wrong one, and losses must be finite —
for every binary and categorical member, at their factory defaults.
"""

import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from adell_mri_tpu.models.segmentation.losses import loss_factory


def _soften(p, eps=1e-4):
    """Keep probabilities off the exact {0,1} corners like a real softmax
    output would be (log-based losses are allowed to saturate at exact 0)."""
    return p * (1 - 2 * eps) + eps


@settings(max_examples=12, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_binary_losses_order_perfect_above_wrong(seed):
    rng = np.random.default_rng(seed)
    target = (rng.random((2, 6, 6, 4)) > 0.7).astype(np.float32)
    target[0, 0, 0, 0] = 1.0  # at least one positive
    t = jnp.asarray(target)
    perfect = jnp.asarray(_soften(target)[..., None])
    wrong = jnp.asarray(_soften(1.0 - target)[..., None])
    for name, fn in loss_factory["binary"].items():
        lp = float(fn(perfect, t))
        lw = float(fn(wrong, t))
        assert np.isfinite(lp) and np.isfinite(lw), name
        assert lp < lw, (name, lp, lw)


@settings(max_examples=12, deadline=None)
@given(seed=st.integers(0, 10_000), n_classes=st.integers(2, 4))
def test_categorical_losses_order_perfect_above_wrong(seed, n_classes):
    rng = np.random.default_rng(seed)
    target = rng.integers(0, n_classes, size=(2, 6, 6, 4))
    target[0, 0, 0, 0] = n_classes - 1  # every class present somewhere
    target[0, 0, 0, 1] = 0
    onehot = np.eye(n_classes, dtype=np.float32)[target]
    t = jnp.asarray(target)
    perfect = jnp.asarray(_soften(onehot))
    # maximally wrong: all mass on (true class + 1) mod C
    wrong_idx = (target + 1) % n_classes
    wrong = jnp.asarray(_soften(np.eye(n_classes, dtype=np.float32)[wrong_idx]))
    for name, fn in loss_factory["categorical"].items():
        lp = float(fn(perfect, t))
        lw = float(fn(wrong, t))
        assert np.isfinite(lp) and np.isfinite(lw), name
        assert lp < lw, (name, lp, lw)
