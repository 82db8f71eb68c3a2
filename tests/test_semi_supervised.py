"""Semi-supervised segmentation: losses, step, combined loader."""

import jax
import jax.numpy as jnp
import numpy as np

from adell_mri_tpu.models.segmentation.unet import UNet
from adell_mri_tpu.models.semi_supervised import (
    AnatomicalContrastiveLoss,
    local_contrastive_loss,
    nearest_neighbour_loss,
    pseudo_label_cross_entropy,
)
from adell_mri_tpu.models.segmentation.losses import CompoundLoss, binary_focal_loss
from adell_mri_tpu.train.semi_sl_steps import (
    CombinedLoader,
    make_semi_sl_train_step,
    make_semi_supervised_step,
)
from adell_mri_tpu.train.steps import make_segmentation_step
from adell_mri_tpu.train.state import TrainState
import optax


def test_losses_shapes_and_behavior():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    f1 = jnp.asarray(rng.normal(size=(2, 4, 4, 2, 8)), jnp.float32)
    f2 = f1 + 0.01 * jnp.asarray(rng.normal(size=f1.shape), jnp.float32)
    l_same = local_contrastive_loss(f1, f2, key=key)
    f3 = jnp.asarray(rng.normal(size=f1.shape), jnp.float32)
    l_diff = local_contrastive_loss(f1, f3, key=key)
    assert float(l_same) < float(l_diff)  # matched views attract

    probs_s = jnp.asarray(rng.uniform(size=(2, 4, 4, 2, 1)), jnp.float32)
    probs_t = jnp.where(probs_s > 0.5, 0.99, 0.01)
    ce = pseudo_label_cross_entropy(probs_s, probs_t)
    assert np.isfinite(float(ce))

    feats = jnp.asarray(rng.normal(size=(16, 8)), jnp.float32)
    bank = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    assert np.isfinite(float(nearest_neighbour_loss(feats, bank)))

    acl = AnatomicalContrastiveLoss(n_classes=2, top_k=8)
    labels = (rng.uniform(size=(2, 4, 4, 2)) > 0.7).astype(np.float32)
    v = acl(f1, probs_s, jnp.asarray(labels))
    assert np.isfinite(float(v))


def test_semi_sl_step_runs_and_updates():
    model = UNet(
        spatial_dimensions=3,
        depth=(4, 8),
        kernel_sizes=(3, 3),
        strides=(1, 2),
        norm_type="instance",
        dropout_param=0.0,
        semi_supervised=True,
    )
    x0 = jnp.zeros((2, 8, 8, 4, 1), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x0)["params"]
    assert "linear_transformation" in params
    loss = CompoundLoss({"focal": {"fn": binary_focal_loss, "params": {}}})
    sup = make_segmentation_step(model, loss, train=True)
    semi = make_semi_supervised_step(model, sup, ssl_weight=0.1, n_samples=32)
    step = make_semi_sl_train_step(semi)
    state = TrainState.create(
        model.apply, params, optax.sgd(1e-2), with_ema=True
    )
    rng = np.random.default_rng(1)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 8, 8, 4, 1)), jnp.float32),
        "label": jnp.asarray(
            (rng.uniform(size=(2, 8, 8, 4)) > 0.8), jnp.float32
        ),
        "semi_sl_image": jnp.asarray(
            rng.normal(size=(2, 8, 8, 4, 1)), jnp.float32
        ),
    }
    # the step donates its input state; snapshot params first
    params_before = jax.tree.map(np.asarray, state.params)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert "loss_semi_sl" in metrics
    assert np.isfinite(float(metrics["loss"]))
    # params changed, EMA teacher tracked
    diff = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(
            lambda a, b: float(np.abs(a - np.asarray(b)).sum()),
            params_before,
            new_state.params,
        ),
    )
    assert diff > 0
    assert new_state.ema_params is not None


def test_combined_loader_cycles():
    sup = [{"image": np.ones((2, 4)), "label": np.zeros(2)} for _ in range(4)]
    unsup = [{"image": np.full((2, 4), i)} for i in range(2)]
    combined = CombinedLoader(sup, unsup)
    out = list(combined)
    assert len(out) == 4
    assert all("semi_sl_image" in b for b in out)
    # unlabeled stream cycled
    assert out[2]["semi_sl_image"][0, 0] == out[0]["semi_sl_image"][0, 0]


def test_nearest_neighbour_loss_class_conditional():
    """SNN semantics: same-class alignment lowers the loss; cross-class
    alignment raises it (labels make it a real objective instead of a
    collapse-to-any-prototype attraction)."""
    key = jax.random.PRNGKey(0)
    bank = jax.random.normal(key, (8, 16))
    bank_labels = jnp.asarray([0, 0, 0, 0, 1, 1, 1, 1])
    feats = bank[:4] + 0.01  # near the class-0 bank entries
    good = float(
        nearest_neighbour_loss(
            feats, bank, jnp.zeros((4,), jnp.int32), bank_labels
        )
    )
    bad = float(
        nearest_neighbour_loss(
            feats, bank, jnp.ones((4,), jnp.int32), bank_labels
        )
    )
    assert good < bad


def test_semi_sl_views_share_geometry():
    """The two unlabeled views must share flips so positional feature
    pairing is anatomically consistent."""
    from adell_mri_tpu.train.semi_sl_steps import _random_view

    key = jax.random.PRNGKey(3)
    x = jnp.arange(2 * 8 * 8 * 4 * 1, dtype=jnp.float32).reshape(
        (2, 8, 8, 4, 1)
    )
    geom = jax.random.PRNGKey(7)
    outs = []
    for i in range(4):
        v = _random_view(jax.random.PRNGKey(10 + i), x, geom_key=geom)
        # undo intensity scale/shift effects by normalizing per volume
        v = (v - v.mean()) / v.std()
        outs.append(np.asarray(v))
    # identical geometry across views: normalized views are near-identical
    for o in outs[1:]:
        np.testing.assert_allclose(o, outs[0], atol=0.1)
