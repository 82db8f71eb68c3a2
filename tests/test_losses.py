"""Segmentation loss zoo tests (parity model: testing/test_loss_functions)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adell_mri_tpu.models.segmentation.losses import (
    CompoundLoss,
    binary_cross_entropy,
    binary_focal_loss,
    binary_generalized_dice_loss,
    binary_focal_tversky_loss,
    combo_loss,
    generalised_dice_score,
    hybrid_focal_loss,
    loss_factory,
    unified_focal_loss,
    weighted_mse,
)

KEY = jax.random.PRNGKey(0)
PRED = jax.nn.sigmoid(jax.random.normal(KEY, (2, 8, 8, 4, 1)))
TGT = (jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 4)) > 0.7).astype(
    jnp.float32
)

BINARY_LOSSES = [
    binary_cross_entropy,
    binary_focal_loss,
    binary_generalized_dice_loss,
    binary_focal_tversky_loss,
    combo_loss,
    hybrid_focal_loss,
    unified_focal_loss,
    weighted_mse,
]


@pytest.mark.parametrize("fn", BINARY_LOSSES)
def test_binary_losses_finite_and_scalar(fn):
    v = fn(PRED, TGT)
    assert v.shape == ()
    assert np.isfinite(float(v))


@pytest.mark.parametrize("fn", BINARY_LOSSES)
def test_binary_losses_grad(fn):
    g = jax.grad(lambda p: fn(p, TGT))(PRED)
    assert np.all(np.isfinite(np.asarray(g)))


def test_perfect_prediction_low_loss():
    perfect = TGT[..., None]
    imperfect = 1.0 - perfect
    assert float(
        binary_generalized_dice_loss(perfect, TGT, smooth=0.0)
    ) < float(binary_generalized_dice_loss(imperfect, TGT, smooth=0.0))
    # reference gds contract: [B, C, V] operands, loss = 1 - 2*gds, so a
    # perfect prediction gives 2*gds ~= 1 (losses.py:14-56)
    p = perfect.reshape(perfect.shape[0], 1, -1)
    t = TGT.reshape(TGT.shape[0], 1, -1)
    assert float(jnp.mean(2 * generalised_dice_score(p, t))) > 0.99


@pytest.mark.parametrize("name", list(loss_factory["categorical"]))
def test_multiclass_losses(name):
    fn = loss_factory["categorical"][name]
    pred = jax.nn.softmax(jax.random.normal(KEY, (2, 6, 6, 3, 4)), -1)
    tgt = jax.random.randint(jax.random.PRNGKey(2), (2, 6, 6, 3), 0, 4)
    v = fn(pred, tgt)
    assert np.isfinite(float(v))
    g = jax.grad(lambda p: fn(p, tgt))(pred)
    assert np.all(np.isfinite(np.asarray(g)))


def test_compound_loss_weights_and_replace():
    cl = CompoundLoss(
        {
            "dice": {"fn": binary_generalized_dice_loss, "params": {}},
            "focal": {"fn": binary_focal_loss, "params": {"gamma": 2.0}},
        },
        weights={"dice": 2.0, "focal": 0.0},
    )
    total, ind = cl(PRED, TGT)
    # reference semantics: mean over the k weighted losses
    # (segmentation/pl.py:414-416) -> (2*dice + 0*focal) / 2
    np.testing.assert_allclose(float(total), float(ind["dice"]), rtol=1e-6)
    cl.replace_item("focal", "gamma", 0.5)
    assert cl.losses["focal"]["params"]["gamma"] == 0.5


def test_loss_param_overrides_route_by_signature():
    """--loss_gamma/--loss_comb route only into member losses whose
    signature accepts the key (parity: utils.get_loss_param_dict)."""
    from adell_mri_tpu.config.parsing import build_compound_loss

    loss = build_compound_loss(
        {"focal": {}, "dice": {}},
        n_classes=2,
        param_overrides={"gamma": 5.0, "lam": 0.7},
    )
    assert loss.losses["focal"]["params"].get("gamma") == 5.0
    assert "gamma" not in loss.losses["dice"]["params"]
    assert "lam" not in loss.losses["focal"]["params"]
