"""Train substrate tests: schedules, EMA, optimizer factory, full step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adell_mri_tpu.models.segmentation import UNet
from adell_mri_tpu.models.segmentation.losses import (
    CompoundLoss,
    binary_generalized_dice_loss,
)
from adell_mri_tpu.train import (
    TrainState,
    cosine_annealing_with_warmup,
    ema_decay_at,
    ema_update,
    get_optimizer,
    make_segmentation_step,
    make_train_step,
    polynomial_lr_decay,
)


def test_cosine_warmup_shape():
    sched = cosine_annealing_with_warmup(
        1.0, t_max=100, n_warmup_steps=10, eta_min=0.0
    )
    lrs = np.asarray([float(sched(s)) for s in range(100)])
    assert lrs[0] < 0.2  # warming up
    assert abs(lrs[10] - 1.0) < 0.1  # peak after warmup
    assert lrs[99] < 0.01  # decayed
    assert np.all(np.diff(lrs[:10]) > 0)  # monotone warmup


def test_cosine_warmup_fractional_and_start_decay():
    sched = cosine_annealing_with_warmup(
        1.0, t_max=100, n_warmup_steps=0.1, start_decay=0.5
    )
    assert abs(float(sched(30)) - 1.0) < 1e-5  # hold between warmup and decay
    assert float(sched(99)) < 0.01


def test_polynomial_decay():
    sched = polynomial_lr_decay(1.0, 10, end_learning_rate=0.1, power=1.0)
    np.testing.assert_allclose(float(sched(0)), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(sched(10)), 0.1, atol=1e-6)
    np.testing.assert_allclose(float(sched(20)), 0.1, atol=1e-6)


def test_ema_ramp_and_update():
    assert float(ema_decay_at(0, 0.9, 0.99, 100)) == pytest.approx(0.9)
    assert float(ema_decay_at(100, 0.9, 0.99, 100)) == pytest.approx(0.99)
    assert float(ema_decay_at(10_000, 0.9, 0.99, 100)) == 1.0
    shadow = {"w": jnp.zeros(3)}
    params = {"w": jnp.ones(3)}
    out = ema_update(shadow, params, 0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1, atol=1e-6)


@pytest.mark.parametrize("name", ["sgd", "adamw", "lamb", "rmsprop"])
def test_optimizer_factory(name):
    params = {"dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros(4)}}
    tx = get_optimizer(name, learning_rate=0.1, weight_decay=0.01, params=params)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert jax.tree.structure(updates) == jax.tree.structure(params)


def test_segmentation_train_step_learns():
    """One blob, tiny UNet: loss must drop over a few steps."""
    model = UNet(
        spatial_dimensions=3,
        norm_type="instance",
        dropout_param=0.0,
        depth=(4, 8),
        kernel_sizes=(3, 3),
        strides=(2, 2),
    )
    x = jnp.zeros((2, 8, 8, 8, 1)).at[:, 2:6, 2:6, 2:6].set(1.0)
    y = jnp.zeros((2, 8, 8, 8)).at[:, 2:6, 2:6, 2:6].set(1.0)
    params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    tx = get_optimizer("adamw", learning_rate=5e-3, params=params)
    state = TrainState.create(model.apply, params, tx, with_ema=True)
    loss = CompoundLoss({"dice": binary_generalized_dice_loss})
    step = make_train_step(make_segmentation_step(model, loss))
    batch = {"image": x, "label": y}
    losses = []
    for i in range(10):
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 10
    # EMA shadow tracked and differs from params after updates
    diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.params,
        state.ema_params,
    )
    assert max(jax.tree.leaves(diff)) > 0
