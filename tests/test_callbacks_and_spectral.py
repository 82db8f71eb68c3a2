"""Spectral normalization, multi-phase schedule/fit, image panels."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from adell_mri_tpu.train.logging_utils import ImagePanelCallback, save_image_panel
from adell_mri_tpu.train.schedules import multi_phase_schedule
from adell_mri_tpu.train.spectral import init_spectral_state, spectral_normalize


def test_spectral_normalize_unit_sigma():
    rng = np.random.default_rng(0)
    params = {
        "dense": {"kernel": jnp.asarray(rng.normal(size=(32, 16)) * 3, jnp.float32),
                  "bias": jnp.zeros((16,))},
        "conv": {"kernel": jnp.asarray(rng.normal(size=(3, 3, 4, 8)), jnp.float32)},
    }
    u = init_spectral_state(params)
    assert u["dense"]["bias"] is None
    normed = params
    state = u
    for _ in range(20):  # power iteration converges over repeated calls
        normed, state = spectral_normalize(params, state, power_iterations=1)
    mat = np.asarray(normed["dense"]["kernel"])
    sigma = np.linalg.svd(mat, compute_uv=False)[0]
    assert abs(sigma - 1.0) < 1e-2
    # bias untouched
    np.testing.assert_array_equal(
        np.asarray(normed["dense"]["bias"]), np.zeros(16)
    )


def test_multi_phase_schedule():
    sched = multi_phase_schedule([1e-2, 1e-3, 1e-4], [2, 3, 5], steps_per_epoch=10)
    assert abs(float(sched(0)) - 1e-2) < 1e-8
    assert abs(float(sched(20)) - 1e-3) < 1e-8
    assert abs(float(sched(50)) - 1e-4) < 1e-8


def test_multi_phase_fit_phases_and_stop():
    from adell_mri_tpu.train.continuous_learning import multi_phase_fit
    import optax

    from adell_mri_tpu.train.loop import TrainLoop
    from adell_mri_tpu.train.state import TrainState

    def loss_and_metrics(params, batch, rng):
        pred = batch["x"] @ params["w"]
        loss = jnp.mean((pred - batch["y"]) ** 2)
        return loss, {"loss": loss}

    def train_step(state, batch, rng):
        (_, metrics), grads = jax.value_and_grad(
            lambda p: loss_and_metrics(p, batch, rng), has_aux=True
        )(state.params)
        return state.apply_gradients(grads), metrics

    rng = np.random.default_rng(0)
    data = [
        {
            "x": jnp.asarray(rng.normal(size=(4, 3)), jnp.float32),
            "y": jnp.asarray(rng.normal(size=(4, 1)), jnp.float32),
        }
        for _ in range(3)
    ]
    params0 = {"w": jnp.zeros((3, 1), jnp.float32)}
    lrs_used = []

    def make_state(params, lr, n_epochs):
        lrs_used.append(lr)
        return TrainState.create(None, params, optax.sgd(lr))

    def make_loop(max_epochs, early_stopping):
        return TrainLoop(
            train_step=jax.jit(train_step),
            max_epochs=min(max_epochs, 2),
            early_stopping=early_stopping,
            monitor="loss",
            mode="min",
        )

    state, hists = multi_phase_fit(
        make_state,
        make_loop,
        data,
        learning_rates=[1e-1, 1e-2, "stop", 1e-3],
        n_epochs=[2, 2, 1, 1],
        monitor="loss",
        params=params0,
    )
    assert lrs_used == [1e-1, 1e-2]  # "stop" ended training
    assert len(hists) == 2
    assert float(np.abs(np.asarray(state.params["w"])).sum()) > 0


def test_image_panel(tmp_path):
    imgs = np.random.default_rng(0).normal(size=(5, 12, 10, 4, 1))
    path = save_image_panel(str(tmp_path / "p.png"), imgs)
    assert os.path.exists(path)

    calls = []

    def sample_fn(state, rng):
        calls.append(1)
        return imgs

    cb = ImagePanelCallback(sample_fn, str(tmp_path), every_n_epochs=2)
    assert cb.on_epoch_end(None, {}, 0) is None  # epoch 1: skipped
    cb.on_epoch_end(None, {}, 1)  # epoch 2: fires
    assert len(calls) == 1
    assert os.path.exists(tmp_path / "samples_epoch2.png")
