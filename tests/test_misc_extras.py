"""Causal effects, NormalizedActivation, DeviceLock."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from adell_mri_tpu.models.causal_effects import (
    VGGAutoencoder,
    binary_cross_entropy,
    decorrelation_loss,
    mean_squared_error,
    pt,
    root_mean_squared_error,
)
from adell_mri_tpu.models.layers.activations import NormalizedActivation
from adell_mri_tpu.utils.device_lock import DeviceLock


def test_vgg_autoencoder_roundtrip_shapes():
    m = VGGAutoencoder(in_channels=1, norm_fn="instance")
    x = jnp.zeros((1, 16, 16, 8, 1), jnp.float32)
    variables = m.init({"params": jax.random.PRNGKey(0)}, x)
    out = m.apply(variables, x)
    assert out.shape == x.shape
    feats = m.apply(variables, x, return_features=True)
    assert feats.shape == (1, 2, 2, 1, 512)


def test_causal_losses():
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.uniform(0.01, 0.99, size=(4, 10)), jnp.float32)
    target = jnp.asarray((rng.uniform(size=(4, 10)) > 0.5), jnp.float32)
    assert pt(pred, target).shape == pred.shape
    for fn in (binary_cross_entropy, mean_squared_error, root_mean_squared_error):
        v = fn(pred, target)
        assert v.shape == (4,)
        assert np.all(np.isfinite(np.asarray(v)))
    d = decorrelation_loss(pred, target, pred * 0.9)
    assert d.shape == (4,)
    # perfect prediction -> lower loss than random
    d_perfect = decorrelation_loss(target * 0.98 + 0.01, target, target)
    assert float(d_perfect.mean()) < float(d.mean())


def test_normalized_activation_stats_update():
    m = NormalizedActivation(act_str="relu")
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(8, 32)), jnp.float32
    )
    variables = m.init({"params": jax.random.PRNGKey(0)}, x)
    out, new_vars = m.apply(
        variables, x, train=True, mutable=["activation_stats"]
    )
    assert out.shape == x.shape
    assert float(new_vars["activation_stats"]["mu"][0]) != 0.0
    # eval does not mutate
    out2 = m.apply(variables, x, train=False)
    assert np.all(np.isfinite(np.asarray(out2)))


def test_device_lock(tmp_path):
    lock = DeviceLock(n_devices=2, lock_dir=str(tmp_path))
    got = lock.acquire(1)
    assert got == [0]
    lock2 = DeviceLock(n_devices=2, lock_dir=str(tmp_path))
    assert lock2.acquire(1) == [1]
    try:
        DeviceLock(n_devices=2, lock_dir=str(tmp_path)).acquire(1)
        raised = False
    except TimeoutError:
        raised = True
    assert raised
    lock.release()
    lock4 = DeviceLock(n_devices=2, lock_dir=str(tmp_path))
    assert lock4.acquire(1) == [0]
    lock4.release()
    lock2.release()
    # a leftover lock FILE without a live flock (e.g. a crashed holder —
    # the kernel released its lock) is acquirable; no stale-pid heuristic
    with open(tmp_path / "device_1.lock", "w") as f:
        f.write("999999")
    lock3 = DeviceLock(n_devices=2, lock_dir=str(tmp_path))
    assert lock3.acquire(2) == [0, 1]
    lock3.release()


def test_reference_mode_spellings_dispatch():
    # the reference's mode names (entrypoints/classification/
    # model_to_torchscript.py, ssl/model_to_torchscript.py, ssl/train_3d.py,
    # generative_gan/train_2d.py) resolve in our dispatch tables
    from adell_mri_tpu.entrypoints.classification.__main__ import (
        supported_modes as cls_modes,
    )
    from adell_mri_tpu.entrypoints.generative_gan.__main__ import (
        supported_modes as gan_modes,
    )
    from adell_mri_tpu.entrypoints.ssl.__main__ import (
        supported_modes as ssl_modes,
    )

    assert "model_to_torchscript" in cls_modes
    assert cls_modes["model_to_torchscript"] == cls_modes["model_to_export"]
    assert "model_to_torchscript" in ssl_modes
    assert "train_3d" in ssl_modes
    assert "train_2d" in gan_modes
