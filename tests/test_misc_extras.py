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


def test_device_lock_timeout_keeps_earlier_locks(tmp_path):
    """A timed-out grow acquire() rolls back only the locks taken within
    THAT call — devices from an earlier successful acquire() stay held
    (the job may be computing on them; releasing them let a concurrent
    job onto the same chip)."""
    lock = DeviceLock(n_devices=2, lock_dir=str(tmp_path))
    assert lock.acquire(1) == [0]
    other = DeviceLock(n_devices=2, lock_dir=str(tmp_path))
    assert other.acquire(1) == [1]
    try:
        lock.acquire(2)  # can't grow: device 1 is held by `other`
        raise AssertionError("expected TimeoutError")
    except TimeoutError:
        pass
    # device 0 must STILL be held by `lock`
    assert lock.held == [0]
    third = DeviceLock(n_devices=2, lock_dir=str(tmp_path))
    try:
        third.acquire(1, timeout=0.0)
        # only device 1 could have been free — and it is not
        raise AssertionError("expected TimeoutError")
    except TimeoutError:
        pass
    other.release()
    lock.release()


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


def test_get_ensemble_prediction_mean_median():
    """Parity: utils/prediction_utils.py:6-56 — per-id aggregation with
    n_predictions counts; scalars stay scalars, per-class lists stay
    lists; median supported (the reference helper's second mode)."""
    from adell_mri_tpu.entrypoints.prediction_utils import (
        get_ensemble_prediction,
    )

    records = [
        {"predictions": {"a": 0.2, "b": [0.1, 0.9]}},
        {"predictions": {"a": 0.4, "b": [0.3, 0.7]}},
        {"predictions": {"a": 0.9}},
    ]
    ens = get_ensemble_prediction(records, "mean")
    assert ens["checkpoint"] == "ensemble"
    assert abs(ens["predictions"]["a"] - 0.5) < 1e-12
    assert ens["n_predictions"]["a"] == 3
    assert np.allclose(ens["predictions"]["b"], [0.2, 0.8])
    assert ens["n_predictions"]["b"] == 2
    med = get_ensemble_prediction(records, "median")
    assert abs(med["predictions"]["a"] - 0.4) < 1e-12
    try:
        get_ensemble_prediction(records, "majority")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_derive_n_classes_and_label_groups():
    """Parity: classification/train.py:162-174 — n_classes follows the
    label flags (label_groups > positive_labels > possible_labels), and
    a contradicting explicit --n_classes raises."""
    from types import SimpleNamespace as NS

    from adell_mri_tpu.entrypoints.cli_utils import (
        derive_n_classes,
        parse_label_groups,
    )

    base = dict(label_groups=None, positive_labels=None,
                possible_labels=None, n_classes=2)
    assert derive_n_classes(NS(**base)) == 2
    assert derive_n_classes(
        NS(**{**base, "possible_labels": ["0", "1", "2"]})
    ) == 3
    assert derive_n_classes(
        NS(**{**base, "possible_labels": ["0", "1", "2"],
              "positive_labels": ["2"]})
    ) == 2
    assert derive_n_classes(
        NS(**{**base, "label_groups": ["0,1", "2,3", "4"]})
    ) == 3
    try:
        derive_n_classes(
            NS(**{**base, "possible_labels": ["a", "b", "c"],
                  "n_classes": 5})
        )
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    assert parse_label_groups(["0,1", "2"]) == [["0", "1"], ["2"]]
    assert parse_label_groups(None) is None


def test_classification_transforms_label_mapping(tmp_path):
    """ClassificationTransforms maps scalar labels like the reference's
    LabelOperatord: label_groups -> group index, possible_labels ->
    value index (non-numeric values included), positive_labels ->
    binarized."""
    import numpy as np

    from adell_mri_tpu.data.nifti import write_nifti
    from adell_mri_tpu.transforms.pipeline import ClassificationTransforms

    ip = str(tmp_path / "x.nii.gz")
    write_nifti(ip, np.zeros((8, 8, 4), np.float32), np.eye(4))
    entry = {"image": ip, "label": "b", "identifier": "p0"}

    kw = dict(image_keys=["image"], label_key="label",
              target_size=(8, 8, 4))
    cat = ClassificationTransforms(
        **kw, possible_labels=["a", "b", "c"]
    ).load_fn()(dict(entry))
    assert float(cat["label"]) == 1.0
    grp = ClassificationTransforms(
        **kw, label_groups=[["a"], ["b", "c"]]
    ).load_fn()(dict(entry))
    assert float(grp["label"]) == 1.0
    pos = ClassificationTransforms(
        **kw, positive_labels=["c"]
    ).load_fn()(dict(entry))
    assert float(pos["label"]) == 0.0


def test_sample_cache_is_reused():
    """The per-pid preprocessed-sample cache only engages when a pid is
    actually loaded twice (multi-checkpoint groups, or repeated pids);
    the common one-checkpoint run must not pin every volume in RAM."""
    from adell_mri_tpu.entrypoints.prediction_utils import (
        sample_cache_is_reused,
    )

    # one checkpoint, unique pids: no reuse
    assert not sample_cache_is_reused([["a", "b"], ["c"]], 1, False)
    # several checkpoints applied per group: reuse
    assert sample_cache_is_reused([["a", "b"]], 2, False)
    # one-to-one pairing keeps one checkpoint per group: no reuse...
    assert not sample_cache_is_reused([["a"], ["b"]], 2, True)
    # ...unless a pid repeats across groups
    assert sample_cache_is_reused([["a"], ["a"]], 2, True)


def test_run_prediction_matrix_one_to_one_and_labels():
    from adell_mri_tpu.entrypoints.prediction_utils import (
        run_prediction_matrix,
    )

    groups = [["a", "b"], ["c"]]
    ckpts = [("ck0", {"w": 0}), ("ck1", {"w": 1})]
    calls = []

    def predict_one(variables, pid, label):
        calls.append((variables["w"], pid, label))
        return float(variables["w"])

    out = run_prediction_matrix(
        groups, ckpts, predict_one, one_to_one=True
    )
    # checkpoint i serves group i only
    assert [(r["iteration"], r["checkpoint"]) for r in out] == [
        (0, "ck0"),
        (1, "ck1"),
    ]
    assert out[0]["predictions"] == {"a": 0.0, "b": 0.0}
    assert out[1]["predictions"] == {"c": 1.0}

    # full matrix + ensemble appended
    out = run_prediction_matrix(
        groups, ckpts, predict_one, ensemble="mean"
    )
    assert len(out) == 5  # 2 groups x 2 ckpts + ensemble
    assert out[-1]["predictions"]["a"] == 0.5

    # one_to_one with too few checkpoints errors
    try:
        run_prediction_matrix(groups, ckpts[:1], predict_one, one_to_one=True)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_manager_for_checkpoint_path(tmp_path):
    from adell_mri_tpu.entrypoints.prediction_utils import (
        manager_for_checkpoint_path,
    )

    run = tmp_path / "runs" / "model_fold2"
    run.mkdir(parents=True)
    mngr = manager_for_checkpoint_path(str(run) + "/")
    assert mngr.dir == str(run)
    try:
        manager_for_checkpoint_path(str(tmp_path / "runs" / "no_fold_dir"))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
