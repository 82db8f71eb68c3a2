"""Lesion eval, metrics, bootstrap, checkpointing, CSV logging tests."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from adell_mri_tpu.eval import (
    Metrics,
    bootstrap_metric,
    binary_metrics,
    dice_score,
    evaluate,
    extract_lesion_candidates,
)
from adell_mri_tpu.train.checkpoints import (
    CheckpointManager,
    freeze_mask_by_regex,
    load_params_into,
)
from adell_mri_tpu.train.logging_utils import CSVLogger, MetricLogger


def _heatmap_with_lesions():
    det = np.zeros((24, 24, 8), np.float32)
    det[4:8, 4:8, 2:5] = 0.9
    det[14:18, 14:18, 2:5] = 0.6
    truth = np.zeros_like(det)
    truth[4:8, 4:8, 2:5] = 1.0  # only the first is a real lesion
    return det, truth


def test_extract_lesion_candidates_dynamic():
    det, _ = _heatmap_with_lesions()
    hard, confs, indexed = extract_lesion_candidates(det)
    assert len(confs) == 2
    assert confs[0][1] == pytest.approx(0.9, abs=1e-3)
    assert indexed.max() == 2


def test_extract_min_voxels_filters():
    det = np.zeros((10, 10, 4), np.float32)
    det[0, 0, 0] = 0.99  # single voxel: below min_voxels
    _, confs, _ = extract_lesion_candidates(det, min_voxels=10)
    assert confs == []


def test_evaluate_end_to_end():
    det, truth = _heatmap_with_lesions()
    neg = np.zeros_like(det)
    m = evaluate([det, neg], [truth, neg], num_parallel_calls=2)
    assert 0 <= m.AP <= 1
    # case-level: positive case has conf 0.9, negative case 0.0 -> AUC 1
    assert m.auroc == pytest.approx(1.0)
    # one TP (conf .9), one FP (conf .6), lesion AP should be high
    assert m.AP == pytest.approx(1.0, abs=0.2)


def test_binary_metrics_and_bootstrap():
    rng = np.random.default_rng(0)
    target = rng.integers(0, 2, 200)
    pred = np.clip(target * 0.7 + rng.normal(0, 0.2, 200) + 0.15, 0, 1)
    bm = binary_metrics(pred, target)
    assert bm["auc"] > 0.9
    point, lo, hi = bootstrap_metric(
        lambda p, t: dice_score(p, t), pred, target, n_bootstraps=50
    )
    assert lo <= point <= hi


def test_checkpoint_roundtrip_and_metadata(tmp_path):
    import jax

    from adell_mri_tpu.train import TrainState, get_optimizer

    params = {"dense": {"kernel": jnp.ones((4, 2)), "bias": jnp.zeros(2)}}
    tx = get_optimizer("sgd", learning_rate=0.1)
    state = TrainState.create(lambda *a: None, params, tx)
    mngr = CheckpointManager(
        str(tmp_path),
        name="unet",
        fold=0,
        metadata={"network_config": {"depth": [4, 8]}, "train_pids": ["a"]},
        monitor="val_loss",
    )
    mngr.save(1, state, metrics={"val_loss": 1.0})
    mngr.save(2, state.replace(params=jax.tree.map(lambda x: x * 2, params)),
              metrics={"val_loss": 0.5})
    assert mngr.latest_step() == 2
    assert mngr.best_step() == 2
    restored = mngr.restore(2, target=state)
    np.testing.assert_allclose(
        restored["params"]["dense"]["kernel"], 2 * np.ones((4, 2))
    )
    meta = mngr.load_metadata()
    assert meta["network_config"]["depth"] == [4, 8]
    assert mngr.status(max_steps=2) == "finished"
    assert mngr.status(max_steps=10) == "resume"


def test_load_params_into_excludes_and_shapes():
    params = {"enc": {"w": np.zeros((2, 2))}, "head": {"w": np.zeros(3)}}
    loaded = {"enc": {"w": np.ones((2, 2))}, "head": {"w": np.ones(5)}}
    out, skipped = load_params_into(params, loaded, exclude_patterns=[])
    np.testing.assert_allclose(out["enc"]["w"], 1.0)
    np.testing.assert_allclose(out["head"]["w"], 0.0)  # shape mismatch
    assert any("head" in s for s in skipped)
    out2, skipped2 = load_params_into(
        params, loaded, exclude_patterns=["enc"]
    )
    np.testing.assert_allclose(out2["enc"]["w"], 0.0)


def test_freeze_mask():
    params = {"encoder": {"w": 1}, "decoder": {"w": 2}}
    mask = freeze_mask_by_regex(params, freeze_patterns=["encoder"])
    assert mask["encoder"]["w"] is False
    assert mask["decoder"]["w"] is True


def test_csv_logger(tmp_path):
    path = str(tmp_path / "metrics.csv")
    ml = MetricLogger(csv_path=path)
    ml.log_metrics({"dice": 0.8, "loss": 0.2}, step=1, fold=0)
    ml.log_metrics({"dice": 0.9}, step=2, fold=0)
    import pandas as pd

    df = pd.read_csv(path)
    assert len(df) == 3
    assert set(df["metric"]) == {"dice", "loss"}


def test_optimal_assignment_beats_greedy():
    """One candidate overlapping two GT lesions: optimal assignment pairs it
    with the lesion it overlaps most while the other lesion gets its own
    candidate — total matches = 2."""
    from adell_mri_tpu.eval.lesion import evaluate_case

    det = np.zeros((40, 8, 8), np.float32)
    true = np.zeros((40, 8, 8), np.float32)
    # GT lesions A=[2:12) and B=[20:30) along x (full y/z)
    true[2:12] = 1
    true[20:30] = 1
    # candidate c1 (conf .9) spans [5:27): IoU(A,c1)=0.28, IoU(B,c1)=0.28;
    # candidate c2 (conf .5) = [0:4): IoU(A,c2)=0.167, IoU(B,c2)=0.
    # Greedy gives A->c1 and leaves B unmatched; optimal assignment pairs
    # A->c2 and B->c1 so BOTH lesions match.
    det[5:27] = 0.9
    det[0:4] = 0.5
    results, conf = evaluate_case(det, true, min_overlap=0.1)
    gt_entries = [r for r in results if r[0] == 1]
    assert len(gt_entries) == 2
    # both lesions matched (no 0-conf missed lesions) -> optimal assignment
    assert all(c > 0 for _, c in gt_entries)
    assert sorted(c for _, c in gt_entries) == pytest.approx([0.5, 0.9], abs=1e-5)


def test_froc_and_bootstrap():
    from adell_mri_tpu.eval.lesion import Metrics

    m = Metrics(
        lesion_results={
            "a": [(1, 0.9), (0, 0.4)],
            "b": [(1, 0.8)],
            "c": [(1, 0.0), (0, 0.7)],  # one missed lesion, one FP
            "d": [],
        },
        case_pred={"a": 0.9, "b": 0.8, "c": 0.7, "d": 0.05},
        case_target={"a": 1, "b": 1, "c": 1, "d": 0},
    )
    fp, sens = m.froc()
    assert len(fp) == len(sens) > 0
    assert np.all(np.diff(fp) >= 0)  # fp/case increases as threshold drops
    assert np.all(np.diff(sens) >= 0)
    assert sens[-1] == pytest.approx(2 / 3)  # 2 of 3 lesions ever detected
    assert fp[-1] == pytest.approx(2 / 4)  # 2 FPs over 4 cases
    s = m.froc_score()
    assert 0.0 <= s <= 1.0
    boot = m.bootstrap(n_bootstraps=50, seed=0)
    for k in ("AP", "auroc", "score"):
        point, lo, hi = boot[k]
        assert lo <= point <= hi or np.isnan(lo)


def test_lesion_eval_callback_collects_and_reports():
    import flax.linen as nn
    from adell_mri_tpu.eval.callbacks import LesionEvalCallback

    class Identity(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return x, None

    model = Identity()
    cb = LesionEvalCallback(model, max_cases=8)
    true = np.zeros((2, 16, 16, 8, 1), np.float32)
    true[:, 4:10, 4:10, 2:6] = 1.0
    batch = {
        "image": jnp.asarray(true * 0.95),
        "label": jnp.asarray(true[..., 0]),
    }
    cb.on_validation_batch({}, batch, {})
    neg = {
        "image": jnp.zeros((2, 16, 16, 8, 1)),
        "label": jnp.zeros((2, 16, 16, 8)),
    }
    cb.on_validation_batch({}, neg, {})
    out = cb.on_validation_end({})
    assert out is not None and "V_AP" in out and "V_AUC" in out
    assert out["V_AP"] > 0.9 and out["V_AUC"] > 0.9
    # state cleared for the next epoch
    assert cb.on_validation_end({}) is None


def test_multiclass_metrics_dict():
    from adell_mri_tpu.eval.metrics import multiclass_metrics

    rng = np.random.default_rng(0)
    n, c = 200, 3
    target = rng.integers(0, c, n)
    probs = rng.dirichlet(np.ones(c), n)
    # make predictions informative for a sane AUC
    probs[np.arange(n), target] += 1.0
    probs /= probs.sum(-1, keepdims=True)
    m = multiclass_metrics(probs, target)
    for k in ("accuracy", "precision", "recall", "specificity", "f1",
              "auc", "ece", "precision_c0", "recall_c2", "f1_c1"):
        assert k in m, k
    assert m["accuracy"] == 1.0  # argmax matches by construction
    assert m["auc"] > 0.9


def test_binary_metrics_has_specificity():
    from adell_mri_tpu.eval.metrics import binary_metrics

    pred = np.asarray([0.9, 0.1, 0.8, 0.2])
    target = np.asarray([1, 0, 1, 0])
    m = binary_metrics(pred, target)
    assert m["specificity"] == 1.0 and m["recall"] == 1.0


def test_segmentation_class_metrics():
    from adell_mri_tpu.eval.metrics import segmentation_class_metrics

    pred = np.zeros((8, 8), int)
    target = np.zeros((8, 8), int)
    pred[:4] = 1
    target[:4] = 1
    pred[4:6] = 2
    target[4:8] = 2
    m = segmentation_class_metrics(pred, target, n_classes=3)
    assert m["dice_c1"] == 1.0
    assert 0 < m["dice_c2"] < 1
    assert "dice_macro" in m and "iou_macro" in m


def test_classification_metrics_callback():
    import flax.linen as nn
    import jax

    from adell_mri_tpu.eval.callbacks import ClassificationMetricsCallback

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Dense(3)(x.reshape(x.shape[0], -1))

    model = Tiny()
    x = np.random.default_rng(0).normal(size=(4, 2, 2, 1)).astype(np.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    cb = ClassificationMetricsCallback(model, n_classes=3)
    batch = {"image": x, "label": np.asarray([0, 1, 2, 1])}
    cb.on_validation_batch(params, batch, {})
    out = cb.on_validation_end(params)
    assert out is not None and "V_f1" in out and "V_specificity" in out
    # state resets between epochs
    assert cb.on_validation_end(params) is None


def test_predict_fold_selection(tmp_path):
    """--fold -1 picks the fold with the best monitored value."""
    import json

    from adell_mri_tpu.entrypoints.segmentation.predict import _select_fold

    for fold, val in ((0, 0.5), (1, 0.8), (2, 0.7)):
        d = tmp_path / f"segmentation_fold{fold}"
        d.mkdir()
        (d / "best.json").write_text(json.dumps({"step": 3, "value": val}))
        (d / "metadata.json").write_text(
            json.dumps({"monitor": "val_dice", "mode": "max"})
        )
    assert _select_fold(str(tmp_path), "segmentation", -1) == 1
    assert _select_fold(str(tmp_path), "segmentation", 2) == 2
    # min-mode metric flips the comparison
    for fold in (0, 1, 2):
        d = tmp_path / f"segmentation_fold{fold}"
        (d / "metadata.json").write_text(
            json.dumps({"monitor": "val_loss", "mode": "min"})
        )
    assert _select_fold(str(tmp_path), "segmentation", -1) == 0


def test_predict_fold_selection_missing_metadata(tmp_path):
    """A fold without metadata.json must not flip the comparison mode."""
    import json

    from adell_mri_tpu.entrypoints.segmentation.predict import _select_fold

    for fold, val in ((0, 0.5), (1, 0.9)):
        d = tmp_path / f"segmentation_fold{fold}"
        d.mkdir()
        (d / "best.json").write_text(json.dumps({"step": 3, "value": val}))
    # only fold0 records the (max) mode
    (tmp_path / "segmentation_fold0" / "metadata.json").write_text(
        json.dumps({"monitor": "val_dice", "mode": "max"})
    )
    assert _select_fold(str(tmp_path), "segmentation", -1) == 1


def test_checkpoint_retention_protects_best(tmp_path):
    """Retention (max_to_keep) must never delete the step best.json points
    at — early stopping restores the BEST step long after it stopped being
    recent."""
    mngr = CheckpointManager(
        str(tmp_path), name="m", fold=0, monitor="val_loss", max_to_keep=2
    )
    state = {"params": {"w": np.ones((3,), np.float32)}}
    losses = {1: 0.5, 2: 0.1, 3: 0.4, 4: 0.3, 5: 0.2}  # best at step 2
    for step, v in losses.items():
        state["params"]["w"] = np.full((3,), float(step), np.float32)
        mngr.save(step, state, metrics={"val_loss": v})
    assert mngr.best_step() == 2
    restored = mngr.restore(
        mngr.best_step(), target={"params": {"w": np.zeros((3,), np.float32)}}
    )
    assert restored["params"]["w"][0] == 2.0
    # recent steps survive too, older non-best ones are gone
    steps = set(mngr._mngr.all_steps())
    assert {2, 4, 5} <= steps and 1 not in steps and 3 not in steps


def test_ece_includes_saturated_confidence():
    from adell_mri_tpu.eval.metrics import expected_calibration_error

    # all predictions exactly 1.0 but half are wrong: ECE must see them
    pred = np.ones((10,), np.float64)
    target = np.asarray([1, 0] * 5, np.float64)
    assert abs(expected_calibration_error(pred, target) - 0.5) < 1e-9


def test_extract_dynamic_all_blobs_too_small_yields_nothing():
    """When every blob at the dynamic threshold is below min_voxels, no
    bogus whole-volume candidate may be emitted."""
    softmax = np.zeros((12, 12, 6), np.float32)
    softmax[3, 3, 2] = 0.9  # a single voxel, below min_voxels=10
    blobs, confidences, indexed = extract_lesion_candidates(
        softmax, threshold="dynamic", min_voxels=10
    )
    assert confidences == []
    assert indexed.max() == 0


def test_best_step_falls_back_when_best_json_uncommitted(tmp_path):
    """best.json is written when a save is SCHEDULED; a crash before the
    async writer commits can leave it pointing at a step with no payload.
    best_step() must fall back to the latest committed step, not crash
    downstream restores."""
    import json

    import jax
    import jax.numpy as jnp

    from adell_mri_tpu.train import TrainState, get_optimizer
    from adell_mri_tpu.train.checkpoints import CheckpointManager

    params = {"w": jnp.ones((3,))}
    state = TrainState.create(
        lambda *a: None, params, get_optimizer("sgd", learning_rate=0.1)
    )
    mngr = CheckpointManager(str(tmp_path), name="m", fold=0)
    mngr.save(1, state, metrics={"val_loss": 1.0})
    mngr.wait()
    # simulate the crash: best.json points at a step that never landed
    with open(f"{mngr.dir}/best.json", "w") as f:
        json.dump({"step": 7, "value": 0.1}, f)
    assert mngr.best_step() == 1
    restored = mngr.restore(mngr.best_step(), target={"params": params})
    assert restored is not None


def test_best_json_nan_and_fresh_run_reset(tmp_path):
    """(a) A NaN monitored metric is never recorded as best (NaN would
    win every later comparison, pinning garbage weights); (b) begin_run
    on a fresh (non-resume) run drops a stale best.json left by a prior
    run into the same directory, which would otherwise win every
    comparison and keep serving the OLD run's weights."""
    import json

    import jax.numpy as jnp

    from adell_mri_tpu.train import TrainState, get_optimizer
    from adell_mri_tpu.train.checkpoints import CheckpointManager

    params = {"w": jnp.ones((3,))}
    state = TrainState.create(
        lambda *a: None, params, get_optimizer("sgd", learning_rate=0.1)
    )
    mngr = CheckpointManager(str(tmp_path), name="m", fold=0)
    mngr.save(1, state, metrics={"val_loss": float("nan")})
    mngr.wait()
    assert mngr.best_step() is None or not os.path.exists(
        os.path.join(mngr.dir, "best.json")
    )
    mngr.save(2, state, metrics={"val_loss": 0.5})
    mngr.wait()
    assert mngr.best_step() == 2
    # a NaN arriving AFTER a finite best must not displace it
    mngr.save(3, state, metrics={"val_loss": float("nan")})
    mngr.wait()
    assert mngr.best_step() == 2

    # run B reuses the directory fresh: stale best must be dropped
    # (best_step() then falls back to the latest committed step until
    # run B records its own best — the point is run A's metric no longer
    # wins comparisons)
    mngr2 = CheckpointManager(str(tmp_path), name="m", fold=0)
    mngr2.begin_run(resume=False)
    assert not os.path.exists(os.path.join(mngr2.dir, "best.json"))
    mngr2.save(4, state, metrics={"val_loss": 0.9})  # worse than run A's
    mngr2.wait()
    assert mngr2.best_step() == 4  # run A's 0.5 no longer defends
    # ...but a RESUMED run keeps the interrupted run's best record
    mngr2.begin_run(resume=True)
    assert os.path.exists(os.path.join(mngr2.dir, "best.json"))
    assert mngr2.best_step() == 4


def test_checkpoint_save_snapshots_own_memory():
    """save()'s host snapshot must OWN its buffers: on the CPU backend
    np.asarray of a jax.Array is a zero-copy memoryview of the device
    buffer, which a donating train step invalidates while the async orbax
    writer is still serializing (review r3)."""
    x = jnp.arange(8, dtype=jnp.float32)
    view = np.asarray(x)
    if view.flags.owndata:  # pragma: no cover - backend-dependent
        pytest.skip("this backend already copies on np.asarray")
    a = CheckpointManager._host_copy(x)
    assert a.flags.owndata
    np.testing.assert_array_equal(a, view)
    # non-array leaves pass through as owned 0-d arrays
    assert CheckpointManager._host_copy(3).flags.owndata


def test_resume_restores_state_and_epoch(tmp_path):
    """Regression: status()=='resume' existed but nothing ever restored —
    --resume_from_last silently RESTARTED interrupted runs from scratch.
    resume() must bring back params, opt_state (momentum) and the step."""
    import jax
    import jax.numpy as jnp
    import optax

    from adell_mri_tpu.train.checkpoints import CheckpointManager
    from adell_mri_tpu.train.state import TrainState

    def apply_fn(params, x):
        return x @ params["params"]["w"]

    tx = optax.sgd(0.1, momentum=0.9)
    params = {"w": jnp.ones((3, 2))}
    state = TrainState.create(apply_fn=apply_fn, params=params, tx=tx)
    # take two steps so opt_state momentum is nonzero
    for _ in range(2):
        g = {"w": jnp.full((3, 2), 0.5)}
        updates, new_opt = state.tx.update(g, state.opt_state, state.params)
        state = state.replace(
            params=optax.apply_updates(state.params, updates),
            opt_state=new_opt,
            step=state.step + 1,
        )
    ckpt = CheckpointManager(str(tmp_path), name="m", fold=0)
    ckpt.save(2, state, metrics={"val_loss": 1.0})
    ckpt.wait()
    assert ckpt.status(max_steps=5) == "resume"

    fresh = TrainState.create(
        apply_fn=apply_fn, params={"w": jnp.ones((3, 2))}, tx=tx
    )
    resumed, start_epoch = ckpt.resume(fresh)
    assert start_epoch == 2
    np.testing.assert_allclose(
        np.asarray(resumed.params["w"]), np.asarray(state.params["w"])
    )
    # momentum buffer restored with its optax structure intact
    live_tr = [
        x for x in jax.tree.leaves(resumed.opt_state) if np.ndim(x) == 2
    ]
    want_tr = [
        x for x in jax.tree.leaves(state.opt_state) if np.ndim(x) == 2
    ]
    assert live_tr and all(
        np.allclose(a, b) for a, b in zip(live_tr, want_tr)
    )
    assert int(resumed.step) == 2
    # and the restored opt_state still drives an update without error
    g = {"w": jnp.full((3, 2), 0.5)}
    updates, _ = resumed.tx.update(g, resumed.opt_state, resumed.params)
    assert np.isfinite(np.asarray(updates["w"])).all()
    # a fresh directory is a no-op
    ckpt2 = CheckpointManager(str(tmp_path), name="other", fold=0)
    same, ep = ckpt2.resume(fresh)
    assert ep == 0 and same is fresh


def test_optimizer_weight_decay_applies_to_adam_family():
    """Regression: adam/adamax/nadam/radam/rmsprop/adagrad silently dropped
    weight_decay (torch applies coupled L2 for all of them)."""
    import jax.numpy as jnp
    import optax

    from adell_mri_tpu.train.optim import get_optimizer

    params = {"w": jnp.ones((4,)), "bias": jnp.ones((4,))}
    zero_g = {"w": jnp.zeros((4,)), "bias": jnp.zeros((4,))}
    for name in ("adam", "adamax", "nadam", "radam", "rmsprop", "adagrad"):
        tx = get_optimizer(name, 0.1, weight_decay=1e-2, params=params)
        opt = tx.init(params)
        updates, _ = tx.update(zero_g, opt, params)
        assert float(jnp.abs(updates["w"]).max()) > 0, name
        # torch decays EVERY parameter (bias included) and so do the
        # reference's seg/classification optimizers — only SSL opts out
        # (get_optimizer exclude_norms_from_decay)
        assert float(jnp.abs(updates["bias"]).max()) > 0, name
        tx_ssl = get_optimizer(
            name, 0.1, weight_decay=1e-2, params=params,
            exclude_norms_from_decay=True,
        )
        opt = tx_ssl.init(params)
        updates, _ = tx_ssl.update(zero_g, opt, params)
        assert float(jnp.abs(updates["bias"]).max()) == 0, name


def test_train_loop_steps_per_epoch_no_overfetch_and_real_samples():
    """Regression: the steps_per_epoch cap used to fetch-and-discard one
    batch past the cap, and samples_per_sec counted pad-duplicated rows."""
    import jax.numpy as jnp

    from adell_mri_tpu.train.loop import TrainLoop

    pulls = []

    def gen():
        for i in range(5):
            pulls.append(i)
            yield {"image": np.ones((2, 4), np.float32)}

    loop = TrainLoop(
        train_step=lambda s, b, k: (s, {"loss": jnp.float32(0.0)}),
        max_epochs=1,
        steps_per_epoch=2,
    )
    _, metrics = loop._epoch(None, gen(), 0)
    assert pulls == [0, 1]
    assert "samples_per_sec" in metrics


def test_ordinal_callback_scores_cumulative_logits():
    """Regression: OrdNet's cumulative threshold logits were scored as
    class logits — a PERFECT ordinal model reported V_accuracy 0.25."""
    import jax.numpy as jnp

    from adell_mri_tpu.eval.callbacks import ClassificationMetricsCallback

    class StubOrd:
        def apply(self, variables, x, train=False):
            # perfect cumulative logits for label k encoded in x[:, 0]:
            # logit_j = +5 if k > j else -5
            k = x[:, 0]
            return jnp.stack(
                [jnp.where(k > j, 5.0, -5.0) for j in range(2)], axis=-1
            )

    cb = ClassificationMetricsCallback(StubOrd(), n_classes=3, ordinal=True)
    labels = np.asarray([0, 1, 2, 1, 0, 2], np.float32)
    batch = {"image": labels[:, None], "label": labels}
    cb.on_validation_batch({}, batch, {})
    out = cb.on_validation_end({})
    assert out["V_accuracy"] == 1.0


def test_lesion_pr_curve_consistent_with_ap():
    """Regression: precision_recall() skipped the zero-threshold precision
    zeroing AP applies, so the curve integrated above the reported AP
    whenever a GT lesion was missed."""
    from adell_mri_tpu.eval.lesion import Metrics

    m = Metrics(
        lesion_results={
            "a": [(1, 0.9), (0, 0.4)],
            "b": [(1, 0.0)],  # missed lesion placeholder
        },
        case_pred={"a": 0.9, "b": 0.0},
        case_target={"a": 1, "b": 1},
    )
    prec, rec, thr = m.precision_recall()
    ap_from_curve = float(-np.sum(np.diff(rec) * np.asarray(prec)[:-1]))
    assert abs(ap_from_curve - m.AP) < 1e-9


def test_lesion_metrics_save_load_roundtrip(tmp_path):
    """Parity: picai_eval/metrics.py:466-499 save/load via
    data_utils.py save_metrics (sterilized JSON, atomic write)."""
    from adell_mri_tpu.eval.lesion import Metrics

    m = Metrics(
        lesion_results={"a": [(1, 0.9), (0, 0.3)], "b": []},
        case_pred={"a": np.float32(0.9), "b": 0.1},
        case_target={"a": 1, "b": 0},
    )
    path = str(tmp_path / "metrics.json")
    m.save(path)
    m2 = Metrics.load(path)
    assert m2.lesion_results == {"a": [(1, 0.9), (0, 0.30000001192092896)], "b": []} or (
        m2.lesion_results["a"][0] == (1, 0.9)
    )
    assert m2.case_target == {"a": 1, "b": 0}
    assert abs(m2.AP - m.AP) < 1e-12
    assert abs(m2.auroc - m.auroc) < 1e-12
    # derived metrics ride in the saved dict (as_dict parity)
    import json

    d = json.load(open(path))
    assert {"AP", "auroc", "score"} <= set(d)
