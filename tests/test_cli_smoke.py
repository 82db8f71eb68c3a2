"""
End-to-end CLI smoke: synthesize a tiny NIfTI cohort, run
``segmentation train`` then ``segmentation predict`` through the real
argv surface on the virtual CPU mesh. This is the wiring test the
reference lacks (SURVEY.md §4: no integration tests upstream).
"""

import json
import os

import numpy as np
import pytest

from adell_mri_tpu.__main__ import main as adell_main
from adell_mri_tpu.data.nifti import write_nifti

UNET_YAML = """
spatial_dimensions: 3
depth: [4, 8]
kernel_sizes: [3, 3]
strides: [1, 2]
conv_type: regular
link_type: identity
upscale_type: upsample
activation_fn: swish
norm_type: instance
dropout_rate: 0.0
loss_fn:
  focal:
    gamma: 2.0
"""


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    root = tmp_path_factory.mktemp("cohort")
    rng = np.random.default_rng(0)
    aff = np.array(
        [[-1.0, 0, 0, 10], [0, -1.0, 0, 20], [0, 0, 1.2, -5], [0, 0, 0, 1]]
    )  # LPS, exercises reorientation
    ds = {}
    for i in range(4):
        img = rng.normal(size=(16, 16, 8)).astype(np.float32)
        mask = (rng.uniform(size=(16, 16, 8)) > 0.9).astype(np.float32)
        ip = str(root / f"img_{i}.nii.gz")
        mp = str(root / f"mask_{i}.nii.gz")
        write_nifti(ip, img, aff)
        write_nifti(mp, mask, aff)
        ds[f"case_{i}"] = {"T2": ip, "mask": mp}
    ds_path = str(root / "ds.json")
    with open(ds_path, "w") as f:
        json.dump(ds, f)
    cfg_path = str(root / "unet.yaml")
    with open(cfg_path, "w") as f:
        f.write(UNET_YAML)
    return {"root": str(root), "ds": ds_path, "cfg": cfg_path}


def test_segmentation_train_then_predict(cohort):
    ckpt = os.path.join(cohort["root"], "ckpt")
    adell_main(
        [
            "segmentation", "train",
            "--dataset_json", cohort["ds"],
            "--image_keys", "T2",
            "--mask_keys", "mask",
            "--config_file", cohort["cfg"],
            "--pad_size", "16", "16", "8",
            "--crop_size", "16", "16", "8",
            "--target_spacing", "1.0", "1.0", "1.2",
            "--batch_size", "2",
            "--max_epochs", "1",
            "--n_folds", "1",
            "--dev", "cpu",
            "--checkpoint_dir", ckpt,
            "--cache_rate", "0.0",
        ]
    )
    assert os.path.exists(
        os.path.join(ckpt, "segmentation_fold0", "metadata.json")
    )

    preds = os.path.join(cohort["root"], "preds")
    adell_main(
        [
            "segmentation", "predict",
            "--dataset_json", cohort["ds"],
            "--image_keys", "T2",
            "--checkpoint_dir", ckpt,
            "--sliding_window_size", "16", "16", "8",
            "--output_path", preds,
            "--dev", "cpu",
        ]
    )
    out = [f for f in os.listdir(preds) if f.endswith(".nii.gz")]
    assert len(out) == 4


def test_segmentation_adc_positive_labels_roundtrip(cohort):
    """--adc_keys and --positive_labels are recorded in checkpoint
    metadata and rebuilt at test/predict — serving used to min-max scale
    ADC inputs (training rescales by the ADC factor instead) and to
    binarize test masks against the default {1} rather than the training
    positive set."""
    root = cohort["root"]
    rng = np.random.default_rng(3)
    ds = json.load(open(cohort["ds"]))
    aff = np.array(
        [[-1.0, 0, 0, 10], [0, -1.0, 0, 20], [0, 0, 1.2, -5], [0, 0, 0, 1]]
    )
    for i, k in enumerate(sorted(ds)):
        # ADC-scaled magnitudes (max >> 1e3 triggers the rescale) and a
        # {0, 2} mask labelled by --positive_labels 2
        adc = (rng.uniform(size=(16, 16, 8)) * 3000).astype(np.float32)
        mask2 = (rng.uniform(size=(16, 16, 8)) > 0.9).astype(
            np.float32
        ) * 2.0
        ap = os.path.join(root, f"adc_{i}.nii.gz")
        mp = os.path.join(root, f"mask2_{i}.nii.gz")
        write_nifti(ap, adc, aff)
        write_nifti(mp, mask2, aff)
        ds[k] = {"ADC": ap, "mask": mp}
    ds_path = os.path.join(root, "ds_adc.json")
    with open(ds_path, "w") as f:
        json.dump(ds, f)
    ckpt = os.path.join(root, "ckpt_adc")
    adell_main(
        [
            "segmentation", "train",
            "--dataset_json", ds_path,
            "--image_keys", "ADC",
            "--adc_keys", "ADC",
            "--mask_keys", "mask",
            "--positive_labels", "2",
            "--config_file", cohort["cfg"],
            "--pad_size", "16", "16", "8",
            "--crop_size", "16", "16", "8",
            "--target_spacing", "1.0", "1.0", "1.2",
            "--batch_size", "2",
            "--max_epochs", "1",
            "--n_folds", "1",
            "--dev", "cpu",
            "--checkpoint_dir", ckpt,
            "--cache_rate", "0.0",
        ]
    )
    meta = json.load(
        open(os.path.join(ckpt, "segmentation_fold0", "metadata.json"))
    )
    assert meta["transform_arguments"]["adc_keys"] == ["ADC"]
    assert meta["transform_arguments"]["positive_labels"] == [2]

    mpath = os.path.join(root, "m_adc.csv")
    adell_main(
        [
            "segmentation", "test",
            "--dataset_json", ds_path,
            "--checkpoint_dir", ckpt,
            "--metric_path", mpath,
            "--dev", "cpu",
        ]
    )
    preds = os.path.join(root, "preds_adc")
    adell_main(
        [
            "segmentation", "predict",
            "--dataset_json", ds_path,
            "--checkpoint_dir", ckpt,
            "--output_path", preds,
            "--dev", "cpu",
        ]
    )
    assert len([f for f in os.listdir(preds) if f.endswith(".nii.gz")]) == 4


def test_utils_tools_run(cohort, capsys):
    adell_main(
        [
            "utils", "describe_image",
            "--input_path",
            json.load(open(cohort["ds"]))["case_0"]["T2"],
        ]
    )
    desc = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert desc["shape"][:3] == [16, 16, 8]


CAT_YAML = """
resnet_structure: [[4, 8, 3, 1]]
norm_type: instance
gaussian_process: true
batch_size: 2
learning_rate: 0.002
"""


def test_classification_gp_conformal_train_then_predict_sets(cohort):
    """GP-head training fits a covariance, --calibration_ids fits conformal
    APS, and predict --prediction_type set emits prediction sets using both
    (VERDICT round-1 item 7)."""
    root = cohort["root"]
    # classification labels ride in the same dataset json
    ds = json.load(open(cohort["ds"]))
    for i, k in enumerate(sorted(ds)):
        ds[k]["label"] = i % 2
    ds_path = os.path.join(root, "ds_cls.json")
    with open(ds_path, "w") as f:
        json.dump(ds, f)
    cfg_path = os.path.join(root, "cat.yaml")
    with open(cfg_path, "w") as f:
        f.write(CAT_YAML)
    ckpt = os.path.join(root, "ckpt_cls")
    adell_main(
        [
            "classification", "train",
            "--dataset_json", ds_path,
            "--image_keys", "T2",
            "--label_keys", "label",
            "--config_file", cfg_path,
            "--pad_size", "16", "16", "8",
            "--target_spacing", "1.0", "1.0", "1.2",
            "--batch_size", "2",
            "--max_epochs", "1",
            "--n_folds", "1",
            "--dev", "cpu",
            "--checkpoint_dir", ckpt,
            "--cache_rate", "0.0",
            "--calibration_ids", "case_0",
        ]
    )
    run_dir = os.path.join(ckpt, "classification_fold0")
    assert os.path.exists(os.path.join(run_dir, "gp_covariance.npy"))
    conf = json.load(open(os.path.join(run_dir, "conformal.json")))
    assert 0.0 < conf["q_hat"] <= 1.0 and conf["n_calibration"] == 1

    out_path = os.path.join(root, "cls_sets.json")
    adell_main(
        [
            "classification", "predict",
            "--dataset_json", ds_path,
            "--checkpoint_dir", ckpt,
            "--prediction_type", "set",
            "--output_path", out_path,
            "--dev", "cpu",
        ]
    )
    sets = json.load(open(out_path))
    assert len(sets) == 4
    for members in sets.values():
        # non-empty subsets of {0, 1}
        assert 1 <= len(members) <= 2
        assert all(m in (0, 1) for m in members)


ORD_YAML = """
resnet_structure: [[4, 8, 3, 1]]
norm_type: instance
batch_size: 2
learning_rate: 0.002
"""


def test_classification_ordinal_multiclass_roundtrip(cohort):
    """OrdNet 3-class round trip: n_classes follows --possible_labels like
    the reference (no --n_classes needed; it used to silently train a
    binary model), and test/predict convert the cumulative threshold
    logits to class probabilities (plain softmax corrupted AUC and made
    the top class unreachable)."""
    root = cohort["root"]
    ds = json.load(open(cohort["ds"]))
    for i, k in enumerate(sorted(ds)):
        ds[k]["label"] = i % 3
    ds_path = os.path.join(root, "ds_ord.json")
    with open(ds_path, "w") as f:
        json.dump(ds, f)
    cfg_path = os.path.join(root, "ord.yaml")
    with open(cfg_path, "w") as f:
        f.write(ORD_YAML)
    ckpt = os.path.join(root, "ckpt_ord")
    adell_main(
        [
            "classification", "train",
            "--dataset_json", ds_path,
            "--image_keys", "T2",
            "--label_keys", "label",
            "--possible_labels", "0", "1", "2",
            "--classification_net_type", "ord",
            "--config_file", cfg_path,
            "--pad_size", "16", "16", "8",
            "--target_spacing", "1.0", "1.0", "1.2",
            "--batch_size", "2",
            "--max_epochs", "1",
            "--n_folds", "1",
            "--dev", "cpu",
            "--checkpoint_dir", ckpt,
            "--cache_rate", "0.0",
        ]
    )
    meta = json.load(
        open(os.path.join(ckpt, "classification_fold0", "metadata.json"))
    )
    assert meta["n_classes"] == 3
    assert meta["transform_arguments"]["possible_labels"] == ["0", "1", "2"]

    metric_path = os.path.join(root, "m_ord.csv")
    adell_main(
        [
            "classification", "test",
            "--dataset_json", ds_path,
            "--checkpoint_dir", ckpt,
            "--metric_path", metric_path,
            "--dev", "cpu",
        ]
    )
    import csv

    keys = {row["metric"] for row in csv.DictReader(open(metric_path))}
    assert "precision_c2" in keys  # 3-class metrics, incl. the top class

    out_path = os.path.join(root, "preds_ord.json")
    adell_main(
        [
            "classification", "predict",
            "--dataset_json", ds_path,
            "--checkpoint_dir", ckpt,
            "--output_path", out_path,
            "--dev", "cpu",
        ]
    )
    preds = json.load(open(out_path))
    assert len(preds) == 4
    for probs in preds.values():
        assert len(probs) == 3
        assert abs(sum(probs) - 1.0) < 1e-5
        assert all(p >= 0 for p in probs)


SSL2D_YAML = """
backbone_structure: [[4, 8, 3, 1]]
norm_type: instance
projection_head: [16, 8]
prediction_head: [8, 8]
batch_size: 2
learning_rate: 0.001
"""


def test_ssl_train_2d_from_dicom(tmp_path):
    """ssl train_2d trains from a synthetic DICOM tree via DICOMDataset +
    SliceSampler (VERDICT round-1 item 8)."""
    from adell_mri_tpu.data.dicom import write_dicom

    rng = np.random.default_rng(0)
    ds = {}
    for s in range(3):
        study = {}
        for se in range(2):
            uid = f"series_{se}"
            sedir = tmp_path / f"study_{s}" / uid
            os.makedirs(sedir, exist_ok=True)
            entries = []
            for i in range(3):
                arr = rng.normal(size=(20, 18)).astype(np.float32)
                path = str(sedir / f"slice_{i}.dcm")
                write_dicom(path, arr, series_uid=uid)
                entries.append({"image": path})
            study[uid] = entries
        ds[f"study_{s}"] = study
    ds_path = str(tmp_path / "dicom_ds.json")
    with open(ds_path, "w") as f:
        json.dump(ds, f)
    cfg_path = str(tmp_path / "ssl2d.yaml")
    with open(cfg_path, "w") as f:
        f.write(SSL2D_YAML)

    ckpt = str(tmp_path / "ckpt")
    metrics = str(tmp_path / "metrics.csv")
    adell_main(
        [
            "ssl", "train_2d",
            "--dataset_json", ds_path,
            "--image_keys", "series_0", "series_1",
            "--config_file", cfg_path,
            "--crop_size", "16", "16",
            "--random_crop_size", "12", "12",
            "--ssl_method", "vicreg",
            "--batch_size", "2",
            "--max_epochs", "1",
            "--n_series_iterations", "1",
            "--dev", "cpu",
            "--checkpoint_dir", ckpt,
            "--metric_path", metrics,
        ]
    )
    assert os.path.exists(
        os.path.join(ckpt, "ssl2d_vicreg_fold0", "metadata.json")
    )
    assert os.path.exists(metrics)


def test_all_entrypoints_build_parsers():
    """Every entrypoint's ARG_KEYS resolve against the registry and the
    parser builds + prints help without error (catches registry drift and
    dead-key references)."""
    import importlib
    import pkgutil

    import pytest as _pytest

    import adell_mri_tpu.entrypoints as ep

    found = 0
    for modinfo in pkgutil.walk_packages(ep.__path__, ep.__name__ + "."):
        if modinfo.name.endswith("__main__"):
            continue
        try:
            mod = importlib.import_module(modinfo.name)
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"import {modinfo.name}: {e}")
        keys = getattr(mod, "ARG_KEYS", None)
        if keys is None:
            continue
        from adell_mri_tpu.entrypoints.assemble_args import Parser

        parser = Parser(prog=modinfo.name)
        parser.add_argument_by_key(keys)
        with _pytest.raises(SystemExit):
            parser.parse_args(["--help"])
        found += 1
    assert found >= 15, f"only {found} entrypoints with ARG_KEYS found"


def test_gan_modes_cli(cohort, tmp_path):
    """The three GAN training modes exercise end-to-end through argv:
    conditional ACGAN, CycleGAN, progressive growing (VERDICT r1 item 4)."""
    root = cohort["root"]
    # add class labels + a second modality to the dataset for conditioning
    with open(cohort["ds"]) as f:
        ds = json.load(f)
    for i, (k, v) in enumerate(ds.items()):
        v["grade"] = i % 2
        v["adc"] = v["T2"]  # same file as a stand-in second domain
    ds2 = str(tmp_path / "ds_gan.json")
    with open(ds2, "w") as f:
        json.dump(ds, f)
    cfg = str(tmp_path / "gan.yaml")
    with open(cfg, "w") as f:
        f.write(
            "batch_size: 2\nnum_channels: [4, 8]\ndisc_depth: [4, 8]\n"
            "attention_levels: [false, false]\n"
            "depths: [8, 8]\nbase_resolution: 4\nlatent_dim: 8\n"
        )
    base = [
        "generative_gan", "train", "--dataset_json", ds2,
        "--image_keys", "T2", "--pad_size", "8", "8",
        "--target_spacing", "1", "1", "1.2", "--config_file", cfg,
        "--max_epochs", "1", "--batch_size", "2", "--cache_rate", "1.0",
        "--dev", "cpu", "--seed", "0",
    ]
    adell_main(base + [
        "--generator_type", "conditional", "--class_target_key", "grade",
        "--checkpoint_dir", str(tmp_path / "c1"),
        "--metric_path", str(tmp_path / "m1.csv"),
    ])
    # cycle with MULTIPLE image_keys: domain B must be image_keys[0]'s
    # single channel (the stacked 2-channel load used to crash the
    # 1-channel discriminator, review r3)
    i = base.index("T2")
    adell_main(base[: i + 1] + ["adc"] + base[i + 1 :] + [
        "--input_image_key", "adc", "--cycle_consistency",
        "--lambda_cycle", "10", "--lambda_identity", "1",
        "--checkpoint_dir", str(tmp_path / "c2"),
        "--metric_path", str(tmp_path / "m2.csv"),
    ])
    adell_main(base + [
        "--progressive", "--epochs_per_level", "1", "--max_epochs", "2",
        "--transition_epochs", "1", "--r1_weight", "1.0",
        "--checkpoint_dir", str(tmp_path / "c3"),
        "--metric_path", str(tmp_path / "m3.csv"),
    ])
    # StyleGAN: style mixing + noise injection + StyleGANLoss
    # (VERDICT r2 item 6)
    adell_main(base + [
        "--gan_type", "stylegan", "--epochs_per_level", "1",
        "--max_epochs", "2", "--transition_epochs", "1",
        "--checkpoint_dir", str(tmp_path / "c4"),
        "--metric_path", str(tmp_path / "m4.csv"),
    ])
    meta = json.load(
        open(tmp_path / "c4" / "progan_fold0" / "metadata.json")
    )
    assert meta["gan_type"] == "stylegan"
    for m in ("m1.csv", "m2.csv", "m3.csv", "m4.csv"):
        assert os.path.exists(tmp_path / m)
    # mode conflicts refuse instead of silently ignoring flags (review
    # r3): progressive consumes only batch["image"]
    with pytest.raises(ValueError, match="not supported"):
        adell_main(base + [
            "--progressive", "--class_target_key", "grade",
            "--checkpoint_dir", str(tmp_path / "c5"),
        ])
    # progressive geometry: pad_size must be base_resolution * 2^k
    # (int(log2) floor would otherwise finish BELOW the requested size)
    j = base.index("--pad_size")
    bad = base[:j] + ["--pad_size", "10", "10"] + base[j + 3 :]
    with pytest.raises(ValueError, match="power of two"):
        adell_main(bad + [
            "--progressive", "--checkpoint_dir", str(tmp_path / "c5"),
        ])
    # latent-generator geometry: pad_size not divisible by 2^len(depth)
    # would train the critic on mismatched real/fake sizes
    with pytest.raises(ValueError, match="divisible"):
        adell_main(bad + ["--checkpoint_dir", str(tmp_path / "c5")])


def test_conditioned_segmentation_train_then_predict(cohort, tmp_path):
    """--skip_keys/--feature_keys conditioning round-trips: metadata records
    the keys, predict rebuilds and feeds them (VERDICT-r2 self-review
    finding: conditioned checkpoints must stay usable for inference)."""
    with open(cohort["ds"]) as f:
        ds = json.load(f)
    for i, v in enumerate(ds.values()):
        v["aux"] = v["mask"]  # skip-conditioning image
        v["psa"] = float(i)
    ds2 = str(tmp_path / "ds_cond.json")
    with open(ds2, "w") as f:
        json.dump(ds, f)
    ck = str(tmp_path / "ck")
    adell_main([
        "segmentation", "train", "--dataset_json", ds2,
        "--image_keys", "T2", "--mask_keys", "mask",
        "--skip_keys", "aux", "--feature_keys", "psa",
        "--config_file", cohort["cfg"],
        "--pad_size", "16", "16", "8",
        "--target_spacing", "1", "1", "1.2",
        "--batch_size", "2", "--max_epochs", "1", "--n_folds", "1",
        "--dev", "cpu", "--cache_rate", "0.0",
        "--checkpoint_dir", ck,
        "--metric_path", str(tmp_path / "m.csv"), "--seed", "0",
    ])
    meta = json.load(open(os.path.join(ck, "segmentation_fold0", "metadata.json")))
    assert meta["transform_arguments"]["skip_keys"] == ["aux"]
    assert meta["transform_arguments"]["feature_keys"] == ["psa"]
    out = str(tmp_path / "preds")
    adell_main([
        "segmentation", "predict", "--dataset_json", ds2,
        "--checkpoint_dir", ck, "--output_path", out,
        "--prediction_ids", "case_0", "--dev", "cpu", "--seed", "0",
    ])
    import numpy as _np

    from adell_mri_tpu.data.nifti import read_nifti

    pred = read_nifti(os.path.join(out, "case_0_prob.nii.gz"))
    assert _np.isfinite(pred.data).all()


def test_detection_box_geometry_map(tmp_path):
    """Detection boxes map through the exact resample_to_spec geometry:
    a box at known voxel coords lands where the image content lands."""
    import numpy as _np

    from adell_mri_tpu.data.nifti import NiftiImage, write_nifti
    from adell_mri_tpu.transforms.host import resample_to_spec
    from adell_mri_tpu.data.nifti import read_nifti, reorient_to_ras

    # 2mm-spacing volume, a bright cube at voxels [10:14, 10:14, 5:7]
    vol = _np.zeros((20, 20, 10), _np.float32)
    vol[10:14, 10:14, 5:7] = 1.0
    aff = _np.diag([2.0, 2.0, 2.0, 1.0])
    p = str(tmp_path / "v.nii.gz")
    write_nifti(p, vol, aff)
    img = reorient_to_ras(read_nifti(p))
    target_spacing = (1.0, 1.0, 1.0)
    base_size = (32, 32, 16)
    res = resample_to_spec(img, target_spacing, base_size)
    # apply the SAME map the detection entrypoint applies to boxes
    spacing = _np.asarray(img.spacing, _np.float32)
    zoom = spacing / _np.asarray(target_spacing, _np.float32)
    resampled = _np.round(_np.asarray(img.data.shape[:3]) * zoom).astype(
        _np.float32
    )
    offset = (resampled - _np.asarray(base_size, _np.float32)) / 2.0
    lo = _np.asarray([10, 10, 5], _np.float32) * zoom - offset
    hi = _np.asarray([14, 14, 7], _np.float32) * zoom - offset
    # the mapped box must cover the bright region of the resampled image
    idx = _np.argwhere(res > 0.5)
    assert idx.size > 0
    img_lo, img_hi = idx.min(0), idx.max(0) + 1
    assert _np.all(_np.abs(img_lo - lo) <= 2), (img_lo, lo)
    assert _np.all(_np.abs(img_hi - hi) <= 2), (img_hi, hi)


MIL_YAML = """
first_depth: 4
n_blocks: 2
attention_dim: 16
batch_size: 2
learning_rate: 0.001
"""


def test_mil_train_test_predict_roundtrip(cohort):
    """classification_mil {train,test,predict} round-trip through checkpoint
    metadata (VERDICT r2 item 3)."""
    root = cohort["root"]
    ds = json.load(open(cohort["ds"]))
    for i, k in enumerate(sorted(ds)):
        ds[k]["label"] = i % 2
    ds_path = os.path.join(root, "ds_mil.json")
    with open(ds_path, "w") as f:
        json.dump(ds, f)
    cfg_path = os.path.join(root, "mil.yaml")
    with open(cfg_path, "w") as f:
        f.write(MIL_YAML)
    ckpt = os.path.join(root, "ckpt_mil")
    adell_main(
        [
            "classification_mil", "train",
            "--dataset_json", ds_path,
            "--image_keys", "T2",
            "--label_keys", "label",
            "--config_file", cfg_path,
            "--pad_size", "16", "16", "8",
            "--target_spacing", "1.0", "1.0", "1.2",
            "--batch_size", "2",
            "--max_epochs", "1",
            "--n_folds", "1",
            "--dev", "cpu",
            "--checkpoint_dir", ckpt,
            "--cache_rate", "0.0",
        ]
    )
    meta = json.load(
        open(os.path.join(ckpt, "mil_fold0", "metadata.json"))
    )
    assert meta["mil_method"] == "standard"

    metric_path = os.path.join(root, "mil_metrics.csv")
    adell_main(
        [
            "classification_mil", "test",
            "--dataset_json", ds_path,
            "--checkpoint_dir", ckpt,
            "--metric_path", metric_path,
            "--dev", "cpu",
        ]
    )
    assert os.path.exists(metric_path)

    out_path = os.path.join(root, "mil_preds.json")
    adell_main(
        [
            "classification_mil", "predict",
            "--dataset_json", ds_path,
            "--checkpoint_dir", ckpt,
            "--output_path", out_path,
            "--precision", "bf16",
            "--dev", "cpu",
        ]
    )
    preds = json.load(open(out_path))
    assert len(preds) == 4
    assert all(0.0 <= p <= 1.0 for p in preds.values())

    # multi-checkpoint matrix + --ensemble (parity: ref predict.py:194-266
    # + utils/prediction_utils.py get_ensemble_prediction): same run dir
    # twice -> two identical records + an ensemble record equal to both
    run_dir = os.path.join(ckpt, "mil_fold0")
    out_ens = os.path.join(root, "mil_preds_ens.json")
    adell_main(
        [
            "classification_mil", "predict",
            "--dataset_json", ds_path,
            "--checkpoint_dir", ckpt,
            "--checkpoint", run_dir, run_dir,
            "--ensemble", "mean",
            "--output_path", out_ens,
            "--dev", "cpu",
        ]
    )
    records = json.load(open(out_ens))
    assert [r["checkpoint"] for r in records[:2]] == [
        os.path.abspath(run_dir)
    ] * 2 or [r["checkpoint"] for r in records[:2]] == [run_dir] * 2
    assert records[-1]["checkpoint"] == "ensemble"
    for pid, v in records[-1]["predictions"].items():
        assert abs(v - records[0]["predictions"][pid]) < 1e-6
        assert records[-1]["n_predictions"][pid] == 2
    assert set(records[-1]["predictions"]) == set(preds)

    # --one_to_one: checkpoint i serves prediction-id group i only
    out_oto = os.path.join(root, "mil_preds_oto.json")
    ids = sorted(preds)
    adell_main(
        [
            "classification_mil", "predict",
            "--dataset_json", ds_path,
            "--checkpoint_dir", ckpt,
            "--checkpoint", run_dir, run_dir,
            "--prediction_ids", ",".join(ids[:2]), ",".join(ids[2:]),
            "--one_to_one",
            "--output_path", out_oto,
            "--dev", "cpu",
        ]
    )
    records = json.load(open(out_oto))
    assert len(records) == 2
    assert sorted(records[0]["predictions"]) == ids[:2]
    assert sorted(records[1]["predictions"]) == ids[2:]
    assert records[0]["iteration"] == 0 and records[1]["iteration"] == 1


DECONF_YAML = """
resnet_structure: [[4, 8, 3, 1]]
norm_type: instance
batch_size: 2
learning_rate: 0.001
"""


def test_deconfounder_train_test_predict_roundtrip(cohort):
    """classification_deconfounder {train,test,predict} round-trip: the
    surrogate-head shapes rebuild from cat_confounder_cards metadata
    (VERDICT r2 item 3)."""
    root = cohort["root"]
    ds = json.load(open(cohort["ds"]))
    for i, k in enumerate(sorted(ds)):
        ds[k]["label"] = i % 2
        ds[k]["scanner"] = ["ge", "siemens"][i % 2]
        ds[k]["age"] = 50.0 + i
    ds_path = os.path.join(root, "ds_deconf.json")
    with open(ds_path, "w") as f:
        json.dump(ds, f)
    cfg_path = os.path.join(root, "deconf.yaml")
    with open(cfg_path, "w") as f:
        f.write(DECONF_YAML)
    ckpt = os.path.join(root, "ckpt_deconf")
    adell_main(
        [
            "classification_deconfounder", "train",
            "--dataset_json", ds_path,
            "--image_keys", "T2",
            "--label_keys", "label",
            "--cat_confounder_keys", "scanner",
            "--cont_confounder_keys", "age",
            "--config_file", cfg_path,
            "--pad_size", "16", "16", "8",
            "--target_spacing", "1.0", "1.0", "1.2",
            "--batch_size", "2",
            "--max_epochs", "1",
            "--n_folds", "1",
            "--dev", "cpu",
            "--checkpoint_dir", ckpt,
            "--cache_rate", "0.0",
        ]
    )
    meta = json.load(
        open(os.path.join(ckpt, "deconfounder_fold0", "metadata.json"))
    )
    assert meta["cat_confounder_cards"] == [2]

    metric_path = os.path.join(root, "deconf_metrics.csv")
    adell_main(
        [
            "classification_deconfounder", "test",
            "--dataset_json", ds_path,
            "--checkpoint_dir", ckpt,
            "--metric_path", metric_path,
            "--dev", "cpu",
        ]
    )
    assert os.path.exists(metric_path)

    out_path = os.path.join(root, "deconf_preds.json")
    adell_main(
        [
            "classification_deconfounder", "predict",
            "--dataset_json", ds_path,
            "--checkpoint_dir", ckpt,
            "--output_path", out_path,
            "--precision", "bf16",
            "--dev", "cpu",
        ]
    )
    preds = json.load(open(out_path))
    assert len(preds) == 4
    for v in preds.values():
        # surrogate predictions ride along by default
        assert 0.0 <= v["prediction"] <= 1.0
        assert v["cat_surrogates"][0] in (0, 1)
        assert len(v["cont_surrogates"]) == 1

    out2 = os.path.join(root, "deconf_preds_excl.json")
    adell_main(
        [
            "classification_deconfounder", "predict",
            "--dataset_json", ds_path,
            "--checkpoint_dir", ckpt,
            "--output_path", out2,
            "--exclude_surrogate_variables",
            "--dev", "cpu",
        ]
    )
    preds2 = json.load(open(out2))
    assert all(0.0 <= p <= 1.0 for p in preds2.values())


DET_YAML = """
backbone_structure: [[4, 8, 3, 1]]
anchors: [[6.0, 6.0, 3.0]]
batch_size: 2
learning_rate: 0.001
"""


def test_detection_train_then_predict_sequence_paths(cohort, tmp_path):
    """detection train -> predict, including --sequence_paths single-case
    prediction without a dataset JSON (VERDICT r2 item 5)."""
    root = cohort["root"]
    ds = json.load(open(cohort["ds"]))
    for k in ds:
        ds[k]["boxes"] = [[4, 4, 2, 10, 10, 6]]
        ds[k]["box_classes"] = [0]
    ds_path = os.path.join(root, "ds_det.json")
    json.dump(ds, open(ds_path, "w"))
    cfg_path = os.path.join(root, "det.yaml")
    open(cfg_path, "w").write(DET_YAML)
    ckpt = os.path.join(root, "ckpt_det")
    adell_main(
        [
            "detection", "train",
            "--dataset_json", ds_path,
            "--image_keys", "T2",
            "--box_key", "boxes",
            "--box_class_key", "box_classes",
            "--config_file", cfg_path,
            "--pad_size", "16", "16", "8",
            "--target_spacing", "1.0", "1.0", "1.2",
            "--batch_size", "2",
            "--max_epochs", "1",
            "--n_folds", "1",
            "--dev", "cpu",
            "--checkpoint_dir", ckpt,
            "--cache_rate", "0.0",
        ]
    )
    out_path = os.path.join(root, "det_preds.json")
    adell_main(
        [
            "detection", "predict",
            "--sequence_paths", ds["case_0"]["T2"],
            "--image_keys", "T2",
            "--checkpoint_dir", ckpt,
            "--output_path", out_path,
            "--dev", "cpu",
        ]
    )
    preds = json.load(open(out_path))
    assert list(preds) == ["case"]
    assert "boxes" in preds["case"] and "scores" in preds["case"]


def test_segmentation_train_long_tail_flags(cohort, tmp_path):
    """--samples_per_epoch/--subsample_training_data/--sliding_window_val/
    --delete_checkpoints all execute and do what they say (VERDICT r2
    item 5)."""
    ckpt = os.path.join(str(tmp_path), "ckpt_lt")
    adell_main(
        [
            "segmentation", "train",
            "--dataset_json", cohort["ds"],
            "--image_keys", "T2",
            "--mask_keys", "mask",
            "--config_file", cohort["cfg"],
            "--pad_size", "16", "16", "8",
            "--crop_size", "16", "16", "8",
            "--random_crop_size", "8", "8", "8",
            "--target_spacing", "1.0", "1.0", "1.2",
            "--batch_size", "2",
            "--max_epochs", "1",
            "--n_folds", "1",
            "--dev", "cpu",
            "--checkpoint_dir", ckpt,
            "--cache_rate", "0.0",
            "--samples_per_epoch", "6",
            "--subsample_training_data", "0.99",
            "--excluded_ids_from_training_data", "case_3",
            "--validation_samples_per_epoch", "2",
            "--sliding_window_val",
            "--delete_checkpoints",
        ]
    )
    run_dir = os.path.join(ckpt, "segmentation_fold0")
    # metadata survives, weight step dirs are gone
    assert os.path.exists(os.path.join(run_dir, "metadata.json"))
    steps = [d for d in os.listdir(run_dir) if d.isdigit()]
    assert steps == []


def test_mil_frozen_encoder_workflow(cohort, tmp_path):
    """--module_paths + --freeze_module reproduces the reference's
    frozen-slice-encoder MIL workflow: the encoder subtree warm-starts
    from a prior MIL checkpoint and receives ZERO updates."""
    import numpy as _np

    root = cohort["root"]
    ds_path = os.path.join(root, "ds_mil.json")  # written by the MIL test
    if not os.path.exists(ds_path):
        ds = json.load(open(cohort["ds"]))
        for i, k in enumerate(sorted(ds)):
            ds[k]["label"] = i % 2
        json.dump(ds, open(ds_path, "w"))
    cfg_path = os.path.join(root, "mil.yaml")
    if not os.path.exists(cfg_path):
        open(cfg_path, "w").write(MIL_YAML)
    src_ckpt = os.path.join(root, "ckpt_mil")
    if not os.path.exists(os.path.join(src_ckpt, "mil_fold0")):
        pytest.skip("MIL round-trip test must run first in this module")

    ckpt = str(tmp_path / "ckpt_frozen")
    adell_main(
        [
            "classification_mil", "train",
            "--dataset_json", ds_path,
            "--image_keys", "T2",
            "--label_keys", "label",
            "--config_file", cfg_path,
            "--pad_size", "16", "16", "8",
            "--target_spacing", "1.0", "1.0", "1.2",
            "--batch_size", "2",
            "--max_epochs", "2",
            "--n_folds", "1",
            "--dev", "cpu",
            "--checkpoint_dir", ckpt,
            "--cache_rate", "0.0",
            "--module_paths", os.path.join(src_ckpt, "mil"),
            "--freeze_module",
        ]
    )
    from adell_mri_tpu.train.checkpoints import CheckpointManager

    src = CheckpointManager(src_ckpt, name="mil", fold=0)
    dst = CheckpointManager(ckpt, name="mil", fold=0)
    sp = src.restore(src.best_step())["params"]["module"]
    dp = dst.restore(dst.best_step())["params"]["module"]
    import jax

    for a, b in zip(jax.tree.leaves(sp), jax.tree.leaves(dp)):
        _np.testing.assert_array_equal(_np.asarray(a), _np.asarray(b))


ENS_YAML_A = """
resnet_structure: [[4, 8, 3, 1]]
norm_type: instance
batch_size: 2
learning_rate: 0.001
"""

ENS_YAML_B = """
resnet_structure: [[4, 4, 3, 1]]
norm_type: instance
batch_size: 2
learning_rate: 0.001
"""


def test_ensemble_train_test_predict_roundtrip(cohort):
    """classification_ensemble {train,test,predict} round-trip: members are
    rebuilt from checkpoint-metadata member_configs; predict additionally
    exercises --precision bf16 on the averaged forward."""
    root = cohort["root"]
    ds = json.load(open(cohort["ds"]))
    for i, k in enumerate(sorted(ds)):
        ds[k]["label"] = i % 2
    ds_path = os.path.join(root, "ds_ens.json")
    with open(ds_path, "w") as f:
        json.dump(ds, f)
    cfg_a = os.path.join(root, "ens_a.yaml")
    cfg_b = os.path.join(root, "ens_b.yaml")
    with open(cfg_a, "w") as f:
        f.write(ENS_YAML_A)
    with open(cfg_b, "w") as f:
        f.write(ENS_YAML_B)
    ckpt = os.path.join(root, "ckpt_ens")
    adell_main(
        [
            "classification_ensemble", "train",
            "--dataset_json", ds_path,
            "--image_keys", "T2",
            "--label_keys", "label",
            "--config_files", cfg_a, cfg_b,
            "--classification_net_type", "cat",
            "--pad_size", "16", "16", "8",
            "--target_spacing", "1.0", "1.0", "1.2",
            "--batch_size", "2",
            "--max_epochs", "1",
            "--n_folds", "1",
            "--dev", "cpu",
            "--checkpoint_dir", ckpt,
            "--cache_rate", "0.0",
        ]
    )
    meta = json.load(
        open(os.path.join(ckpt, "ensemble_fold0", "metadata.json"))
    )
    assert len(meta["member_configs"]) == 2

    metric_path = os.path.join(root, "ens_metrics.csv")
    adell_main(
        [
            "classification_ensemble", "test",
            "--dataset_json", ds_path,
            "--checkpoint_dir", ckpt,
            "--metric_path", metric_path,
            "--dev", "cpu",
        ]
    )
    assert os.path.exists(metric_path)

    out_path = os.path.join(root, "ens_preds.json")
    adell_main(
        [
            "classification_ensemble", "predict",
            "--dataset_json", ds_path,
            "--checkpoint_dir", ckpt,
            "--output_path", out_path,
            "--precision", "bf16",
            "--dev", "cpu",
        ]
    )
    preds = json.load(open(out_path))
    assert len(preds) == 4
    assert all(0.0 <= p <= 1.0 for p in preds.values())


UNET2D_YAML = """
spatial_dimensions: 2
depth: [4, 8]
kernel_sizes: [3, 3]
strides: [2, 2]
loss_fn:
  dice: {}
"""


def test_segmentation_2d_train_test_predict(cohort):
    """2D networks train on mask-weighted random slices folded into the
    batch and serve slice-wise over 3D volumes (parity: the reference's
    spatial_dimensions==2 branch — RandomSlices + collate_last_slice,
    entrypoints/segmentation/train.py:390-398, test.py:211, predict.py:209)."""
    cfg2d = os.path.join(cohort["root"], "unet2d.yaml")
    with open(cfg2d, "w") as f:
        f.write(UNET2D_YAML)
    ckpt = os.path.join(cohort["root"], "ckpt2d")
    adell_main(
        [
            "segmentation", "train",
            "--dataset_json", cohort["ds"],
            "--image_keys", "T2",
            "--mask_keys", "mask",
            "--config_file", cfg2d,
            "--pad_size", "16", "16", "8",
            "--target_spacing", "1.0", "1.0", "1.2",
            "--batch_size", "2",
            "--max_epochs", "1",
            "--n_folds", "1",
            "--dev", "cpu",
            "--checkpoint_dir", ckpt,
            "--cache_rate", "0.0",
        ]
    )
    adell_main(
        [
            "segmentation", "test",
            "--dataset_json", cohort["ds"],
            "--checkpoint_dir", ckpt,
            "--dev", "cpu",
            "--metric_path", os.path.join(cohort["root"], "m2d.csv"),
        ]
    )
    preds = os.path.join(cohort["root"], "preds2d")
    adell_main(
        [
            "segmentation", "predict",
            "--dataset_json", cohort["ds"],
            "--checkpoint_dir", ckpt,
            "--output_path", preds,
            "--dev", "cpu",
        ]
    )
    out = [f for f in os.listdir(preds) if f.endswith(".nii.gz")]
    assert len(out) == 4
    from adell_mri_tpu.data.nifti import read_nifti

    vol = read_nifti(os.path.join(preds, out[0])).data
    assert vol.shape == (16, 16, 8)
    assert np.isfinite(vol).all()


def test_predict_sharded_sliding_window_matches_single_device(cohort):
    """VERDICT r3 item 7 (serving-path scale proof): the CLI predict
    with --sliding_window_size on a multi-device mesh must engage the
    sharded tile path (predict.py sw_mesh) and write the same volumes as
    the single-device CLI. Both runs go through subprocesses so the
    device count is set per run (8 vs 1 virtual CPU devices)."""
    import subprocess
    import sys

    ckpt = os.path.join(cohort["root"], "ckpt_sw")
    adell_main(
        [
            "segmentation", "train",
            "--dataset_json", cohort["ds"],
            "--image_keys", "T2",
            "--mask_keys", "mask",
            "--config_file", cohort["cfg"],
            "--pad_size", "16", "16", "8",
            "--crop_size", "16", "16", "8",
            "--target_spacing", "1.0", "1.0", "1.2",
            "--batch_size", "2",
            "--max_epochs", "1",
            "--n_folds", "1",
            "--dev", "cpu",
            "--checkpoint_dir", ckpt,
            "--cache_rate", "0.0",
        ]
    )

    def run_predict(n_devices, outdir):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={n_devices}"
        )
        env["PYTHONPATH"] = os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        )
        res = subprocess.run(
            [
                sys.executable, "-m", "adell_mri_tpu",
                "segmentation", "predict",
                "--dataset_json", cohort["ds"],
                "--image_keys", "T2",
                "--checkpoint_dir", ckpt,
                "--output_path", outdir,
                "--sliding_window_size", "8", "8", "4",
                "--sliding_window_stride", "0.5",
                "--dev", "cpu",
            ],
            capture_output=True,
            text=True,
            env=env,
            timeout=900,
        )
        assert res.returncode == 0, res.stderr[-3000:]
        return res.stderr

    out8 = os.path.join(cohort["root"], "pred_sw8")
    out1 = os.path.join(cohort["root"], "pred_sw1")
    log8 = run_predict(8, out8)
    run_predict(1, out1)
    # the sharded tile path must actually have engaged on the 8-dev run
    assert "sliding-window tiles sharded over 8 devices" in log8

    from adell_mri_tpu.data.nifti import read_nifti

    compared = 0
    for fn in sorted(os.listdir(out1)):
        if not fn.endswith(".nii.gz"):
            continue
        a = read_nifti(os.path.join(out1, fn))
        b = read_nifti(os.path.join(out8, fn))
        np.testing.assert_allclose(
            np.asarray(b.data), np.asarray(a.data), atol=1e-5, rtol=1e-5
        )
        compared += 1
    assert compared >= 4
