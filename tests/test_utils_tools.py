"""
Every ``adell utils`` tool executes against a synthetic cohort and its
output artifact is asserted (VERDICT r2 item 8 — the 25-tool surface ran
on faith before; ref: adell_mri/entrypoints/utils/).
"""

import json
import os

import numpy as np
import pytest

from adell_mri_tpu.__main__ import main as adell_main
from adell_mri_tpu.data.nifti import read_nifti, write_nifti


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    root = tmp_path_factory.mktemp("utiltools")
    rng = np.random.default_rng(0)
    aff = np.diag([1.0, 1.0, 1.2, 1.0])
    ds = {}
    for i in range(4):
        case_dir = root / f"case_{i}"
        case_dir.mkdir()
        img = rng.normal(500, 100, size=(16, 16, 8)).astype(np.float32)
        mask = np.zeros((16, 16, 8), np.float32)
        if i < 3:  # case_3 has a constant (empty) mask
            mask[4:9, 4:9, 2:5] = 1
        mask2 = np.zeros_like(mask)
        mask2[5:10, 5:10, 2:5] = 1
        ip, mp, mp2 = (
            str(case_dir / "t2.nii.gz"),
            str(case_dir / "mask.nii.gz"),
            str(case_dir / "mask2.nii.gz"),
        )
        write_nifti(ip, img, aff)
        write_nifti(mp, mask, aff)
        write_nifti(mp2, mask2, aff)
        ds[f"case_{i}"] = {
            "image": ip,
            "mask": mp,
            "mask2": mp2,
            "date": f"2020-0{i + 1}-01",
            "grade": i % 2,
            "boxes": [[2, 2, 1, 8, 7, 4], [9, 9, 4, 14, 13, 7]],
        }
    ds_path = str(root / "ds.json")
    json.dump(ds, open(ds_path, "w"))
    return {"root": str(root), "ds": ds_path, "data": ds}


def _last_json(capsys):
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_generate_dataset_json(cohort, tmp_path):
    out = str(tmp_path / "gen.json")
    adell_main(
        [
            "utils", "generate_dataset_json",
            "--input_paths", f"image:{cohort['root']}/case_*/t2.nii.gz",
            f"mask:{cohort['root']}/case_*/mask.nii.gz",
            "--output_json", out,
        ]
    )
    gen = json.load(open(out))
    assert len(gen) == 4 and all("image" in v and "mask" in v for v in gen.values())


def test_generate_image_dataset_json(cohort, tmp_path):
    out = str(tmp_path / "img.json")
    adell_main(
        [
            "utils", "generate_image_dataset_json",
            "--input_path", os.path.join(cohort["root"], "case_0"),
            "--pattern", "t2.nii.gz",
            "--output_json", out,
        ]
    )
    assert len(json.load(open(out))) == 1


def test_generate_json_from_csv(tmp_path):
    csv = tmp_path / "tab.csv"
    csv.write_text("pid,grade\np1,2\np2,3\n")
    out = str(tmp_path / "fromcsv.json")
    adell_main(
        [
            "utils", "generate_json_from_csv",
            "--input_csv", str(csv), "--id_column", "pid",
            "--output_json", out,
        ]
    )
    assert json.load(open(out))["p1"]["grade"] == 2


def test_merge_json_datasets(cohort, tmp_path):
    extra = tmp_path / "extra.json"
    json.dump({"case_0": {"psa": 4.2}}, open(extra, "w"))
    out = str(tmp_path / "merged.json")
    adell_main(
        [
            "utils", "merge_json_datasets",
            "--input_jsons", cohort["ds"], str(extra),
            "--output_json", out,
        ]
    )
    merged = json.load(open(out))
    assert merged["case_0"]["psa"] == 4.2 and "image" in merged["case_0"]


def test_fill_with_condition(cohort, tmp_path):
    out = str(tmp_path / "filled.json")
    adell_main(
        [
            "utils", "fill_with_condition",
            "--input_json", cohort["ds"],
            "--filters", "cohort:A^grade:0",
            "--output_json", out,
        ]
    )
    filled = json.load(open(out))
    assert filled["case_0"]["cohort"] == "A"
    assert "cohort" not in filled["case_1"]


def test_get_test_set_and_folds(cohort, tmp_path):
    prefix = str(tmp_path / "split")
    adell_main(
        [
            "utils", "get_test_set_and_folds",
            "--input_json", cohort["ds"],
            "--test_fraction", "0.25", "--n_folds", "3",
            "--output_prefix", prefix,
        ]
    )
    test_ids = open(prefix + "_test.txt").read().split()
    fold_ids = [
        open(f"{prefix}_fold{i}.txt").read().split() for i in range(3)
    ]
    assert len(test_ids) == 1
    assert sorted(test_ids + sum(fold_ids, [])) == sorted(cohort["data"])


def test_remove_constant_masks(cohort, tmp_path):
    out = str(tmp_path / "nonconst.json")
    adell_main(
        [
            "utils", "remove_constant_masks",
            "--input_json", cohort["ds"], "--mask_key", "mask",
            "--output_json", out,
        ]
    )
    kept = json.load(open(out))
    assert sorted(kept) == ["case_0", "case_1", "case_2"]


def test_get_mask_coordinates(cohort, tmp_path):
    out = str(tmp_path / "coords.json")
    adell_main(
        [
            "utils", "get_mask_coordinates",
            "--input_json", cohort["ds"], "--mask_key", "mask",
            "--output_json", out,
        ]
    )
    coords = json.load(open(out))
    assert coords["case_0"] == [4, 4, 2, 9, 9, 5]
    assert coords["case_3"] is None


def test_get_label_size(cohort, capsys):
    adell_main(
        ["utils", "get_label_size", "--input_json", cohort["ds"],
         "--mask_key", "mask"]
    )
    lines = capsys.readouterr().out.strip().splitlines()
    pid, vox, vol = lines[0].split(",")
    assert pid == "case_0" and int(vox) == 5 * 5 * 3
    assert float(vol) == pytest.approx(75 * 1.2, rel=1e-3)


def test_compare_masks(cohort, capsys):
    adell_main(
        ["utils", "compare_masks", "--input_json", cohort["ds"],
         "--mask_keys", "mask", "mask2"]
    )
    line = capsys.readouterr().out.strip().splitlines()[0]
    pid, dice, iou = line.split(",")
    assert pid == "case_0" and 0.0 < float(dice) < 1.0


def test_match_to_mask(cohort, capsys):
    adell_main(
        ["utils", "match_to_mask", "--input_json", cohort["ds"],
         "--image_key", "image", "--mask_key", "mask"]
    )
    out = capsys.readouterr().out
    assert "case_0,match" in out and "MISMATCH" not in out


def test_resample_image(cohort, tmp_path):
    out = str(tmp_path / "res.nii.gz")
    adell_main(
        [
            "utils", "resample_image",
            "--input_path", cohort["data"]["case_0"]["image"],
            "--output_path", out, "--spacing", "2.0", "2.0", "1.2",
        ]
    )
    res = read_nifti(out)
    assert res.data.shape[:3] == (8, 8, 8)


def test_resample_volumes_and_masks(cohort, tmp_path):
    out_json = str(tmp_path / "res.json")
    adell_main(
        [
            "utils", "resample_volumes_and_masks",
            "--input_json", cohort["ds"],
            "--image_keys", "image", "--mask_keys", "mask",
            "--spacing", "2.0", "2.0", "2.4",
            "--output_dir", str(tmp_path / "resampled"),
            "--output_json", out_json,
        ]
    )
    res = json.load(open(out_json))
    img = read_nifti(res["case_0"]["image"])
    assert img.data.shape[:3] == (8, 8, 4)
    mask = read_nifti(res["case_0"]["mask"]).data
    assert set(np.unique(mask)) <= {0.0, 1.0}  # nearest for masks


def test_merge_masks(cohort, tmp_path):
    out = str(tmp_path / "merged.nii.gz")
    adell_main(
        [
            "utils", "merge_masks",
            "--input_paths", cohort["data"]["case_0"]["mask"],
            cohort["data"]["case_0"]["mask2"],
            "--output_path", out, "--mode", "max",
        ]
    )
    merged = read_nifti(out).data
    a = read_nifti(cohort["data"]["case_0"]["mask"]).data
    b = read_nifti(cohort["data"]["case_0"]["mask2"]).data
    np.testing.assert_array_equal(merged, np.maximum(a, b))


def test_bias_field_correction(cohort, tmp_path):
    out = str(tmp_path / "n4.nii.gz")
    adell_main(
        [
            "utils", "bias_field_correction",
            "--input_path", cohort["data"]["case_0"]["image"],
            "--output_path", out,
        ]
    )
    corrected = read_nifti(out).data
    assert corrected.shape == (16, 16, 8)
    assert np.all(np.isfinite(corrected)) and corrected.min() > 0


def test_describe_image(cohort, capsys):
    adell_main(
        ["utils", "describe_image", "--input_paths",
         cohort["data"]["case_0"]["image"]]
    )
    desc = _last_json(capsys)
    assert desc["shape"][:3] == [16, 16, 8]
    assert desc["spacing"] == [1.0, 1.0, 1.2]
    # reference describe_sitk field set (utils/dataset/describe_sitk.py):
    # geometry + components + pixel type + unique-value summary
    assert len(desc["origin"]) == 3 and len(desc["direction"]) == 9
    assert desc["n_components"] == 1
    assert "n_unique_values" in desc or "unique_values" in desc

    # reference-name alias with the reference's --paths spelling
    adell_main(
        ["utils", "describe_sitk", "--paths",
         cohort["data"]["case_0"]["image"]]
    )
    desc2 = _last_json(capsys)
    assert desc2["shape"] == desc["shape"]


def test_bb_to_anchors(cohort, tmp_path):
    out = str(tmp_path / "anchors.csv")
    adell_main(
        [
            "utils", "bb_to_anchors",
            "--input_json", cohort["ds"], "--n_anchors", "2",
            "--output_csv", out,
        ]
    )
    rows = [r.split(",") for r in open(out).read().strip().splitlines()]
    assert len(rows) == 2 and all(len(r) == 3 for r in rows)


def test_bb_to_distances(cohort, tmp_path, capsys):
    csv = tmp_path / "boxes.csv"
    lines = []
    for pid, entry in cohort["data"].items():
        for box in entry["boxes"]:
            lines.append(
                ",".join([pid] + [str(v) for v in box] + ["16", "16", "8", "0"])
            )
    csv.write_text("\n".join(lines))
    adell_main(
        ["utils", "bb_to_distances", "--input_path", str(csv),
         "--spatial_dim", "3"]
    )
    stats = _last_json(capsys)
    assert stats["n_images_with_multiple_boxes"] == 4
    assert stats["min"] > 0


@pytest.fixture(scope="module")
def dicom_tree(tmp_path_factory):
    from adell_mri_tpu.data.dicom import write_dicom

    root = tmp_path_factory.mktemp("dicomtree")
    rng = np.random.default_rng(1)
    for study in ("study_a", "study_b"):
        series_dir = root / study / "series_1"
        series_dir.mkdir(parents=True)
        for z in range(3):
            write_dicom(
                str(series_dir / f"slice_{z}.dcm"),
                rng.normal(100, 20, (12, 12)),
                series_uid=f"1.2.{study[-1]}",
                position=[0.0, 0.0, float(z)],
            )
    return str(root)


def test_generate_and_describe_dicom_dataset(dicom_tree, tmp_path, capsys):
    out = str(tmp_path / "dicom.json")
    adell_main(
        ["utils", "generate_dicom_dataset_json", "--input_dir", dicom_tree,
         "--output_json", out]
    )
    data = json.load(open(out))
    assert len(data) == 2
    capsys.readouterr()
    adell_main(["utils", "describe_dicom_dataset", "--json_path", out])
    desc = _last_json(capsys)
    assert desc["n_studies"] == 2 and desc["n_slices"] == 6
    capsys.readouterr()
    # inspect: clean data -> no NaN/Inf lines printed
    adell_main(["utils", "inspect_dicom_dataset", "--json_path", out])
    assert capsys.readouterr().out.strip() == ""


def test_get_image_examples(cohort, tmp_path):
    out_dir = str(tmp_path / "examples")
    adell_main(
        [
            "utils", "get_image_examples",
            "--dataset_json", cohort["ds"], "--image_keys", "image",
            "--output_dir", out_dir, "--n_examples", "2",
        ]
    )
    pngs = [
        f
        for case in os.listdir(out_dir)
        for f in os.listdir(os.path.join(out_dir, case))
    ]
    assert len(pngs) == 2 * 8  # 2 cases x 8 slices


def test_get_temporal_test_set_and_folds(cohort, capsys):
    adell_main(
        [
            "utils", "get_temporal_test_set_and_folds",
            "--dataset_json", cohort["ds"], "--date_key", "date",
            "--n_folds", "2", "--fraction_test", "0.25",
        ]
    )
    lines = capsys.readouterr().out.strip().splitlines()
    test_line = [li for li in lines if li.startswith("test,")][0]
    # prospective split: the LATEST case goes to test
    assert test_line.split(",")[1:] == ["case_3"]
    assert sum(li.startswith("cv") for li in lines) == 2


def test_random_image_panel(cohort, tmp_path):
    out = str(tmp_path / "panel.png")
    adell_main(
        [
            "utils", "random_image_panel",
            "--dataset_json", cohort["ds"], "--image_key", "image",
            "--output_path", out, "--n_images", "4",
        ]
    )
    from PIL import Image

    panel = np.asarray(Image.open(out))
    assert panel.shape == (32, 32)  # 2x2 tiles of 16x16


def test_test_exported_model(tmp_path, capsys):
    import flax.linen as nn
    import jax

    from adell_mri_tpu.train.export import export_model

    model = nn.Dense(3)
    x0 = np.zeros((1, 5), np.float32)
    params = model.init(jax.random.PRNGKey(0), x0)["params"]
    path = str(tmp_path / "model.hlo")
    export_model(
        lambda p, x: model.apply({"params": p}, x), params, (1, 5), path
    )
    adell_main(
        ["utils", "test_exported_model", "--model_path", path,
         "--batch_size", "1"]
    )
    out = _last_json(capsys)
    assert out["output_shapes"] == [[1, 3]]


def test_flatten_dataset_json(cohort, capsys):
    adell_main(
        [
            "utils", "flatten_dataset_json",
            "--input_json", cohort["ds"],
            "--image_keys", "image", "mask",
        ]
    )
    out = json.loads(capsys.readouterr().out)
    assert "case_0_image" in out and "case_0_mask" in out
    assert out["case_0_image"]["image"] == cohort["data"]["case_0"]["image"]
    assert len(out) == 8


def test_get_segmentation_label_composition(cohort, capsys):
    adell_main(
        [
            "utils", "get_segmentation_label_composition",
            "--input_path", os.path.join(cohort["root"], "case_0"),
            "--pattern", "mask*.nii.gz",
        ]
    )
    rows = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
    ]
    labels = {r["label"]: r for r in rows}
    assert set(labels) == {0.0, 1.0}
    assert labels[1.0]["n_images"] == 2
    # both scanned masks contain both labels
    assert labels[1.0]["image_fraction"] == 1.0
    assert labels[0.0]["image_fraction"] == 1.0
    assert abs(sum(r["voxel_fraction"] for r in rows) - 1.0) < 1e-9
