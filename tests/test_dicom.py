"""DICOM layer: codec roundtrip, nested dataset indexing, slice sampler."""

import os

import numpy as np

from adell_mri_tpu.data.dicom import (
    DICOMDataset,
    SliceSampler,
    filter_dicom_dict_on_presence,
    filter_orientations,
    generate_dicom_dataset_json,
    read_dicom,
    write_dicom,
)


def _make_tree(tmp_path, n_studies=2, n_series=2, n_slices=3):
    rng = np.random.default_rng(0)
    ds = []
    for s in range(n_studies):
        study = {}
        for se in range(n_series):
            uid = f"series_{se}"
            sedir = tmp_path / f"study_{s}" / uid
            os.makedirs(sedir, exist_ok=True)
            entries = []
            for i in range(n_slices):
                arr = rng.normal(size=(16, 16)).astype(np.float32)
                path = str(sedir / f"slice_{i}.dcm")
                write_dicom(
                    path,
                    arr,
                    series_uid=uid,
                    orientation=[1, 0, 0, 0, 1, 0],
                    position=[0.0, 0.0, float(i)],
                )
                entries.append(
                    {"image": path, "orientation": [1, 0, 0, 0, 1, 0]}
                )
            study[uid] = entries
        ds.append(study)
    return ds


def test_codec_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.normal(size=(24, 20)).astype(np.float32) * 100
    path = str(tmp_path / "x.dcm")
    write_dicom(path, arr, orientation=[1, 0, 0, 0, 0, -1])
    back, meta = read_dicom(path)
    assert back.shape == arr.shape
    # 16-bit quantization over the intensity span
    span = arr.max() - arr.min()
    assert np.abs(back - arr).max() < span / 65535 * 2
    assert meta["orientation"] == [1, 0, 0, 0, 0, -1]
    assert meta["series_uid"] == "1.2.3"


def test_dataset_indexing_and_sampler(tmp_path):
    ds = _make_tree(tmp_path)
    data = DICOMDataset(ds)
    assert len(data) == 2 * 2 * 3
    sample = data[0]
    assert sample["image"].shape == (16, 16)
    assert sample["image"].dtype == np.float32
    # nested tuple indexing
    s2 = data[(1, "series_1", 2)]
    assert s2["image_path"].endswith("slice_2.dcm")

    sampler = SliceSampler(ds, n_iterations=2, seed=0)
    idxs = list(sampler)
    # one sample per (study, series) per iteration
    assert len(idxs) == 2 * 2 * 2
    assert all(0 <= i < len(data) for i in idxs)

    limited = SliceSampler(ds, n_iterations=2, n_samples=3, seed=0)
    assert len(list(limited)) == 3


def test_filters_and_walk(tmp_path):
    ds = _make_tree(tmp_path, n_studies=1)
    flat = {"case": {"s1": [
        {"image": "a.dcm", "orientation": [1, 0, 0, 0, 0, -1]},
        {"image": "b.dcm", "orientation": None},
        {"image": "c.png"},
    ]}}
    out = filter_orientations(flat)
    assert len(out["case"]["s1"]) == 2  # None-orientation dcm dropped
    out = filter_orientations(flat, keep_bad=False)
    assert len(out["case"]["s1"]) == 1  # [0,0,-1] dropped too

    kept = filter_dicom_dict_on_presence(ds, ["image", "orientation"])
    assert len(kept) == 1
    assert filter_dicom_dict_on_presence(ds, ["missing"]) == []

    walked = generate_dicom_dataset_json(str(tmp_path))
    assert len(walked) == 1
    assert sorted(walked[0]) == ["series_0", "series_1"]
    assert len(walked[0]["series_0"]) == 3
