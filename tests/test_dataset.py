"""Data layer tests (dataset JSON, filters, samplers, collate)."""

import json
import os

import numpy as np
import pytest

from adell_mri_tpu.data import (
    Dataset,
    PartiallyRandomSampler,
    WeightedSampler,
    collate_last_slice,
    filter_dictionary,
    safe_collate,
    safe_collate_crops,
)


@pytest.fixture
def dataset_json(tmp_path):
    data = {
        f"id{i}": {
            "image": f"/data/{i}.nii.gz",
            "label": i % 2,
            "age": 40 + i,
        }
        for i in range(20)
    }
    # a few incomplete entries
    data["broken1"] = {"label": 0}
    data["broken2"] = {"image": "/data/x.nii.gz"}
    path = tmp_path / "ds.json"
    path.write_text(json.dumps(data))
    return str(path)


def test_dataset_load_and_filter(dataset_json):
    ds = Dataset(dataset_json)
    assert len(ds) == 22
    ds.apply_filters(presence_keys=["image", "label"])
    assert len(ds) == 20
    ds.apply_filters(filter_on_keys=["age>45"])
    assert all(ds[k]["age"] > 45 for k in ds)


def test_dataset_possible_labels(dataset_json):
    ds = Dataset(dataset_json)
    ds.apply_filters(
        presence_keys=["image", "label"],
        possible_labels=["1"],
        label_keys="label",
    )
    assert len(ds) == 10
    assert all(str(ds[k]["label"]) == "1" for k in ds)


def test_dataset_subsample_stratified(dataset_json):
    ds = Dataset(dataset_json)
    ds.apply_filters(presence_keys=["image", "label"])
    ds.subsample_dataset(subsample_size=10, strata_key="label")
    labels = [ds[k]["label"] for k in ds]
    assert len(ds) == 10
    assert sum(1 for x in labels if x == 1) == 5


def test_dataset_to_datalist(dataset_json):
    ds = Dataset(dataset_json)
    dl = ds.to_datalist()
    assert len(dl) == 22
    assert all("identifier" in d for d in dl)


def test_filter_grammar():
    D = {
        "a": {"x": 1, "tags": ["t1", "t2"]},
        "b": {"x": 5, "tags": ["t3"]},
        "c": {"x": 10},
    }
    assert set(filter_dictionary(D, filters=["x>2"])) == {"b", "c"}
    assert set(filter_dictionary(D, filters=["x<2"])) == {"a"}
    assert set(filter_dictionary(D, filters=["x!=5"])) == {"a", "c"}
    assert set(filter_dictionary(D, filters=["tags=t1"])) == {"a"}
    assert set(filter_dictionary(D, filters=["x(in)1,5"])) == {"a", "b"}
    assert set(
        filter_dictionary(D, filters=["tags(match)t3"], filter_is_optional=True)
    ) == {"b", "c"}


def test_partially_random_sampler():
    classes = [1] * 5 + [0] * 15
    s = PartiallyRandomSampler(classes, keep_classes=[1], non_keep_ratio=0.2)
    idx = list(s)
    assert len(idx) == 5 + 3
    assert set(range(5)).issubset(set(idx))
    # different epochs differ
    assert list(s) != list(s) or len(set(map(tuple, [list(s) for _ in range(4)]))) >= 1


def test_weighted_sampler_bias():
    w = [10.0] * 5 + [0.01] * 50
    s = WeightedSampler(w, n_samples=200, seed=0)
    idx = np.asarray(list(s))
    assert (idx < 5).mean() > 0.8


def test_safe_collate_drops_none():
    b = [
        {"x": np.zeros((2, 4)), "y": 1, "identifier": "a"},
        None,
        {"x": np.ones((2, 4)), "y": 0, "identifier": "b"},
    ]
    out = safe_collate(b)
    assert out["x"].shape == (2, 2, 4)
    assert out["y"].tolist() == [1, 0]
    assert out["identifier"] == ["a", "b"]


def test_safe_collate_crops():
    sample = lambda v: [{"x": np.full((1, 4), v)}, {"x": np.full((1, 4), v + 10)}]
    out = safe_collate_crops([sample(0), sample(1)])
    assert out["x"].shape == (4, 1, 4)


def test_collate_last_slice():
    # channels-last [H, W, S, C]: the SLICE axis (-2) folds into the batch,
    # channels stay last
    b = [{"x": np.zeros((8, 8, 3, 2))}, {"x": np.ones((8, 8, 3, 2))}]
    out = collate_last_slice(b)
    assert out["x"].shape == (6, 8, 8, 2)
    assert out["x"][:3].sum() == 0 and (out["x"][3:] == 1).all()


def test_collate_last_slice_channelless_label():
    """Regression: a channel-less [H, W, S] label (what make_load_fn
    emits) must fold its TRUE slice axis (-1), not -2 (which is W) —
    otherwise label geometry scrambles and the batch counts of image and
    label disagree."""
    img = np.zeros((8, 6, 3, 2))
    lab = np.arange(8 * 6 * 3).reshape(8, 6, 3)
    out = collate_last_slice([{"image": img, "label": lab}])
    assert out["image"].shape == (3, 8, 6, 2)
    assert out["label"].shape == (3, 8, 6)
    np.testing.assert_array_equal(out["label"][1], lab[:, :, 1])


def test_subsample_minority_stratum_survives(tmp_path):
    """Largest-remainder stratified subsampling: a stratum below
    1/subsample_size proportion keeps at least its rounded share instead of
    being floored to zero, and the total equals subsample_size."""
    data = {f"a{i}": {"image": "x", "label": 0} for i in range(91)}
    data.update({f"b{i}": {"image": "x", "label": 1} for i in range(9)})
    p = tmp_path / "ds.json"
    p.write_text(json.dumps(data))
    ds = Dataset(str(p))
    ds.subsample_dataset(subsample_size=10, strata_key="label")
    labels = [ds[k]["label"] for k in ds]
    assert len(ds) == 10
    assert sum(1 for x in labels if x == 1) >= 1


def test_dataloader_propagates_worker_errors():
    """A collate/dataset error inside the prefetch worker surfaces in the
    consumer instead of silently truncating the epoch."""
    from adell_mri_tpu.data import DataLoader

    class Bad:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            if i == 3:
                raise ValueError("boom at 3")
            return {"x": np.zeros((2,), np.float32)}

    loader = DataLoader(Bad(), batch_size=2, prefetch=2)
    with pytest.raises(ValueError, match="boom"):
        for _ in loader:
            pass


def test_dataloader_abandoned_iteration_stops_worker():
    """break-ing out of a prefetching epoch unblocks the worker thread."""
    import threading

    from adell_mri_tpu.data import DataLoader

    class Big:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return {"x": np.zeros((4,), np.float32)}

    n_before = threading.active_count()
    for _ in range(5):
        for i, _b in enumerate(DataLoader(Big(), batch_size=2, prefetch=2)):
            if i == 1:
                break
    import time

    time.sleep(0.5)
    assert threading.active_count() <= n_before + 1


def test_async_writer_surfaces_errors(tmp_path):
    """A failing write (missing directory) no longer deadlocks close();
    the error is raised with the offending path."""
    from adell_mri_tpu.data.writer import AsyncNiftiWriter

    w = AsyncNiftiWriter(n_workers=2)
    w.put(str(tmp_path / "nope" / "x.nii.gz"), np.zeros((2, 2, 2)))
    w.put(str(tmp_path / "ok.nii.gz"), np.zeros((2, 2, 2)))
    with pytest.raises(RuntimeError, match="failed to write"):
        w.close()
    assert (tmp_path / "ok.nii.gz").exists()


def test_cache_fingerprint_separates_configs(tmp_path):
    """Different preprocessing fingerprints must not share disk-cache keys."""
    from adell_mri_tpu.data import CachedVolumeDataset

    calls = []

    def load_a(entry):
        calls.append("a")
        return {"x": np.zeros((2,), np.float32)}

    def load_b(entry):
        calls.append("b")
        return {"x": np.ones((4,), np.float32)}

    datalist = [{"id": "s0"}]
    ds_a = CachedVolumeDataset(
        datalist, load_a, cache_rate=0.0, cache_dir=str(tmp_path),
        cache_fingerprint="cfgA",
    )
    _ = ds_a[0]
    ds_b = CachedVolumeDataset(
        datalist, load_b, cache_rate=0.0, cache_dir=str(tmp_path),
        cache_fingerprint="cfgB",
    )
    out = ds_b[0]
    assert calls == ["a", "b"]  # cfgB missed cfgA's cache entry
    assert out["x"].shape == (4,)


def test_async_writer_owns_its_buffers(tmp_path):
    """put() must snapshot to an OWNED copy: a caller-reused buffer (or a
    zero-copy jax.Array view) mutated before the background write would
    corrupt the file on disk."""
    from adell_mri_tpu.data.nifti import read_nifti
    from adell_mri_tpu.data.writer import AsyncNiftiWriter

    base = np.full((4, 4, 2), 7.0, np.float32)
    view = base[:]  # non-owning view of the caller's buffer
    w = AsyncNiftiWriter(n_workers=1)
    w.put(str(tmp_path / "v.nii.gz"), view)
    base[:] = -1.0  # caller reuses the buffer immediately
    w.close()
    img = read_nifti(str(tmp_path / "v.nii.gz"))
    np.testing.assert_allclose(img.data, 7.0)


def test_loader_len_refuses_lenless_sampler():
    """len(DataLoader) with a sampler lacking __len__ raises instead of
    draining it (a one-shot generator sampler would silently yield a
    zero-batch epoch after the drain)."""
    from adell_mri_tpu.data.loader import DataLoader

    data = [{"i": np.asarray(i)} for i in range(4)]
    gen = iter(range(4))
    loader = DataLoader(data, sampler=gen, batch_size=2, prefetch=0)
    with pytest.raises(TypeError, match="__len__"):
        len(loader)
    # the sampler was NOT drained: iteration still sees all 4 indices
    seen = [int(x) for b in loader for x in np.atleast_1d(b["i"])]
    assert seen == [0, 1, 2, 3]


def test_loader_len_does_not_consume_sampler_rng():
    """Regression: __len__ used to materialize the sampler, advancing its
    RNG — epoch-1 indices depended on how many len() calls preceded it."""
    from adell_mri_tpu.data.loader import DataLoader
    from adell_mri_tpu.data.samplers import RandomSampler

    data = [{"i": np.asarray(i)} for i in range(10)]

    def run(n_len_calls):
        loader = DataLoader(
            data, sampler=RandomSampler(10, seed=0), batch_size=2, prefetch=0
        )
        for _ in range(n_len_calls):
            len(loader)
        return [b["i"].tolist() for b in loader]

    assert run(0) == run(3)


def test_disk_cache_corrupt_npz_recovers(tmp_path):
    """Regression: a truncated/corrupt cache file is a miss (recompute +
    rewrite), not a permanent crash."""
    from adell_mri_tpu.data.loader import CachedVolumeDataset

    entry = {"identifier": "a", "v": 3}
    calls = []

    def load_fn(e):
        calls.append(1)
        return {"x": np.full((4,), float(e["v"]))}

    ds = CachedVolumeDataset(
        [entry], load_fn, cache_rate=0.0, cache_dir=str(tmp_path)
    )
    s1 = ds[0]
    assert s1["x"].tolist() == [3.0] * 4 and len(calls) == 1
    path = ds._disk_path(entry)
    assert os.path.exists(path)
    with open(path, "wb") as f:
        f.write(b"not a zip file")
    ds2 = CachedVolumeDataset(
        [entry], load_fn, cache_rate=0.0, cache_dir=str(tmp_path)
    )
    s2 = ds2[0]
    assert s2["x"].tolist() == [3.0] * 4 and len(calls) == 2
    # the cache file was rewritten and is valid again
    ds3 = CachedVolumeDataset(
        [entry], load_fn, cache_rate=0.0, cache_dir=str(tmp_path)
    )
    assert ds3[0]["x"].tolist() == [3.0] * 4 and len(calls) == 2


def test_multichannel_4d_nifti_load_and_sample_channels(tmp_path):
    """4D NIfTIs keep ALL channels through make_load_fn (LoadImaged
    ensure_channel_first semantics) and sample_channels=N randomly keeps N
    of them (parity: SampleChannelDimd, utils/monai_transforms.py:2418).
    resample_to_spec's default 3D contract is unchanged (first channel)."""
    from adell_mri_tpu.data import read_nifti, reorient_to_ras, write_nifti
    from adell_mri_tpu.transforms.host import make_load_fn, resample_to_spec

    # channel c is the constant c so identities survive any resampling
    data = np.stack(
        [np.full((8, 8, 4), float(c), np.float32) for c in range(3)],
        axis=-1,
    )
    path = str(tmp_path / "dwi.nii.gz")
    write_nifti(path, data, np.eye(4))

    # default: all channels, in order
    fn = make_load_fn(image_keys=["image"], scale_intensity=False)
    s = fn({"image": path, "identifier": "a"})
    assert s["image"].shape == (8, 8, 4, 3)
    for c in range(3):
        np.testing.assert_allclose(s["image"][..., c], float(c))

    # sample_channels=2: exactly 2 distinct original channels survive
    np.random.seed(0)
    fn2 = make_load_fn(
        image_keys=["image"], scale_intensity=False, sample_channels=2
    )
    s2 = fn2({"image": path, "identifier": "a"})
    assert s2["image"].shape == (8, 8, 4, 2)
    vals = {float(s2["image"][0, 0, 0, c]) for c in range(2)}
    assert len(vals) == 2 and vals <= {0.0, 1.0, 2.0}

    # two single-channel keys still stack to 2 channels (old contract)
    path3d = str(tmp_path / "t2.nii.gz")
    write_nifti(path3d, np.full((8, 8, 4), 7.0, np.float32), np.eye(4))
    fn3 = make_load_fn(image_keys=["a", "b"], scale_intensity=False)
    s3 = fn3({"a": path3d, "b": path3d, "identifier": "a"})
    assert s3["image"].shape == (8, 8, 4, 2)

    # resample_to_spec: 3D default unchanged; keep_channels resamples all
    img = reorient_to_ras(read_nifti(path))
    v3 = resample_to_spec(img, None, (8, 8, 4))
    assert v3.shape == (8, 8, 4)
    np.testing.assert_allclose(v3, 0.0)
    v4 = resample_to_spec(img, None, (8, 8, 4), keep_channels=True)
    assert v4.shape == (8, 8, 4, 3)
    np.testing.assert_allclose(v4[..., 2], 2.0)
