"""
Reference-parity harness (VERDICT r2 item 2) — the evidence base for the
north star's "Dice/AUC within 1%" axis:

(a) interpolation-engine parity: our gather-based trilinear/nearest
    sampler vs ``torch.nn.functional.grid_sample`` (the engine under
    MONAI's spatial transforms) at identical coordinates;
(b) loss parity: our jnp loss zoo vs the REFERENCE loss file
    (/root/reference/adell_mri/modules/segmentation/losses.py) imported
    directly (it only needs torch);
(c) lesion-evaluation parity: our eval/lesion.py vs the reference's
    vendored picai_eval on identical synthetic candidate maps.

Max deviations are recorded in PARITY.md ("Numerical parity" section).
"""

import importlib
import os
import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference"


def _ref_module(name: str):
    """Imports a module file from the read-only reference WITHOUT executing
    the package __init__ chain (which imports monai/lightning, absent
    here): parent packages are installed as namespace stubs whose __path__
    points into /root/reference."""
    parts = name.split(".")
    for i in range(1, len(parts)):
        pkg = ".".join(parts[:i])
        if pkg not in sys.modules:
            mod = types.ModuleType(pkg)
            mod.__path__ = [os.path.join(REF_ROOT, *parts[:i])]
            sys.modules[pkg] = mod
    return importlib.import_module(name)


@pytest.fixture(scope="module")
def ref_losses():
    return _ref_module("adell_mri.modules.segmentation.losses")


@pytest.fixture(scope="module")
def ref_picai():
    # image_utils imports SimpleITK only for file-path loading; our
    # fixtures are in-memory arrays, so a stub suffices
    if "SimpleITK" not in sys.modules:
        sys.modules["SimpleITK"] = types.ModuleType("SimpleITK")
    mod = _ref_module("adell_mri.modules.segmentation.picai_eval.eval")
    # the reference targets an older sklearn whose precision_recall_curve
    # takes probas_pred=; shim the keyword for the installed version
    metrics_mod = sys.modules[
        "adell_mri.modules.segmentation.picai_eval.metrics"
    ]
    orig_prc = metrics_mod.precision_recall_curve

    def _prc_shim(y_true, probas_pred=None, **kw):
        return orig_prc(y_true, probas_pred, **kw)

    metrics_mod.precision_recall_curve = _prc_shim
    return mod


@pytest.fixture(scope="module")
def torch():
    import torch

    return torch


# ---------------------------------------------------------------------------
# (a) interpolation engine vs torch grid_sample
# ---------------------------------------------------------------------------


def _grid_from_coords(torch, coords, spatial):
    """Voxel coords [3, D, H, W] -> grid_sample grid [1, D, H, W, 3] in
    align_corners=True convention (grid x indexes the LAST input dim)."""
    norm = [
        2.0 * coords[d] / (spatial[d] - 1) - 1.0 for d in range(len(spatial))
    ]
    # grid_sample wants (x, y, z) = (W-idx, H-idx, D-idx) order
    grid = np.stack(norm[::-1], axis=-1)[None]
    return torch.from_numpy(grid.astype(np.float32))


@pytest.mark.parametrize("method,torch_mode", [
    ("linear", "bilinear"),
    ("nearest", "nearest"),
])
def test_sample_volume_matches_grid_sample(torch, method, torch_mode):
    from adell_mri_tpu.transforms.spatial import sample_volume

    rng = np.random.default_rng(0)
    spatial = (9, 11, 7)
    vol = rng.normal(size=spatial + (1,)).astype(np.float32)
    # in-bounds fractional coords, away from .5 ties for nearest
    coords = np.stack(
        [
            rng.uniform(0.26, s - 1.26, size=(5, 6, 4)).astype(np.float32)
            + 0.1
            for s in spatial
        ]
    )
    ours = np.asarray(sample_volume(vol, coords, method=method))[..., 0]

    t_in = torch.from_numpy(vol[None, ..., 0][None])  # [1, 1, D, H, W]
    grid = _grid_from_coords(torch, coords, spatial)
    theirs = torch.nn.functional.grid_sample(
        t_in, grid, mode=torch_mode, padding_mode="zeros", align_corners=True
    )[0, 0].numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_affine_warp_matches_grid_sample(torch):
    """warp_affine (one fused gather pass) against grid_sample evaluating
    the same homogeneous matrix."""
    from adell_mri_tpu.transforms.spatial import affine_coords, warp_affine

    rng = np.random.default_rng(1)
    spatial = (12, 10, 8)
    vol = rng.normal(size=spatial + (1,)).astype(np.float32)
    lin = np.eye(3) + rng.normal(scale=0.08, size=(3, 3))
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = lin
    m[:3, 3] = rng.normal(scale=0.5, size=3)

    ours = np.asarray(warp_affine(vol, m, method="linear"))[..., 0]

    coords = np.asarray(affine_coords(m, spatial))
    t_in = torch.from_numpy(vol[None, ..., 0][None])
    grid = _grid_from_coords(torch, coords, spatial)
    theirs = torch.nn.functional.grid_sample(
        t_in, grid, mode="bilinear", padding_mode="zeros", align_corners=True
    )[0, 0].numpy()
    # grid_sample clamps out-of-bounds corners (padding zeros applies to
    # the normalized cube), ours masks to cval outside [0, S-1]; restrict
    # the comparison to strictly in-bounds outputs
    in_b = np.ones(spatial, bool)
    for d in range(3):
        in_b &= (coords[d] >= 0) & (coords[d] <= spatial[d] - 1)
    np.testing.assert_allclose(ours[in_b], theirs[in_b], rtol=1e-4, atol=1e-4)


def test_separable_warp_matches_torch_oracle(torch):
    """The LDU-decomposed separable warp against a torch grid_sample
    one-shot resample of the same matrix: exact equality is not expected
    (shear passes re-interpolate), but the mean deviation on smooth
    volumes must stay small (BASELINE.md records ~2%)."""
    from scipy import ndimage

    from adell_mri_tpu.transforms.spatial import (
        affine_coords,
        warp_affine_separable,
    )

    rng = np.random.default_rng(2)
    spatial = (16, 16, 12)
    base = rng.normal(size=spatial).astype(np.float32)
    vol = ndimage.gaussian_filter(base, 2.0)[..., None].astype(np.float32)
    lin = np.eye(3) + rng.normal(scale=0.05, size=(3, 3))
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = lin

    ours = np.asarray(warp_affine_separable(vol, m))[..., 0]

    coords = np.asarray(affine_coords(m, spatial))
    t_in = torch.from_numpy(vol[None, ..., 0][None])
    grid = _grid_from_coords(torch, coords, spatial)
    theirs = torch.nn.functional.grid_sample(
        t_in, grid, mode="bilinear", padding_mode="zeros", align_corners=True
    )[0, 0].numpy()
    in_b = np.ones(spatial, bool)
    for d in range(3):
        in_b &= (coords[d] >= 1) & (coords[d] <= spatial[d] - 2)
    denom = np.abs(theirs[in_b]).mean() + 1e-6
    mean_rel = np.abs(ours[in_b] - theirs[in_b]).mean() / denom
    assert mean_rel < 0.05, f"separable warp deviates {mean_rel:.3f} mean-rel"


# ---------------------------------------------------------------------------
# (b) losses vs the reference file
# ---------------------------------------------------------------------------


def _binary_fixture(torch, seed=0, b=2, s=(6, 7, 5)):
    rng = np.random.default_rng(seed)
    pred = rng.uniform(0.01, 0.99, size=(b,) + s).astype(np.float32)
    target = (rng.uniform(size=(b,) + s) > 0.7).astype(np.float32)
    # ours channels-last [B, *S, 1]; ref channels-first [B, 1, *S]
    return (
        pred[..., None],
        target[..., None],
        torch.from_numpy(pred[:, None]),
        torch.from_numpy(target[:, None]),
    )


def _mc_fixture(torch, seed=0, b=2, c=3, s=(6, 7, 5)):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(b, c) + s).astype(np.float32)
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    pred = e / e.sum(axis=1, keepdims=True)
    target_idx = rng.integers(0, c, size=(b,) + s)
    onehot = np.moveaxis(np.eye(c, dtype=np.float32)[target_idx], -1, 1)
    return (
        np.moveaxis(pred, 1, -1),  # ours [B, *S, C]
        target_idx,  # ours int target
        torch.from_numpy(pred),  # ref [B, C, *S]
        torch.from_numpy(onehot),
    )


BINARY_CASES = [
    ("binary_cross_entropy", {"weight": 1.5, "scale": 1.2}),
    ("binary_focal_loss", {"gamma": 2.0, "alpha": 0.7}),
    ("binary_focal_loss", {"gamma": 1.0, "alpha": 1.0, "scale": 2.0}),
    ("binary_generalized_dice_loss", {"weight": 1.0, "smooth": 1.0}),
    ("binary_generalized_dice_loss", {"weight": 2.0, "smooth": 0.0}),
    ("binary_focal_tversky_loss", {"alpha": 0.3, "beta": 0.7, "gamma": 0.75}),
    ("combo_loss", {"alpha": 0.4, "weight": 1.3, "gamma": 1.0}),
    (
        "hybrid_focal_loss",
        {
            "lam": 0.6,
            "focal_params": {"alpha": None, "gamma": 2.0},
            "tversky_params": {"alpha": 0.3, "beta": 0.7},
        },
    ),
    ("unified_focal_loss", {"weight": 0.6, "gamma": 0.5, "lam": 0.5}),
    ("weighted_mse", {"alpha": 2.0}),
]


@pytest.mark.parametrize("name,params", BINARY_CASES)
def test_binary_loss_parity(ref_losses, torch, name, params):
    import adell_mri_tpu.models.segmentation.losses as L

    ours_p, ours_t, ref_p, ref_t = _binary_fixture(torch)
    ours = float(getattr(L, name)(ours_p, ours_t, **params))
    ref_params = {
        k: (dict(v) if isinstance(v, dict) else v) for k, v in params.items()
    }
    with torch.no_grad():
        theirs = getattr(ref_losses, name)(ref_p, ref_t, **ref_params)
        theirs = float(torch.as_tensor(theirs).float().mean())
    assert ours == pytest.approx(theirs, rel=1e-4, abs=1e-5), (
        f"{name}: ours={ours} ref={theirs}"
    )


MC_CASES = [
    ("cat_cross_entropy", {"weight": 1.0, "scale": 1.1}),
    ("cat_cross_entropy", {"weight": [1.0, 2.0, 0.5]}),
    ("mc_focal_loss", {"alpha": [1.0, 1.0, 1.0], "gamma": 2.0}),
    ("mc_generalized_dice_loss", {"weight": 1.0, "smooth": 1.0}),
    ("mc_focal_tversky_loss", {"alpha": 0.3, "beta": 0.7, "gamma": 0.75}),
    ("mc_combo_loss", {"alpha": 0.4, "weight": 1.0, "scale": 1.0}),
    (
        "mc_hybrid_focal_loss",
        {
            "lam": 0.7,
            "focal_params": {"alpha": None, "gamma": 2.0},
            "tversky_params": {"alpha": 0.3, "beta": 0.7},
        },
    ),
    ("mc_unified_focal_loss", {"delta": 0.6, "gamma": 0.5, "lam": 0.5}),
]


@pytest.mark.parametrize("name,params", MC_CASES)
def test_mc_loss_parity(ref_losses, torch, name, params):
    import adell_mri_tpu.models.segmentation.losses as L

    ours_p, ours_t, ref_p, ref_t = _mc_fixture(torch)
    ours_params = dict(params)
    ref_params = {}
    for k, v in params.items():
        if isinstance(v, list):
            ref_params[k] = torch.tensor(v)
        elif isinstance(v, dict):
            ref_params[k] = {
                kk: (torch.tensor(vv) if isinstance(vv, list) else vv)
                for kk, vv in v.items()
            }
        else:
            ref_params[k] = v
    ours = float(getattr(L, name)(ours_p, ours_t, **ours_params))
    with torch.no_grad():
        theirs = getattr(ref_losses, name)(ref_p, ref_t, **ref_params)
        theirs = float(torch.as_tensor(theirs).float().mean())
    assert ours == pytest.approx(theirs, rel=1e-4, abs=1e-5), (
        f"{name}: ours={ours} ref={theirs}"
    )


# ---------------------------------------------------------------------------
# (c) lesion evaluation vs the reference picai_eval
# ---------------------------------------------------------------------------


def _synthetic_cases(seed=3, n_cases=8, shape=(24, 24, 12)):
    """Candidate maps: labelled blobs with per-blob confidence; GT masks
    overlapping some of them."""
    rng = np.random.default_rng(seed)
    # disjoint cells so candidate blobs never merge into one connected
    # component (the reference rejects components with >1 confidence)
    cells = [
        (4, 4, 3), (4, 12, 3), (12, 4, 3), (12, 12, 3),
        (4, 4, 8), (4, 12, 8), (12, 4, 8), (12, 12, 8),
    ]
    y_det, y_true = [], []
    for _ in range(n_cases):
        det = np.zeros(shape, np.float32)
        true = np.zeros(shape, np.int32)
        n_blobs = int(rng.integers(0, 4))
        for cell in rng.permutation(len(cells))[:n_blobs]:
            c = cells[cell]
            conf = float(rng.uniform(0.1, 0.9))
            sl = tuple(slice(ci - 2, ci + 2) for ci in c)
            det[sl] = conf
            if rng.uniform() < 0.6:
                off = rng.integers(-1, 2, size=3)
                slt = tuple(
                    slice(ci - 2 + o, ci + 2 + o) for ci, o in zip(c, off)
                )
                true[slt] = 1
        y_det.append(det)
        y_true.append(true)
    return y_det, y_true


def test_lesion_evaluate_parity(ref_picai):
    from adell_mri_tpu.eval.lesion import evaluate as ours_evaluate

    y_det, y_true = _synthetic_cases()
    subject_list = [f"c{i}" for i in range(len(y_det))]

    ref_m = ref_picai.evaluate(
        y_det=y_det,
        y_true=y_true,
        subject_list=subject_list,
        min_overlap=0.10,
        num_parallel_calls=1,
    )
    our_m = ours_evaluate(
        y_det, y_true, subject_list=subject_list, min_overlap=0.10,
        num_parallel_calls=1,
    )
    assert our_m.AP == pytest.approx(ref_m.AP, abs=1e-6), (
        f"AP ours={our_m.AP} ref={ref_m.AP}"
    )
    assert our_m.auroc == pytest.approx(ref_m.auroc, abs=1e-6), (
        f"auroc ours={our_m.auroc} ref={ref_m.auroc}"
    )
    assert our_m.score == pytest.approx(ref_m.score, abs=1e-6)


def test_lesion_case_parity(ref_picai):
    """Per-case lesion matching must agree candidate-by-candidate."""
    from adell_mri_tpu.eval.lesion import evaluate_case as ours_case

    y_det, y_true = _synthetic_cases(seed=11, n_cases=6)
    for det, true in zip(y_det, y_true):
        ref_lr, ref_conf, _weight, _idx = ref_picai.evaluate_case(
            y_det=det, y_true=true, min_overlap=0.10
        )
        our_lr, our_conf = ours_case(det, true, min_overlap=0.10)
        assert our_conf == pytest.approx(float(ref_conf), abs=1e-6)
        ref_set = sorted((int(a), round(float(b), 6)) for a, b, *_ in ref_lr)
        our_set = sorted((int(a), round(float(b), 6)) for a, b in our_lr)
        assert our_set == ref_set, f"ours={our_set} ref={ref_set}"


# ---------------------------------------------------------------------------
# (d) schedules / conformal / lesion-candidate extraction vs reference
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "t_max,warmup,start_decay",
    [(100, 0, None), (100, 10, None), (100, 10, 30), (50, 0.1, 0.5),
     (100, 30, 10)],
)
def test_cosine_schedule_parity(torch, t_max, warmup, start_decay):
    """Our optax-style schedule vs the reference CosineAnnealingWithWarmupLR
    closed form at every step (ref learning_rate.py:106)."""
    ref_lr = _ref_module("adell_mri.modules.learning_rate")
    from adell_mri_tpu.train.schedules import cosine_annealing_with_warmup

    base_lr = 0.01
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base_lr)
    kwargs = dict(T_max=t_max, n_warmup_steps=warmup)
    if start_decay is not None:
        kwargs["start_decay"] = start_decay
    sched = ref_lr.CosineAnnealingWithWarmupLR(opt, **kwargs)
    ours = cosine_annealing_with_warmup(
        base_lr, t_max, n_warmup_steps=warmup, start_decay=start_decay
    )
    for step in range(t_max):
        sched.last_epoch = step
        ref_val = sched._get_closed_form_lr()[0]
        our_val = float(ours(step))
        assert our_val == pytest.approx(ref_val, rel=1e-5, abs=1e-8), (
            f"step {step}: ours={our_val} ref={ref_val}"
        )


def test_conformal_aps_parity(torch):
    """q_hat and the prediction sets vs the reference AdaptivePredictionSets
    (ref conformal_prediction/conformal.py:7)."""
    ref_conf = _ref_module("adell_mri.modules.conformal_prediction.conformal")
    from adell_mri_tpu.models.layers.conformal import AdaptivePredictionSets

    rng = np.random.default_rng(5)
    n, c = 40, 4
    logits = rng.normal(size=(n, c)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    labels = rng.integers(0, c, size=n)

    ref = ref_conf.AdaptivePredictionSets(alpha=0.2)
    ref.update(torch.from_numpy(labels), torch.from_numpy(probs))
    ref.calculate()

    ours = AdaptivePredictionSets(alpha=0.2).calibrate(probs, labels)
    assert ours.q_hat == pytest.approx(float(ref.qhat), abs=1e-6)

    test_probs = rng.dirichlet(np.ones(c), size=16).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(test_probs)).numpy()
    ref_sets = ref_out[:, :c] > 0.5
    our_sets = ours(test_probs)
    np.testing.assert_array_equal(our_sets, ref_sets)


def test_extract_lesion_candidates_parity():
    """Dynamic candidate extraction vs the reference implementation on the
    same heatmaps (ref modules/extract_lesion_candidates.py:137)."""
    ref_elc = _ref_module("adell_mri.modules.extract_lesion_candidates")
    from adell_mri_tpu.eval.lesion import extract_lesion_candidates

    rng = np.random.default_rng(9)
    from scipy import ndimage as ndi

    for seed in range(4):
        base = rng.normal(size=(24, 24, 12))
        heat = ndi.gaussian_filter(np.maximum(base, 0), 2.0).astype(
            np.float32
        )
        heat = heat / max(heat.max(), 1e-6) * 0.9
        ref_hard, ref_confs, _ = ref_elc.extract_lesion_candidates(
            heat, threshold="dynamic", max_prob_round_decimals=4
        )
        our_hard, our_confs, _ = extract_lesion_candidates(
            heat, threshold="dynamic"
        )
        ref_set = sorted(round(float(cf), 6) for _, cf in ref_confs)
        our_set = sorted(round(float(cf), 6) for _, cf in our_confs)
        assert our_set == ref_set, f"ours={our_set} ref={ref_set}"
        np.testing.assert_allclose(our_hard, ref_hard, atol=1e-6)


def test_area_resize_matches_torch(torch):
    """area_resize vs torch.nn.functional.interpolate(mode='area') — the
    engine under MONAI Resized(mode='area'), the reference's image resize
    (ref entrypoints/segmentation/train.py:180-203)."""
    from adell_mri_tpu.transforms.host import area_resize

    rng = np.random.default_rng(3)
    for in_shape, out_shape in [
        ((16, 14, 10), (8, 7, 5)),
        ((15, 13, 9), (8, 8, 8)),
        ((8, 8, 4), (12, 10, 6)),  # upscale
        ((20, 20), (7, 11)),  # 2D
    ]:
        vol = rng.normal(size=in_shape).astype(np.float32)
        ours = area_resize(vol, out_shape)
        t_in = torch.from_numpy(vol)[None, None]
        theirs = torch.nn.functional.interpolate(
            t_in, size=out_shape, mode="area"
        )[0, 0].numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_nearest_resize_matches_torch(torch):
    from adell_mri_tpu.transforms.host import nearest_resize

    rng = np.random.default_rng(4)
    for in_shape, out_shape in [
        ((16, 14, 10), (8, 7, 5)),
        ((9, 9, 5), (12, 6, 8)),
    ]:
        vol = rng.normal(size=in_shape).astype(np.float32)
        ours = nearest_resize(vol, out_shape)
        t_in = torch.from_numpy(vol)[None, None]
        theirs = torch.nn.functional.interpolate(
            t_in, size=out_shape, mode="nearest"
        )[0, 0].numpy()
        np.testing.assert_array_equal(ours, theirs)


def test_resize_size_scales_not_crops(tmp_path):
    """--resize_size must SCALE the volume (Resized), not center-crop: a
    corner marker survives downscaling but would be cropped away."""
    from adell_mri_tpu.data.nifti import write_nifti
    from adell_mri_tpu.transforms.host import make_load_fn

    vol = np.zeros((32, 32, 16), np.float32)
    vol[:4, :4, :4] = 100.0  # corner marker
    path = str(tmp_path / "v.nii.gz")
    write_nifti(path, vol, np.diag([1.0, 1.0, 1.0, 1.0]))
    load = make_load_fn(
        image_keys=["image"], resize_size=(16, 16, 8),
        scale_intensity=False,
    )
    out = load({"image": path})["image"][..., 0]
    assert out.shape == (16, 16, 8)
    assert out[:2, :2, :2].mean() > 10  # marker survived (scaled)
    # a crop/pad of the same size would KEEP the corner empty
    load_crop = make_load_fn(
        image_keys=["image"], target_size=(16, 16, 8),
        scale_intensity=False,
    )
    out_crop = load_crop({"image": path})["image"][..., 0]
    assert out_crop[:2, :2, :2].mean() < 1e-3


def test_lesion_eval_diagonal_connectivity(ref_picai):
    """Diagonally-touching clusters are ONE component under the reference's
    26-connectivity labelling; our evaluate_case must agree."""
    from adell_mri_tpu.eval.lesion import evaluate_case as ours_case

    det = np.zeros((12, 12, 6), np.float32)
    det[2:4, 2:4, 1:3] = 0.8
    det[4:6, 4:6, 3:5] = 0.8  # touches only at the (4,4,3) corner
    true = np.zeros((12, 12, 6), np.int32)
    true[2:6, 2:6, 1:5] = 1
    ref_lr, ref_conf, _w, _i = ref_picai.evaluate_case(
        y_det=det, y_true=true, min_overlap=0.10
    )
    our_lr, our_conf = ours_case(det, true, min_overlap=0.10)
    ref_set = sorted((int(a), round(float(b), 6)) for a, b, *_ in ref_lr)
    our_set = sorted((int(a), round(float(b), 6)) for a, b in our_lr)
    assert our_set == ref_set, f"ours={our_set} ref={ref_set}"


def test_invert_geometry_resize_roundtrip():
    """Predictions on the resize grid map back to source voxels: a marker
    at known source coords survives forward-resize + inverse."""
    from adell_mri_tpu.data.nifti import NiftiImage
    from adell_mri_tpu.entrypoints.segmentation.predict import (
        _invert_geometry,
    )
    from adell_mri_tpu.transforms.host import area_resize

    src = np.zeros((32, 32, 16), np.float32)
    src[20:26, 8:14, 4:8] = 1.0
    ref_img = NiftiImage(
        data=src[..., None], affine=np.diag([1.0, 1.0, 1.0, 1.0])
    )
    pred = area_resize(src, (16, 16, 8))  # the forward resize path
    inv = _invert_geometry(
        pred, ref_img, target_spacing=(1.0, 1.0, 1.0),
        resize_size=(16, 16, 8),
    )
    assert inv.shape == src.shape
    # mass stays centered on the source marker
    idx = np.argwhere(inv > 0.5)
    assert idx.size > 0
    lo, hi = idx.min(0), idx.max(0) + 1
    assert np.all(np.abs(lo - [20, 8, 4]) <= 2), (lo,)
    assert np.all(np.abs(hi - [26, 14, 8]) <= 2), (hi,)


# ---------------------------------------------------------------------------
# (e) SSL / detection / classification losses vs reference
# ---------------------------------------------------------------------------


def test_vicreg_parity(torch):
    ref_v = _ref_module("adell_mri.modules.self_supervised.losses.vicreg")
    from adell_mri_tpu.models.ssl.losses import vicreg_loss

    rng = np.random.default_rng(7)
    z1 = rng.normal(size=(16, 32)).astype(np.float32)
    z2 = (z1 + rng.normal(scale=0.3, size=(16, 32))).astype(np.float32)
    ref = ref_v.VICRegLoss(min_var=1.0, eps=1e-4, lam=25.0, mu=25.0, nu=0.1)
    with torch.no_grad():
        var_l, cov_l, inv_l = ref.vicreg_loss(
            torch.from_numpy(z1), torch.from_numpy(z2)
        )
        ref_total = float(25.0 * inv_l + 25.0 * var_l + 0.1 * cov_l)
    total, comps = vicreg_loss(z1, z2)
    assert float(comps["variance"]) == pytest.approx(float(var_l), rel=1e-5)
    assert float(comps["covariance"]) == pytest.approx(float(cov_l), rel=1e-5)
    assert float(comps["invariance"]) == pytest.approx(float(inv_l), rel=1e-5)
    assert float(total) == pytest.approx(ref_total, rel=1e-5)


def test_simsiam_byol_parity(torch):
    ref_f = _ref_module("adell_mri.modules.self_supervised.losses.functional")
    from adell_mri_tpu.models.ssl.losses import byol_loss, simsiam_loss

    rng = np.random.default_rng(8)
    x1 = rng.normal(size=(12, 24)).astype(np.float32)
    x2 = rng.normal(size=(12, 24)).astype(np.float32)
    with torch.no_grad():
        ref_ss = float(
            ref_f.simsiam_loss(torch.from_numpy(x1), torch.from_numpy(x2))
        )
        ref_by = float(
            ref_f.byol_loss(torch.from_numpy(x1), torch.from_numpy(x2))
        )
    assert float(simsiam_loss(x1, x2)) == pytest.approx(ref_ss, abs=1e-6)
    assert float(byol_loss(x1, x2)) == pytest.approx(ref_by, abs=1e-6)


def test_ntxent_parity(torch):
    ref_n = _ref_module("adell_mri.modules.self_supervised.losses.ntxent")
    from adell_mri_tpu.models.ssl.losses import ntxent_loss

    rng = np.random.default_rng(9)
    z1 = rng.normal(size=(10, 16)).astype(np.float32) + 0.5
    z2 = rng.normal(size=(10, 16)).astype(np.float32) + 0.5
    for temperature, relu in [(1.0, True), (0.5, False)]:
        ref = ref_n.NTXentLoss(temperature=temperature, apply_relu=relu)
        with torch.no_grad():
            theirs = float(
                ref(torch.from_numpy(z1), torch.from_numpy(z2))
            )
        ours = float(
            ntxent_loss(z1, z2, temperature=temperature, apply_relu=relu)
        )
        assert ours == pytest.approx(theirs, rel=1e-4), (temperature, relu)


def test_ciou_parity(torch):
    ref_d = _ref_module("adell_mri.modules.object_detection.losses")
    from adell_mri_tpu.models.detection.losses import (
        complete_iou_components,
    )

    rng = np.random.default_rng(10)
    tl = rng.uniform(0, 10, size=(8, 3)).astype(np.float32)
    sz = rng.uniform(2, 8, size=(8, 3)).astype(np.float32)
    a = np.concatenate([tl, tl + sz], -1)
    tl2 = tl + rng.uniform(-2, 2, size=(8, 3)).astype(np.float32)
    sz2 = sz + rng.uniform(-1, 1, size=(8, 3)).astype(np.float32)
    b = np.concatenate([tl2, tl2 + np.maximum(sz2, 1)], -1).astype(np.float32)
    with torch.no_grad():
        r_iou, r_cpd, r_ar = ref_d.complete_iou_loss(
            torch.from_numpy(a), torch.from_numpy(b), ndim=3
        )
    iou, cpd, ar = complete_iou_components(a, b)
    np.testing.assert_allclose(np.asarray(iou), r_iou.numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(cpd), r_cpd.numpy(), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ar), r_ar.numpy(), rtol=1e-4, atol=1e-6
    )


def test_ordinal_loss_parity(torch):
    ref_c = _ref_module("adell_mri.modules.classification.losses")
    from adell_mri_tpu.models.classification.losses import (
        ordinal_sigmoidal_loss,
    )

    rng = np.random.default_rng(11)
    n_classes = 4
    logits = rng.normal(size=(10, n_classes - 1)).astype(np.float32)
    labels = rng.integers(0, n_classes, size=10)
    with torch.no_grad():
        theirs = float(
            ref_c.ordinal_sigmoidal_loss(
                torch.from_numpy(logits),
                torch.from_numpy(labels),
                n_classes,
            ).mean()
        )
    ours = float(ordinal_sigmoidal_loss(logits, labels, n_classes))
    assert ours == pytest.approx(theirs, rel=1e-5)


def test_dino_sinkhorn_parity(torch):
    """Sinkhorn-Knopp teacher normalization vs the reference (dino.py:154;
    single-process world, so the all_reduce branches are no-ops)."""
    ref_d = _ref_module("adell_mri.modules.self_supervised.losses.dino")
    from adell_mri_tpu.models.ssl.losses import sinkhorn_knopp

    rng = np.random.default_rng(12)
    # scores scaled so exp(x/t2) stays in a well-conditioned f32 range:
    # unit-normal scores at t2=0.05 span e^{+-60}, where weak rows
    # underflow and the reference divides by zero (we guard at 1e-12) —
    # a numerical-pathology regime, not a formula difference
    scores = (0.1 * rng.normal(size=(8, 16))).astype(np.float32)
    ref = ref_d.DinoLoss(
        temperatures=(0.1, 0.05), n_features=16,
        teacher_score_method="sk", sk_iterations=3,
    )
    with torch.no_grad():
        theirs = ref.sinkhorn_knopp_teacher(torch.from_numpy(scores)).numpy()
    ours = np.asarray(sinkhorn_knopp(scores, n_iter=3, eps=0.05))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# Weight-transfer forward parity: REFERENCE UNet weights -> our UNet
# (interop/torch_unet.py). Same weights => same outputs is the strongest
# evidence for the Dice-within-1% axis: any downstream metric computed
# from identical predictions is identical.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_unet_mod():
    return _ref_module("adell_mri.modules.segmentation.unet")


@pytest.mark.parametrize(
    "link_type,upscale_type,norm,extras",
    [
        ("identity", "upsample", "instance", {}),
        ("conv", "transpose", "instance", {}),
        ("identity", "upsample", "batch", {}),
        (
            "conv",
            "upsample",
            "instance",
            {"bottleneck_classification": True, "feature_conditioning": 2},
        ),
        ("identity", "upsample", "instance", {"spatial_dimensions": 2}),
        # plain (non-bottleneck) residual links, init_link_ops:503-527
        ("residual", "transpose", "instance", {}),
        ("residual", "upsample", "batch", {}),
    ],
)
def test_unet_weight_transfer_forward_parity(
    ref_unet_mod, torch, link_type, upscale_type, norm, extras
):
    import jax
    import jax.numpy as jnp

    from adell_mri_tpu.interop import import_reference_unet_state_dict
    from adell_mri_tpu.models.segmentation.unet import UNet

    depth = [4, 8, 16]
    sdim = extras.get("spatial_dimensions", 3)
    torch.manual_seed(42)
    feature_conditioning = extras.get("feature_conditioning")
    fc_params = None
    if feature_conditioning:
        fc_params = {
            "mean": torch.tensor([1.0, -0.5]),
            "std": torch.tensor([2.0, 0.5]),
        }
    conv_type = extras.get("conv_type", "regular")
    ref = ref_unet_mod.UNet(
        spatial_dimensions=sdim,
        conv_type=conv_type,
        link_type=link_type,
        upscale_type=upscale_type,
        interpolation="trilinear" if sdim == 3 else "bilinear",
        norm_type=norm,
        dropout_type="dropout",
        dropout_param=0.0,
        activation_fn=torch.nn.PReLU,
        in_channels=1,
        n_classes=2,
        depth=depth,
        kernel_sizes=[3, 3, 3],
        strides=[2, 2, 2],
        bottleneck_classification=extras.get(
            "bottleneck_classification", False
        ),
        feature_conditioning=feature_conditioning,
        feature_conditioning_params=fc_params,
    )
    rng = np.random.default_rng(7)
    spatial = (16, 16, 8) if sdim == 3 else (16, 16)
    x = rng.normal(size=(2, 1) + spatial).astype(np.float32)
    feats = None
    if feature_conditioning:
        feats = rng.normal(size=(2, feature_conditioning)).astype(np.float32)

    if norm == "batch":
        # push the running stats away from (0, 1) so the transfer of
        # running_mean/var is actually exercised
        ref.train()
        with torch.no_grad():
            ref(torch.from_numpy(x))
    ref.eval()
    with torch.no_grad():
        if feature_conditioning:
            out = ref(
                torch.from_numpy(x),
                X_feature_conditioning=torch.from_numpy(feats),
            )
        else:
            out = ref(torch.from_numpy(x))
    ref_pred = out[0].numpy()
    ref_bn = out[1].numpy() if out[1] is not None else None

    sd = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}
    imported = import_reference_unet_state_dict(
        sd,
        depth=depth,
        conv_type=conv_type,
        link_type=link_type,
        upscale_type=upscale_type,
        norm_type=norm,
        activation_fn="prelu",
        bottleneck_classification=extras.get(
            "bottleneck_classification", False
        ),
        feature_conditioning=feature_conditioning,
    )
    ours = UNet(
        spatial_dimensions=sdim,
        conv_type=conv_type,
        link_type=link_type,
        upscale_type=upscale_type,
        interpolation="linear",
        norm_type=norm,
        dropout_param=0.0,
        activation_fn="prelu",
        in_channels=1,
        n_classes=2,
        depth=depth,
        kernel_sizes=[3, 3, 3],
        strides=[2, 2, 2],
        bottleneck_classification=extras.get(
            "bottleneck_classification", False
        ),
        feature_conditioning=feature_conditioning,
        feature_conditioning_params=imported.get(
            "feature_conditioning_params"
        ),
    )
    axes = (0, 2, 3, 4, 1) if sdim == 3 else (0, 2, 3, 1)
    x_cl = np.transpose(x, axes)  # channels-first -> channels-last
    variables = {"params": imported["params"]}
    if "batch_stats" in imported:
        variables["batch_stats"] = imported["batch_stats"]

    # shape-compatibility check against a fresh init: the imported tree
    # must match the model's own param structure exactly
    init_vars = ours.init(
        jax.random.PRNGKey(0),
        jnp.asarray(x_cl),
        x_feature_conditioning=(
            jnp.asarray(feats) if feats is not None else None
        ),
        train=False,
    )
    ref_shapes = jax.tree.map(jnp.shape, init_vars["params"])
    got_shapes = jax.tree.map(np.shape, imported["params"])
    assert ref_shapes == got_shapes

    call_kwargs = {}
    if feats is not None:
        call_kwargs["x_feature_conditioning"] = jnp.asarray(feats)
    out = ours.apply(
        variables, jnp.asarray(x_cl), train=False, **call_kwargs
    )
    inv = (0, 4, 1, 2, 3) if sdim == 3 else (0, 3, 1, 2)
    our_pred = np.transpose(np.asarray(out[0]), inv)
    np.testing.assert_allclose(our_pred, ref_pred, atol=2e-5)
    if ref_bn is not None:
        np.testing.assert_allclose(
            np.asarray(out[1]), ref_bn, atol=2e-5
        )


@pytest.mark.parametrize("with_heads", [False, True])
def test_resnet_weight_transfer_forward_parity(torch, with_heads):
    """Reference ResNetBackbone / ResNet -> our modules on the SAME
    weights (interop/torch_resnet.py). This is the SSL-pretrained-encoder
    migration path (ref entrypoints/segmentation/train.py:659-719)."""
    import jax
    import jax.numpy as jnp

    from adell_mri_tpu.interop import (
        import_reference_resnet,
        import_reference_resnet_backbone,
    )
    from adell_mri_tpu.models.layers.adn import get_adn_fn
    from adell_mri_tpu.models.layers.res_net import ResNet, ResNetBackbone

    ref_rn = _ref_module("adell_mri.modules.layers.res_net")
    ref_adn = _ref_module("adell_mri.modules.layers.adn_fn")

    structure = [(4, 4, 3, 1), (8, 8, 3, 2)]
    adn_t = ref_adn.get_adn_fn(3, "instance", "prelu", 0.0)
    adn_j = get_adn_fn(3, "instance", "prelu", 0.0)
    torch.manual_seed(11)
    rng = np.random.default_rng(13)
    x = rng.normal(size=(2, 1, 16, 16, 8)).astype(np.float32)
    x_cl = np.transpose(x, (0, 2, 3, 4, 1))

    if not with_heads:
        ref = ref_rn.ResNetBackbone(3, 1, structure, adn_fn=adn_t)
        ref.eval()
        with torch.no_grad():
            y_ref = ref(torch.from_numpy(x)).numpy()
        sd = {k: v.numpy() for k, v in ref.state_dict().items()}
        imported = import_reference_resnet_backbone(
            sd, structure=structure, norm_type="instance"
        )
        ours = ResNetBackbone(structure=structure, adn_fn=adn_j)
        init = ours.init(jax.random.PRNGKey(0), jnp.asarray(x_cl))
        assert jax.tree.map(jnp.shape, init["params"]) == jax.tree.map(
            np.shape, imported["params"]
        )
        y = ours.apply(
            {"params": imported["params"]}, jnp.asarray(x_cl)
        )
        np.testing.assert_allclose(
            np.transpose(np.asarray(y), (0, 4, 1, 2, 3)), y_ref, atol=2e-5
        )
    else:
        proj = [8, 6, 4]
        pred = [4, 4]
        # heads use a 1-d ADN (a spatial-dim norm crashes the
        # reference's own ProjectionHead on [B, F] inputs); "layer" also
        # exercises the trailing-norm mapping
        adn_h_t = ref_adn.get_adn_fn(1, "layer", "prelu", 0.0)
        ref = ref_rn.ResNet(
            backbone_args=dict(
                spatial_dim=3,
                in_channels=1,
                structure=structure,
                adn_fn=adn_t,
            ),
            projection_head_args=dict(
                in_channels=8, structure=proj, adn_fn=adn_h_t
            ),
            prediction_head_args=dict(
                in_channels=4, structure=pred, adn_fn=adn_h_t
            ),
        )
        ref.eval()
        with torch.no_grad():
            y_ref = ref(torch.from_numpy(x), ret="prediction").numpy()
        sd = {k: v.numpy() for k, v in ref.state_dict().items()}
        imported = import_reference_resnet(
            sd,
            structure=structure,
            projection_head_structure=proj,
            prediction_head_structure=pred,
            norm_type="instance",
            head_norm_type="layer",
        )
        ours = ResNet(
            backbone_structure=structure,
            adn_fn=adn_j,
            head_adn_fn=get_adn_fn(1, "layer", "prelu", 0.0),
            projection_head_structure=proj,
            prediction_head_structure=pred,
        )
        init = ours.init(jax.random.PRNGKey(0), jnp.asarray(x_cl))
        assert jax.tree.map(jnp.shape, init["params"]) == jax.tree.map(
            np.shape, imported["params"]
        )
        y = ours.apply(
            {"params": imported["params"]},
            jnp.asarray(x_cl),
            ret="prediction",
        )
        # deep stack + LayerNorm: pure f32 accumulation-order noise
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=5e-5)


def test_unet_weight_transfer_gradient_parity(ref_unet_mod, torch):
    """Training-dynamics parity: with the SAME weights and input, d(mean
    prediction)/d(params) matches the reference parameter-for-parameter.
    The torch gradient dict is pushed through the SAME state-dict mapper
    (every mapping op — transpose/flip/slice — is linear, so it maps
    gradients exactly as it maps weights)."""
    import jax
    import jax.numpy as jnp

    from adell_mri_tpu.interop import import_reference_unet_state_dict
    from adell_mri_tpu.models.segmentation.unet import UNet

    depth = [4, 8, 16]
    torch.manual_seed(21)
    ref = ref_unet_mod.UNet(
        spatial_dimensions=3,
        conv_type="regular",
        link_type="identity",
        upscale_type="upsample",
        interpolation="trilinear",
        norm_type="instance",
        dropout_param=0.0,
        activation_fn=torch.nn.PReLU,
        in_channels=1,
        n_classes=2,
        depth=depth,
        kernel_sizes=[3, 3, 3],
        strides=[2, 2, 2],
    )
    ref.eval()
    rng = np.random.default_rng(17)
    x = rng.normal(size=(1, 1, 16, 16, 8)).astype(np.float32)
    out = ref(torch.from_numpy(x))[0]
    out.mean().backward()
    torch_grads = {
        k: p.grad.detach().numpy()
        for k, p in ref.named_parameters()
        if p.grad is not None
    }

    kwargs = dict(
        depth=depth,
        link_type="identity",
        upscale_type="upsample",
        norm_type="instance",
        activation_fn="prelu",
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    imported = import_reference_unet_state_dict(sd, **kwargs)
    want_grads = import_reference_unet_state_dict(
        torch_grads, **kwargs
    )["params"]

    model = UNet(
        spatial_dimensions=3,
        conv_type="regular",
        link_type="identity",
        upscale_type="upsample",
        interpolation="linear",
        norm_type="instance",
        dropout_param=0.0,
        activation_fn="prelu",
        n_classes=2,
        depth=depth,
        kernel_sizes=[3, 3, 3],
        strides=[2, 2, 2],
    )
    x_cl = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))

    def loss(params):
        pred, _ = model.apply({"params": params}, x_cl)
        return jnp.mean(pred)

    got_grads = jax.grad(loss)(
        jax.tree.map(jnp.asarray, imported["params"])
    )
    # leafwise compare against the GLOBAL gradient scale: biases feeding
    # an instance norm have mathematically ZERO gradient (the norm
    # subtracts them exactly), so both frameworks emit uncorrelated
    # numerical residue there — per-leaf relative tolerance would compare
    # noise to noise. Kernel/slope grads match to ~2e-7 relative.
    want_leaves, treedef_w = jax.tree_util.tree_flatten(want_grads)
    got_leaves, treedef_g = jax.tree_util.tree_flatten(
        jax.tree.map(np.asarray, got_grads)
    )
    assert treedef_w == treedef_g
    gscale = max(np.abs(w).max() for w in want_leaves)
    for w, g in zip(want_leaves, got_leaves):
        assert np.abs(g - w).max() <= 2e-4 * gscale


def test_catnet_weight_transfer_forward_parity(torch):
    """Reference CatNet (ResNet backbone + batch/gelu MLP head) -> our
    CatNet on the SAME weights — the classification-AUC-parity migration
    path (interop.import_reference_catnet)."""
    import jax
    import jax.numpy as jnp

    from adell_mri_tpu.interop import import_reference_catnet
    from adell_mri_tpu.models.classification.nets import CatNet

    # classification.py imports segmentation.unet; stub that package
    # chain first (its real __init__ pulls lightning)
    _ref_module("adell_mri.modules.segmentation.unet")
    ref_c = _ref_module(
        "adell_mri.modules.classification.classification.classification"
    )
    ref_adn = _ref_module("adell_mri.modules.layers.adn_fn")

    structure = [(4, 4, 3, 1), (8, 8, 3, 2)]
    torch.manual_seed(23)
    ref = ref_c.CatNet(
        spatial_dimensions=3,
        in_channels=1,
        n_classes=2,
        resnet_structure=structure,
        maxpool_structure=[2, 2],
        adn_fn=ref_adn.get_adn_fn(3, "instance", "prelu", 0.0),
    )
    ref.eval()
    rng = np.random.default_rng(29)
    x = rng.normal(size=(2, 1, 16, 16, 8)).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x)).numpy()

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    imported = import_reference_catnet(
        sd, resnet_structure=structure, norm_type="instance"
    )
    ours = CatNet(
        spatial_dimensions=3,
        n_classes=2,
        resnet_structure=structure,
        maxpool_structure=[2, 2],
        norm_type="instance",
        act_fn="prelu",
        dropout_param=0.0,
    )
    x_cl = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))
    init = ours.init(jax.random.PRNGKey(0), x_cl)
    assert jax.tree.map(jnp.shape, init["params"]) == jax.tree.map(
        np.shape, imported["params"]
    )
    variables = {"params": imported["params"]}
    if "batch_stats" in imported:
        variables["batch_stats"] = imported["batch_stats"]
    y = ours.apply(variables, x_cl, train=False)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=5e-5)


def test_optimizer_trajectory_parity(torch):
    """optax chains built by train/optim.get_optimizer follow torch's
    update trajectories (SGD-nesterov is the segmentation default,
    segmentation/pl.py:526-564; AdamW the SSL default, self_supervised/
    pl.py:213). Quadratic objective, 6 steps, identical starts."""
    import jax
    import jax.numpy as jnp
    import optax

    from adell_mri_tpu.train.optim import get_optimizer

    rng = np.random.default_rng(31)
    w0 = rng.normal(size=(5, 3)).astype(np.float32)
    target = rng.normal(size=(5, 3)).astype(np.float32)

    for name, torch_ctor in [
        (
            "sgd",
            lambda p: torch.optim.SGD(
                p,
                lr=0.05,
                momentum=0.99,
                nesterov=True,
                weight_decay=0.005,
            ),
        ),
        (
            "adamw",
            lambda p: torch.optim.AdamW(p, lr=0.05, weight_decay=0.005),
        ),
    ]:
        wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
        opt_t = torch_ctor([wt])
        tgt = torch.from_numpy(target)
        for _ in range(6):
            opt_t.zero_grad()
            ((wt - tgt) ** 2).mean().backward()
            opt_t.step()

        tx = get_optimizer(
            name, learning_rate=0.05, momentum=0.99, weight_decay=0.005
        )
        wj = {"w": jnp.asarray(w0.copy())}
        state = tx.init(wj)
        tj = jnp.asarray(target)
        gfn = jax.grad(lambda p: jnp.mean((p["w"] - tj) ** 2))
        for _ in range(6):
            upd, state = tx.update(gfn(wj), state, wj)
            wj = optax.apply_updates(wj, upd)
        np.testing.assert_allclose(
            np.asarray(wj["w"]),
            wt.detach().numpy(),
            atol=1e-5,
            err_msg=name,
        )


def test_training_trajectory_parity(ref_unet_mod, torch):
    """The north-star capstone: starting from the SAME weights (via the
    interop transfer), feeding the SAME batches, optimizing the SAME loss
    (the reference's own binary focal, executed from /root/reference on
    the torch side and our jnp twin on ours) with the SAME SGD-nesterov
    optimizer, the two frameworks' per-step training losses track each
    other — identical training dynamics imply Dice parity at any epoch."""
    import jax
    import jax.numpy as jnp
    import optax

    from adell_mri_tpu.interop import import_reference_unet_state_dict
    from adell_mri_tpu.models.segmentation.losses import binary_focal_loss
    from adell_mri_tpu.models.segmentation.unet import UNet

    ref_losses = _ref_module("adell_mri.modules.segmentation.losses")

    depth = [4, 8, 16]
    torch.manual_seed(33)
    ref = ref_unet_mod.UNet(
        spatial_dimensions=3,
        conv_type="regular",
        link_type="identity",
        upscale_type="upsample",
        interpolation="trilinear",
        norm_type="instance",
        dropout_param=0.0,
        activation_fn=torch.nn.PReLU,
        in_channels=1,
        n_classes=2,
        depth=depth,
        kernel_sizes=[3, 3, 3],
        strides=[2, 2, 2],
    )
    ref.eval()  # dropout is 0 anyway; keeps norm semantics fixed
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    imported = import_reference_unet_state_dict(
        sd,
        depth=depth,
        link_type="identity",
        upscale_type="upsample",
        norm_type="instance",
        activation_fn="prelu",
    )

    rng = np.random.default_rng(41)
    n_steps = 8
    xs = rng.normal(size=(n_steps, 2, 1, 16, 16, 8)).astype(np.float32)
    ys = (
        rng.uniform(size=(n_steps, 2, 1, 16, 16, 8)) > 0.7
    ).astype(np.float32)

    lr, mom = 0.05, 0.9

    # ---- torch side: reference model + reference loss ----
    opt = torch.optim.SGD(
        ref.parameters(), lr=lr, momentum=mom, nesterov=True
    )
    t_losses = []
    for i in range(n_steps):
        opt.zero_grad()
        pred = ref(torch.from_numpy(xs[i]))[0]
        loss = ref_losses.binary_focal_loss(
            pred, torch.from_numpy(ys[i]), alpha=1.0, gamma=2.0
        ).mean()
        loss.backward()
        opt.step()
        t_losses.append(float(loss))

    # ---- ours: transferred weights + jnp twin loss ----
    model = UNet(
        spatial_dimensions=3,
        conv_type="regular",
        link_type="identity",
        upscale_type="upsample",
        interpolation="linear",
        norm_type="instance",
        dropout_param=0.0,
        activation_fn="prelu",
        n_classes=2,
        depth=depth,
        kernel_sizes=[3, 3, 3],
        strides=[2, 2, 2],
    )
    params = jax.tree.map(jnp.asarray, imported["params"])
    tx = optax.sgd(lr, momentum=mom, nesterov=True)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            pred, _ = model.apply({"params": p}, x)
            return jnp.mean(
                binary_focal_loss(pred[..., 0], y[..., 0], alpha=1.0, gamma=2.0)
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    j_losses = []
    for i in range(n_steps):
        x_cl = jnp.asarray(np.transpose(xs[i], (0, 2, 3, 4, 1)))
        y_cl = jnp.asarray(np.transpose(ys[i], (0, 2, 3, 4, 1)))
        params, opt_state, loss = step(params, opt_state, x_cl, y_cl)
        j_losses.append(float(loss))

    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-3)


def test_resnet_encoder_unet_graft(torch):
    """The reference's SSL-encoder grafting workflow (resnet_to_encoding_
    ops res_net.py:27, segmentation/train.py:659-719): a UNet built with
    ``encoder_structure`` hosts a ResNetBackbone under ``encoder_backbone``
    whose subtree accepts a REFERENCE backbone state dict verbatim, and
    the grafted encoder computes the same features the standalone
    backbone does."""
    import jax
    import jax.numpy as jnp

    from adell_mri_tpu.interop import import_reference_resnet_backbone
    from adell_mri_tpu.models.layers.adn import get_adn_fn
    from adell_mri_tpu.models.layers.res_net import ResNetBackbone
    from adell_mri_tpu.models.segmentation.unet import UNet

    ref_rn = _ref_module("adell_mri.modules.layers.res_net")
    ref_adn = _ref_module("adell_mri.modules.layers.adn_fn")

    structure = [(4, 4, 3, 1), (8, 8, 3, 2)]
    torch.manual_seed(55)
    ref_bb = ref_rn.ResNetBackbone(
        3, 1, structure,
        maxpool_structure=[(2, 2, 2), (2, 2, 1)],
        adn_fn=ref_adn.get_adn_fn(3, "instance", "swish", 0.0),
    )
    sd = {k: v.numpy() for k, v in ref_bb.state_dict().items()}
    enc = import_reference_resnet_backbone(
        sd, structure=structure, norm_type="instance",
        activation_fn="swish",
    )

    unet = UNet(
        spatial_dimensions=3,
        norm_type="instance",
        activation_fn="swish",
        dropout_param=0.0,
        n_classes=2,
        depth=(4, 4, 8),
        kernel_sizes=(3, 3, 3),
        strides=(2, (2, 2, 2), (2, 2, 1)),
        encoder_structure=structure,
    )
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 8, 1)).astype(np.float32))
    variables = unet.init(jax.random.PRNGKey(0), x)
    # drop-in subtree replacement: shapes must match exactly
    got = jax.tree.map(np.shape, variables["params"]["encoder_backbone"])
    want = jax.tree.map(np.shape, enc["params"])
    assert got == want
    params = dict(variables["params"])
    params["encoder_backbone"] = jax.tree.map(jnp.asarray, enc["params"])
    pred, _ = unet.apply({"params": params}, x)
    assert pred.shape == (1, 16, 16, 8, 1)

    # encoder features match the standalone (parity-proven) backbone
    bb = ResNetBackbone(
        structure=structure,
        maxpool_structure=[(2, 2, 2), (2, 2, 1)],
        adn_fn=get_adn_fn(3, "instance", "swish", 0.0),
    )
    _, inters = bb.apply(
        {"params": enc["params"]}, x,
        return_intermediate=True, return_stem=True,
    )
    _, _, bottleneck = unet.apply(
        {"params": params}, x, return_bottleneck=True
    )
    np.testing.assert_allclose(
        np.asarray(bottleneck), np.asarray(inters[-1]), atol=1e-6
    )


def test_lesion_parity_missed_and_multiblob(ref_picai):
    """Adversarial matching fixtures the random cohort never produces:
    a completely missed GT lesion (AP must not be inflated by its
    confidence-0 placeholder), two candidates covering one GT lesion (the
    extra candidate is NOT an FP under the reference's
    allow_unmatched_candidates_with_minimal_overlap default), and an
    overlap pattern where match-count-first assignment differs from
    max-IoU assignment."""
    from adell_mri_tpu.eval.lesion import evaluate as ours_evaluate

    shape = (32, 32, 16)
    # case 0: one detected lesion + one missed lesion
    det0 = np.zeros(shape, np.float32)
    true0 = np.zeros(shape, np.int32)
    det0[4:8, 4:8, 4:8] = 0.8
    true0[4:8, 4:8, 4:8] = 1
    true0[20:24, 20:24, 8:12] = 1  # missed
    # case 1: two candidates over ONE GT lesion
    det1 = np.zeros(shape, np.float32)
    true1 = np.zeros(shape, np.int32)
    true1[10:18, 10:18, 4:12] = 1
    det1[10:14, 10:18, 4:12] = 0.9
    det1[16:18, 10:18, 4:12] = 0.5  # separate blob, overlaps same GT
    # case 2: assignment order matters (c1 overlaps both GTs, better on g1)
    det2 = np.zeros(shape, np.float32)
    true2 = np.zeros(shape, np.int32)
    true2[2:10, 2:10, 2:10] = 1     # g1
    true2[2:10, 20:28, 2:10] = 1    # g2
    det2[2:10, 4:10, 2:10] = 0.9    # c1: strong overlap with g1
    det2[2:10, 12:27, 2:10] = 0.5   # c2: spans toward g2 (weak with both)
    y_det = [det0, det1, det2]
    y_true = [true0, true1, true2]
    subject_list = ["m0", "m1", "m2"]
    ref_m = ref_picai.evaluate(
        y_det=y_det, y_true=y_true, subject_list=subject_list,
        min_overlap=0.10, num_parallel_calls=1,
    )
    our_m = ours_evaluate(
        y_det, y_true, subject_list=subject_list, min_overlap=0.10,
        num_parallel_calls=1,
    )
    for pid in subject_list:
        ref_set = sorted(
            (int(a), round(float(b), 6))
            for a, b, *_ in ref_m.lesion_results[pid]
        )
        our_set = sorted(
            (int(a), round(float(b), 6)) for a, b in our_m.lesion_results[pid]
        )
        assert our_set == ref_set, f"{pid}: ours={our_set} ref={ref_set}"
    assert our_m.AP == pytest.approx(ref_m.AP, abs=1e-6), (
        f"AP ours={our_m.AP} ref={ref_m.AP}"
    )


@pytest.mark.parametrize("embed_method", ["linear", "convolutional"])
def test_vit_classifier_weight_transfer_forward_parity(torch, embed_method):
    """Reference ViTClassifier (vit.py:1618 + classification.py:709) -> our
    ViTClassifier on the SAME weights (interop/torch_vit.py): fused
    interleaved qkv split, per-head q/k LayerNorms (qk_norm), map_to_out
    LayerNorm+Linear (embed_norm) / conv patch embed, class-token head."""
    import einops.layers.torch  # noqa: F401 (reference uses bare import)
    import jax.numpy as jnp

    from adell_mri_tpu.interop import import_reference_vit_state_dict
    from adell_mri_tpu.models.classification.nets import ViTClassifier

    _ref_module("adell_mri.modules.segmentation.unet")
    ref_c = _ref_module(
        "adell_mri.modules.classification.classification.classification"
    )
    torch.manual_seed(11)
    ref = ref_c.ViTClassifier(
        n_classes=2,
        use_class_token=True,
        image_size=[16, 16, 8],
        patch_size=[4, 4, 4],
        in_channels=1,
        number_of_blocks=2,
        attention_dim=48,
        hidden_dim=48,
        embedding_size=48,
        n_heads=4,
        dropout_rate=0.0,
        embed_method=embed_method,
        mlp_structure=[96],
    )
    ref.eval()
    # perturb off torch's init so the comparison is not near-zero-trivial
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(0.02 * torch.randn_like(p))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = import_reference_vit_state_dict(sd, n_heads=4, n_blocks=2)
    ours = ViTClassifier(
        patch_size=(4, 4, 4),
        n_classes=2,
        embed_dim=48,
        n_blocks=2,
        n_heads=4,
        mlp_ratio=2.0,
        use_class_token=True,
        embed_method=embed_method,
        embed_norm=(embed_method == "linear"),
    )
    x = np.random.default_rng(5).normal(size=(2, 1, 16, 16, 8)).astype(
        np.float32
    )
    with torch.no_grad():
        theirs = ref(torch.as_tensor(x)).numpy()
    got = np.asarray(
        ours.apply({"params": params}, jnp.asarray(np.moveaxis(x, 1, -1)))
    )
    assert got.shape == theirs.shape
    assert np.abs(got - theirs).max() < 2e-5, (
        f"max dev {np.abs(got - theirs).max()}"
    )


def test_vit_import_torch_checkpoint_cli_roundtrip(torch, tmp_path):
    """REFERENCE ViTClassifier torch checkpoint -> `utils
    import_torch_checkpoint --net_type vit` -> `classification predict`
    consumes the orbax dir directly (the AUC-parity migration path,
    CLI-driven end-to-end)."""
    import json as _json

    import einops.layers.torch  # noqa: F401

    from adell_mri_tpu.__main__ import main as adell_main
    from adell_mri_tpu.data.nifti import write_nifti

    _ref_module("adell_mri.modules.segmentation.unet")
    ref_c = _ref_module(
        "adell_mri.modules.classification.classification.classification"
    )
    torch.manual_seed(3)
    ref = ref_c.ViTClassifier(
        n_classes=2, use_class_token=True,
        image_size=[16, 16, 8], patch_size=[4, 4, 4], in_channels=1,
        number_of_blocks=1, attention_dim=32, hidden_dim=32,
        embedding_size=32, n_heads=2, dropout_rate=0.0,
        embed_method="linear", mlp_structure=[64],
    )
    pt = tmp_path / "ref_vit.ckpt"
    torch.save({"state_dict": ref.state_dict()}, str(pt))

    yaml_path = tmp_path / "vit.yaml"
    yaml_path.write_text(
        "patch_size: [4, 4, 4]\n"
        "number_of_blocks: 1\n"
        "n_heads: 2\n"
        "attention_dim: 32\n"
        "mlp_structure: [64]\n"
        "use_class_token: true\n"
        "batch_size: 2\n"
        "learning_rate: 0.001\n"
    )
    rng = np.random.default_rng(0)
    ds = {}
    aff = np.diag([1.0, 1.0, 1.0, 1.0])
    for i in range(2):
        vol = rng.normal(500, 100, size=(16, 16, 8)).astype(np.float32)
        path = tmp_path / f"v{i}.nii.gz"
        write_nifti(str(path), vol, affine=aff)
        ds[f"case_{i}"] = {"image": str(path), "label": i % 2}
    ds_path = tmp_path / "ds.json"
    ds_path.write_text(_json.dumps(ds))

    ckpt_dir = tmp_path / "imported"
    adell_main(
        [
            "utils", "import_torch_checkpoint",
            "--input_path", str(pt),
            "--config_file", str(yaml_path),
            "--net_type", "vit",
            "--checkpoint_dir", str(ckpt_dir),
            "--image_keys", "image",
            "--target_size", "16", "16", "8",
            "--target_spacing", "1", "1", "1",
            "--n_classes", "2",
        ]
    )
    out_path = tmp_path / "preds.json"
    adell_main(
        [
            "classification", "predict",
            "--dataset_json", str(ds_path),
            "--checkpoint_dir", str(ckpt_dir),
            "--output_path", str(out_path),
            "--dev", "cpu",
        ]
    )
    preds = _json.loads(out_path.read_text())
    assert len(preds) == 2
    for v in preds.values():
        prob = v["prediction"] if isinstance(v, dict) else v
        prob = float(prob[0] if isinstance(prob, list) else prob)
        assert 0.0 <= prob <= 1.0


# ---------------------------------------------------------------------------
# North-star capstone: converged Dice parity (BASELINE.json "Dice/AUC
# parity within 1%"). Unlike the trajectory test above (8 steps, loss
# tracking), this trains BOTH stacks to convergence on a learnable
# synthetic task and compares the metric a user actually reads: Dice on
# held-out cases. Same transferred init + same batch order, then each
# framework accumulates its own arithmetic for the full run — parity of
# OUTCOME, not of per-step floats.
# ---------------------------------------------------------------------------


def _blob_cohort(rng, n, shape=(20, 20, 12)):
    """Learnable synthetic segmentation task: a bright ellipsoid on a
    noisy background (SNR chosen so a small UNet converges to Dice ~0.9
    in ~100 SGD steps with weighted BCE, i.e. the reference focal loss
    at gamma=0 — any gamma>0 traps a background-collapsed net because
    the reference's positive term (pred**gamma)*log(pred) has vanishing
    gradient as pred->0; measured: gamma in {1,2} gives Dice 0.000)."""
    D, H, W = shape
    zz, yy, xx = np.meshgrid(
        np.arange(D), np.arange(H), np.arange(W), indexing="ij"
    )
    xs, ys = [], []
    for _ in range(n):
        c = rng.uniform([5, 5, 3], [D - 5, H - 5, W - 3])
        r = rng.uniform(2.5, 4.5, size=3)
        mask = (
            ((zz - c[0]) / r[0]) ** 2
            + ((yy - c[1]) / r[1]) ** 2
            + ((xx - c[2]) / r[2]) ** 2
        ) <= 1.0
        x = mask * 1.0 + rng.normal(0, 0.35, size=shape)
        xs.append(x.astype(np.float32))
        ys.append(mask.astype(np.float32))
    return np.stack(xs)[:, None], np.stack(ys)[:, None]  # NCDHW


def _dice(pred_bin, y):
    inter = float((pred_bin * y).sum())
    denom = float(pred_bin.sum() + y.sum())
    return 2.0 * inter / max(denom, 1.0)


def test_converged_dice_parity(ref_unet_mod, torch):
    """Trains the reference UNet (torch, its own focal loss + SGD) and our
    UNet (same transferred init, same batches) INDEPENDENTLY for 100
    steps, then asserts held-out Dice within 1% absolute — the literal
    north-star claim (/root/repo/BASELINE.json)."""
    import jax
    import jax.numpy as jnp
    import optax

    from adell_mri_tpu.interop import import_reference_unet_state_dict
    from adell_mri_tpu.models.segmentation.losses import binary_focal_loss
    from adell_mri_tpu.models.segmentation.unet import UNet

    ref_losses = _ref_module("adell_mri.modules.segmentation.losses")

    depth = [4, 8, 16]
    torch.manual_seed(7)
    ref = ref_unet_mod.UNet(
        spatial_dimensions=3,
        conv_type="regular",
        link_type="identity",
        upscale_type="upsample",
        interpolation="trilinear",
        norm_type="instance",
        dropout_param=0.0,
        activation_fn=torch.nn.PReLU,
        in_channels=1,
        n_classes=2,
        depth=depth,
        kernel_sizes=[3, 3, 3],
        strides=[2, 2, 2],
    )
    ref.eval()  # instance norm; dropout 0
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    imported = import_reference_unet_state_dict(
        sd,
        depth=depth,
        link_type="identity",
        upscale_type="upsample",
        norm_type="instance",
        activation_fn="prelu",
    )

    rng = np.random.default_rng(1234)
    n_steps, batch = 100, 4
    tr_x, tr_y = _blob_cohort(rng, n_steps * batch)
    te_x, te_y = _blob_cohort(rng, 16)

    lr, mom = 0.02, 0.9

    # ---- reference stack ----
    opt = torch.optim.SGD(
        ref.parameters(), lr=lr, momentum=mom, nesterov=True
    )
    for i in range(n_steps):
        sl = slice(i * batch, (i + 1) * batch)
        opt.zero_grad()
        pred = ref(torch.from_numpy(tr_x[sl]))[0]
        loss = ref_losses.binary_focal_loss(
            pred, torch.from_numpy(tr_y[sl]), alpha=3.0, gamma=0.0
        ).mean()
        loss.backward()
        opt.step()
    with torch.no_grad():
        t_pred = ref(torch.from_numpy(te_x))[0].numpy()
    t_dice = _dice((t_pred > 0.5).astype(np.float32), te_y)

    # ---- our stack ----
    model = UNet(
        spatial_dimensions=3,
        conv_type="regular",
        link_type="identity",
        upscale_type="upsample",
        interpolation="linear",
        norm_type="instance",
        dropout_param=0.0,
        activation_fn="prelu",
        n_classes=2,
        depth=depth,
        kernel_sizes=[3, 3, 3],
        strides=[2, 2, 2],
    )
    params = jax.tree.map(jnp.asarray, imported["params"])
    tx = optax.sgd(lr, momentum=mom, nesterov=True)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            pred, _ = model.apply({"params": p}, x)
            return jnp.mean(
                binary_focal_loss(
                    pred[..., 0], y[..., 0], alpha=3.0, gamma=0.0
                )
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def to_cl(a):
        return jnp.asarray(np.transpose(a, (0, 2, 3, 4, 1)))

    for i in range(n_steps):
        sl = slice(i * batch, (i + 1) * batch)
        params, opt_state, _ = step(
            params, opt_state, to_cl(tr_x[sl]), to_cl(tr_y[sl])
        )

    @jax.jit
    def infer(params, x):
        return model.apply({"params": params}, x)[0]

    j_pred = np.asarray(infer(params, to_cl(te_x)))[..., 0]
    j_dice = _dice(
        (j_pred > 0.5).astype(np.float32), te_y[:, 0]
    )

    # both stacks must actually have LEARNED the task, and agree
    assert t_dice > 0.75, f"reference failed to learn (dice {t_dice:.3f})"
    assert j_dice > 0.75, f"ours failed to learn (dice {j_dice:.3f})"
    assert abs(t_dice - j_dice) < 0.01, (
        f"converged Dice diverges: ref {t_dice:.4f} vs ours {j_dice:.4f}"
    )


def test_converged_auc_parity(torch):
    """AUC half of the north star: reference CatNet and ours train
    INDEPENDENTLY (same transferred init, same batches, BCE + SGD) on a
    blob-present/absent task; held-out AUC must agree within 1%."""
    import jax
    import jax.numpy as jnp
    import optax
    from sklearn.metrics import roc_auc_score

    from adell_mri_tpu.interop import import_reference_catnet
    from adell_mri_tpu.models.classification.nets import CatNet

    _ref_module("adell_mri.modules.segmentation.unet")
    ref_c = _ref_module(
        "adell_mri.modules.classification.classification.classification"
    )
    ref_adn = _ref_module("adell_mri.modules.layers.adn_fn")

    shape = (16, 16, 8)

    def cohort(rng, n):
        xs, ys = [], []
        zz, yy, xx = np.meshgrid(
            *[np.arange(s) for s in shape], indexing="ij"
        )
        for _ in range(n):
            label = rng.integers(0, 2)
            x = rng.normal(0, 0.5, size=shape)
            if label:
                c = rng.uniform([4, 4, 2], [12, 12, 6])
                r = rng.uniform(2.0, 3.5)
                x = x + (
                    ((zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2)
                    <= r * r
                )
            xs.append(x.astype(np.float32))
            ys.append(float(label))
        return np.stack(xs)[:, None], np.asarray(ys, np.float32)

    structure = [(4, 4, 3, 1), (8, 8, 3, 2)]
    torch.manual_seed(11)
    ref = ref_c.CatNet(
        spatial_dimensions=3,
        in_channels=1,
        n_classes=2,
        resnet_structure=structure,
        maxpool_structure=[2, 2],
        adn_fn=ref_adn.get_adn_fn(3, "instance", "prelu", 0.0),
    )
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    imported = import_reference_catnet(
        sd, resnet_structure=structure, norm_type="instance"
    )

    rng = np.random.default_rng(77)
    n_steps, batch = 100, 8
    tr_x, tr_y = cohort(rng, n_steps * batch)
    te_x, te_y = cohort(rng, 48)

    lr, mom = 0.03, 0.9

    # ---- reference stack ----
    opt = torch.optim.SGD(
        ref.parameters(), lr=lr, momentum=mom, nesterov=True
    )
    bce = torch.nn.BCEWithLogitsLoss()
    for i in range(n_steps):
        sl = slice(i * batch, (i + 1) * batch)
        opt.zero_grad()
        logits = ref(torch.from_numpy(tr_x[sl])).reshape(-1)
        loss = bce(logits, torch.from_numpy(tr_y[sl]))
        loss.backward()
        opt.step()
    with torch.no_grad():
        t_logits = ref(torch.from_numpy(te_x)).reshape(-1).numpy()
    t_auc = roc_auc_score(te_y, t_logits)

    # ---- our stack ----
    ours = CatNet(
        spatial_dimensions=3,
        n_classes=2,
        resnet_structure=structure,
        maxpool_structure=[2, 2],
        norm_type="instance",
        act_fn="prelu",
        dropout_param=0.0,
    )
    params = jax.tree.map(jnp.asarray, imported["params"])
    tx = optax.sgd(lr, momentum=mom, nesterov=True)
    opt_state = tx.init(params)

    def to_cl(a):
        return jnp.asarray(np.transpose(a, (0, 2, 3, 4, 1)))

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = ours.apply(
                {"params": p}, x, train=False
            ).reshape(-1)
            return jnp.mean(
                optax.sigmoid_binary_cross_entropy(logits, y)
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(n_steps):
        sl = slice(i * batch, (i + 1) * batch)
        params, opt_state, _ = step(
            params, opt_state, to_cl(tr_x[sl]), jnp.asarray(tr_y[sl])
        )

    @jax.jit
    def infer(params, x):
        return ours.apply({"params": params}, x, train=False)

    j_logits = np.asarray(infer(params, to_cl(te_x))).reshape(-1)
    j_auc = roc_auc_score(te_y, j_logits)

    assert t_auc > 0.8, f"reference failed to learn (auc {t_auc:.3f})"
    assert j_auc > 0.8, f"ours failed to learn (auc {j_auc:.3f})"
    assert abs(t_auc - j_auc) < 0.01, (
        f"converged AUC diverges: ref {t_auc:.4f} vs ours {j_auc:.4f}"
    )


def test_vit_identity_embed_weight_transfer(torch):
    """Reference ViT whose linear embedding is the IDENTITY (embedding_size
    == prod(patch_size) * in_channels -> parameter-free map_to_out,
    vit.py:533-537): the importer synthesizes the exact identity kernel for
    our Dense patch projection instead of returning a tree with a missing
    leaf."""
    import einops.layers.torch  # noqa: F401
    import jax.numpy as jnp

    from adell_mri_tpu.interop import import_reference_vit_state_dict
    from adell_mri_tpu.models.classification.nets import ViTClassifier

    _ref_module("adell_mri.modules.segmentation.unet")
    ref_c = _ref_module(
        "adell_mri.modules.classification.classification.classification"
    )
    torch.manual_seed(3)
    ref = ref_c.ViTClassifier(
        n_classes=2,
        use_class_token=True,
        image_size=[16, 16, 8],
        patch_size=[4, 4, 4],
        in_channels=1,
        number_of_blocks=2,
        attention_dim=64,
        hidden_dim=64,
        embedding_size=64,  # == 4*4*4*1: identity map_to_out
        n_heads=4,
        dropout_rate=0.0,
        mlp_structure=[128],
    )
    ref.eval()
    assert not any(
        k.startswith("embedding.map_to_out")
        for k in ref.state_dict()
    ), "fixture must hit the identity-embed branch"
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(0.02 * torch.randn_like(p))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = import_reference_vit_state_dict(sd, n_heads=4, n_blocks=2)
    ours = ViTClassifier(
        patch_size=(4, 4, 4),
        n_classes=2,
        embed_dim=64,
        n_blocks=2,
        n_heads=4,
        mlp_structure=(128,),
        use_class_token=True,
    )
    x = np.random.default_rng(9).normal(size=(2, 1, 16, 16, 8)).astype(
        np.float32
    )
    with torch.no_grad():
        theirs = ref(torch.as_tensor(x)).numpy()
    got = np.asarray(
        ours.apply({"params": params}, jnp.asarray(np.moveaxis(x, 1, -1)))
    )
    assert np.abs(got - theirs).max() < 2e-5, (
        f"max dev {np.abs(got - theirs).max()}"
    )


def test_interop_strict_rejects_truncated_structure(torch):
    """strict=True must refuse to silently drop trained weights (review
    r3): a resnet_structure smaller than the checkpoint leaves unmapped
    res_net.* keys (ValueError), and a projection-head width that
    disagrees with the checkpoint's trailing norm raises instead of
    shipping an untransferred layer."""
    import pytest as _pytest

    from adell_mri_tpu.interop import (
        import_reference_catnet,
        import_reference_resnet,
    )

    _ref_module("adell_mri.modules.segmentation.unet")
    ref_c = _ref_module(
        "adell_mri.modules.classification.classification.classification"
    )
    ref_rn = _ref_module("adell_mri.modules.layers.res_net")
    ref_adn = _ref_module("adell_mri.modules.layers.adn_fn")

    structure = [(4, 4, 3, 1), (8, 8, 3, 2)]
    adn_t = ref_adn.get_adn_fn(3, "instance", "prelu", 0.0)
    torch.manual_seed(23)
    cat = ref_c.CatNet(
        spatial_dimensions=3,
        in_channels=1,
        n_classes=2,
        resnet_structure=structure,
        maxpool_structure=[2, 2],
        adn_fn=adn_t,
    )
    sd = {k: v.numpy() for k, v in cat.state_dict().items()}
    with _pytest.raises(ValueError, match="unmapped"):
        import_reference_catnet(
            sd, resnet_structure=structure[:1], norm_type="instance"
        )

    adn_h_t = ref_adn.get_adn_fn(1, "layer", "prelu", 0.0)
    res = ref_rn.ResNet(
        backbone_args=dict(
            spatial_dim=3, in_channels=1, structure=structure, adn_fn=adn_t
        ),
        projection_head_args=dict(
            in_channels=8, structure=[8, 6, 4], adn_fn=adn_h_t
        ),
    )
    sd = {k: v.numpy() for k, v in res.state_dict().items()}
    with _pytest.raises(ValueError, match="trailing norm"):
        import_reference_resnet(
            sd,
            structure=structure,
            projection_head_structure=[8, 6, 3],
            norm_type="instance",
            head_norm_type="layer",
        )


def test_resnet_unit_weight_transfer_parity(torch):
    """conv_type='resnet' mapping at the UNIT level (mapping.res_block /
    res_unit): the reference ResidualBlock2d/3d at stride 1 must produce
    identical outputs through our ResidualBlock after import — both the
    plain (inter=None) and bottleneck (inter>32) variants, with and
    without the channel projection. (Whole-net resnet parity is
    geometry-limited: the reference's strided MaxPool padding yields
    n/2+1 grids which its own decoder re-interpolates away; our static
    shapes keep the exact halving — models/segmentation/unet.py
    _ConvUnit docstring.)"""
    import jax
    import jax.numpy as jnp

    from adell_mri_tpu.interop.mapping import _Mapper
    from adell_mri_tpu.models.layers.adn import get_adn_fn
    from adell_mri_tpu.models.layers.res_blocks import ResidualBlock

    res_mod = _ref_module("adell_mri.modules.layers.res_blocks")
    adn_mod = _ref_module("adell_mri.modules.layers.adn_fn")

    for in_ch, inter, out_ch in [
        (16, None, 16),     # plain, no projection (the link config)
        (16, None, 32),     # plain + projection
        (48, 48, 24),       # bottleneck + projection (encoder deep levels)
    ]:
        torch.manual_seed(in_ch)
        ref = res_mod.ResidualBlock3d(
            in_ch,
            3,
            inter_channels=inter,
            out_channels=out_ch,
            adn_fn=adn_mod.get_adn_fn(3, "instance", "swish", 0.0),
        ).eval()
        rng = np.random.default_rng(in_ch)
        x = rng.normal(size=(2, in_ch, 8, 8, 4)).astype(np.float32)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x)).numpy()

        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        m = _Mapper(sd, "instance", "swish", strict=True)
        m.res_block(
            "", ("blk",), inter=inter is not None, project=in_ch != out_ch
        )
        # res_block prefixes keys with "{tprefix}." — strip the leading dot
        params = {"blk": m.params["blk"]} if "blk" in m.params else m.params

        ours = ResidualBlock(
            kernel_size=3,
            inter_channels=inter,
            out_channels=out_ch,
            adn_fn=get_adn_fn(3, "instance", "swish", 0.0),
            name="blk",
        )
        x_cl = np.transpose(x, (0, 2, 3, 4, 1))

        class _Wrap:
            pass

        import flax.linen as nn

        class W(nn.Module):
            @nn.compact
            def __call__(self, x):
                return ResidualBlock(
                    kernel_size=3,
                    inter_channels=inter,
                    out_channels=out_ch,
                    adn_fn=get_adn_fn(3, "instance", "swish", 0.0),
                    name="blk",
                )(x, train=False)

        w = W()
        init_p = w.init(jax.random.PRNGKey(0), jnp.asarray(x_cl))["params"]
        got_shapes = jax.tree.map(np.shape, params)
        ref_shapes = jax.tree.map(jnp.shape, init_p)
        assert got_shapes == ref_shapes, (got_shapes, ref_shapes)
        out = w.apply({"params": params}, jnp.asarray(x_cl))
        our_out = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
        np.testing.assert_allclose(our_out, ref_out, atol=2e-5)


def test_resnet_unet_import_shape_compat(ref_unet_mod, torch):
    """Full u-net-3d-resnet.yaml-style import (conv_type=resnet +
    residual links): every reference parameter maps (strict mode) and the
    imported tree matches our model's own init structure exactly."""
    import jax
    import jax.numpy as jnp

    from adell_mri_tpu.interop import import_reference_unet_state_dict
    from adell_mri_tpu.models.segmentation.unet import UNet

    depth = [16, 32, 64]
    torch.manual_seed(0)
    ref = ref_unet_mod.UNet(
        spatial_dimensions=3,
        conv_type="resnet",
        link_type="residual",
        upscale_type="transpose",
        norm_type="instance",
        dropout_param=0.0,
        activation_fn=torch.nn.SiLU,
        in_channels=1,
        n_classes=2,
        depth=depth,
        kernel_sizes=[3, 3, 3],
        strides=[2, 2, 2],
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    imported = import_reference_unet_state_dict(
        sd,
        depth=depth,
        conv_type="resnet",
        link_type="residual",
        upscale_type="transpose",
        norm_type="instance",
        activation_fn="swish",
    )
    ours = UNet(
        spatial_dimensions=3,
        conv_type="resnet",
        link_type="residual",
        upscale_type="transpose",
        norm_type="instance",
        dropout_param=0.0,
        activation_fn="swish",
        in_channels=1,
        n_classes=2,
        depth=depth,
        kernel_sizes=[3, 3, 3],
        strides=[2, 2, 2],
    )
    x = jnp.zeros((1, 16, 16, 8, 1), jnp.float32)
    init_p = ours.init(jax.random.PRNGKey(0), x, train=False)["params"]
    got = jax.tree.map(np.shape, imported["params"])
    want = jax.tree.map(jnp.shape, init_p)
    assert got == want
    out = ours.apply({"params": imported["params"]}, x, train=False)
    assert np.all(np.isfinite(np.asarray(out[0])))


def test_convnext_backbone_weight_transfer_parity(torch):
    """Reference ConvNeXtBackbone -> our ConvNeXtBackbone(downsample=
    'maxpool'): same weights, same features, exact to float noise.
    Covers the stage-transition parity fixes (maxpool mode, pwconv1 at
    the structure's inter width, GELU after the channel projection)."""
    import jax
    import jax.numpy as jnp

    from adell_mri_tpu.interop.torch_convnext import (
        import_reference_convnext_backbone,
    )
    from adell_mri_tpu.models.layers.conv_next import ConvNeXtBackbone

    cm = _ref_module("adell_mri.modules.layers.conv_next")
    structure = [[8, 16, 5, 2], [16, 24, 3, 2]]
    torch.manual_seed(3)
    ref = cm.ConvNeXtBackbone(
        spatial_dim=3,
        in_channels=1,
        structure=structure,
        maxpool_structure=[[2, 2, 2], [2, 2, 1]],
        first_layer_stride=2,
    ).eval()
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 1, 16, 16, 8)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    imported = import_reference_convnext_backbone(sd, structure=structure)

    ours = ConvNeXtBackbone(
        structure=structure,
        maxpool_structure=[[2, 2, 2], [2, 2, 1]],
        first_layer_stride=2,
        downsample="maxpool",
    )
    x_cl = np.transpose(x, (0, 2, 3, 4, 1))
    init_p = ours.init(jax.random.PRNGKey(0), jnp.asarray(x_cl))["params"]
    got = jax.tree.map(np.shape, imported["params"])
    want = jax.tree.map(jnp.shape, init_p)
    assert got == want, (got, want)
    out = ours.apply({"params": imported["params"]}, jnp.asarray(x_cl))
    our_out = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(our_out, ref_out, atol=3e-5)


def test_unetr_weight_transfer_forward_parity(torch):
    """Reference UNETR -> our UNETRRef compat module
    (interop/torch_unetr.py): same weights, same volume, same output —
    covers the ViT subtree (linear no-projection embedding +
    attention_dim stack), the rearrange_rescale token stacking, the
    reconstruction ladders, and the inherited UNet decoder with
    residual links."""
    import einops.layers.torch  # noqa: F401 (reference uses bare import)
    import jax
    import jax.numpy as jnp

    from adell_mri_tpu.interop import import_reference_unetr_state_dict
    from adell_mri_tpu.models.segmentation.unetr import UNETRRef

    um = _ref_module("adell_mri.modules.segmentation.unetr")
    torch.manual_seed(11)
    depth = [8, 16, 24]
    ref = um.UNETR(
        image_size=[32, 32, 16],
        patch_size=[8, 8, 8],
        number_of_blocks=4,
        return_at=[1, 2],
        attention_dim=64,
        hidden_dim=64,
        n_heads=4,
        mlp_structure=[64],
        spatial_dimensions=3,
        in_channels=1,
        n_classes=2,
        depth=depth,
        kernel_sizes=[3, 3, 3],
        conv_type="regular",
        link_type="residual",
        upscale_type="transpose",
        interpolation="trilinear",
        norm_type="instance",
        padding=1,
        dropout_rate=0.0,
        dropout_param=0.0,
        activation_fn=torch.nn.SiLU,
    ).eval()
    rng = np.random.default_rng(11)
    x = rng.normal(size=(2, 1, 32, 32, 16)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))[0].numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    imported = import_reference_unetr_state_dict(
        sd,
        depth=depth,
        n_blocks=4,
        n_heads=4,
        return_at=[1, 2],
        link_type="residual",
        norm_type="instance",
        activation_fn="swish",
    )
    ours = UNETRRef(
        image_size=(32, 32, 16),
        patch_size=(8, 8, 8),
        n_blocks=4,
        return_at=(1, 2),
        n_heads=4,
        attention_dim=64,
        mlp_structure=(64,),
        depth=depth,
        norm_type="instance",
        activation_fn="swish",
        dropout_param=0.0,
        link_type="residual",
        n_classes=2,
    )
    x_cl = np.transpose(x, (0, 2, 3, 4, 1))
    init_p = ours.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(x_cl)
    )["params"]
    got = jax.tree.map(np.shape, imported["params"])
    want = jax.tree.map(jnp.shape, init_p)
    assert got == want, {
        "missing": sorted(set(map(str, jax.tree_util.tree_leaves_with_path(want)[0:0])))
        or [k for k in want if k not in got]
        + [k for k in got if k not in want],
    }
    out, _ = ours.apply({"params": imported["params"]}, jnp.asarray(x_cl))
    our_out = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(our_out, ref_out, atol=3e-5)


@pytest.mark.parametrize(
    "embed_method,embedding_size,link_type,strides,depth,shift_sizes",
    [
        ("linear", [8, 16, 32], "identity", [[2, 2, 1], 2, 2],
         [8, 16, 32], [0, 1]),
        ("convolutional", [8, 16, 32], "conv", [2, 2, 2],
         [8, 16, 32], [0, 1]),
        ("linear", None, "residual", [2, 2], [8, 16], [0, 1, 1]),
    ],
)
def test_swin_weight_transfer_forward_parity(
    torch, embed_method, embedding_size, link_type, strides, depth,
    shift_sizes,
):
    """Reference SWINUNet -> our SWINUNetRef bug-compatible module
    (interop/torch_swin.py): same weights, same volume, same output.
    Exercises the shifted-window stacks (incl. the roll-discard and
    transposed-mask quirks the compat module reproduces — see
    models/segmentation/swin_ref.py), projecting and parameter-free
    embeddings, conv patchify, irregular strides, the reconstruction
    ops with channels-first LayerNorms, and the inherited decoder with
    identity/conv/residual links.

    in_channels=2: at in_channels=1 the first reconstruction ladder is
    DEGENERATE in both frameworks (a 1-channel LayerNorm collapses the
    field to its bias; the downstream instance norms then amplify f32
    mean-rounding of a constant by rsqrt(eps) ~ 316), so single-channel
    forwards agree only to ~1e-2 of framework-specific noise — a
    conditioning artifact of fresh inits, not a semantics gap (trained
    multi-channel checkpoints are well-conditioned)."""
    import einops.layers.torch  # noqa: F401
    import jax
    import jax.numpy as jnp

    from adell_mri_tpu.interop import import_reference_swin_state_dict
    from adell_mri_tpu.models.segmentation.swin_ref import SWINUNetRef

    um = _ref_module("adell_mri.modules.segmentation.unetr")
    torch.manual_seed(5)
    ref = um.SWINUNet(
        image_size=[16, 16, 16],
        patch_size=[2, 2, 2],
        window_size=[8, 8, 8],
        shift_sizes=shift_sizes,
        embedding_size=embedding_size,
        n_heads=4,
        dropout_rate=0.0,
        embed_method=embed_method,
        mlp_structure=[32, 32],
        spatial_dimensions=3,
        conv_type="regular",
        link_type=link_type,
        upscale_type="transpose",
        interpolation="trilinear",
        norm_type="instance",
        dropout_param=0.0,
        padding=1,
        activation_fn=torch.nn.SiLU,
        in_channels=2,
        n_classes=2,
        depth=depth,
        kernel_sizes=[3] * len(depth),
        strides=strides,
    ).eval()
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 2, 16, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))[0].numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    # arg_compliance already normalized ref.shift_sizes to per-stage lists
    n_stack = [len(s) for s in ref.shift_sizes]
    imported = import_reference_swin_state_dict(
        sd,
        depth=depth,
        n_stack_blocks=n_stack,
        link_type=link_type,
        norm_type="instance",
        activation_fn="swish",
    )
    ours = SWINUNetRef(
        image_size=(16, 16, 16),
        patch_size=(2, 2, 2),
        window_size=(8, 8, 8),
        shift_sizes=shift_sizes,
        depth=tuple(depth),
        strides=strides,
        embedding_size=embedding_size,
        n_heads=4,
        mlp_structure=(32, 32),
        embed_method=embed_method,
        norm_type="instance",
        activation_fn="swish",
        dropout_param=0.0,
        dropout_rate=0.0,
        link_type=link_type,
        kernel_sizes=[3] * len(depth),
        n_classes=2,
        in_channels=2,
    )
    x_cl = np.transpose(x, (0, 2, 3, 4, 1))
    init_p = ours.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(x_cl)
    )["params"]
    got = jax.tree.map(np.shape, imported["params"])
    want = jax.tree.map(jnp.shape, init_p)
    assert got == want
    out, _ = ours.apply({"params": imported["params"]}, jnp.asarray(x_cl))
    our_out = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(our_out, ref_out, atol=1e-4)


def test_swin_import_torch_checkpoint_cli_roundtrip(torch, tmp_path):
    """REFERENCE SWINUNet torch checkpoint -> `utils
    import_torch_checkpoint --net_type swin` -> `segmentation predict`
    consumes the orbax dir directly (the serving migration path the
    round-4 verdict item 4 demanded, CLI-driven end-to-end)."""
    import json as _json

    import einops.layers.torch  # noqa: F401

    from adell_mri_tpu.__main__ import main as adell_main
    from adell_mri_tpu.data.nifti import write_nifti

    um = _ref_module("adell_mri.modules.segmentation.unetr")
    torch.manual_seed(9)
    ref = um.SWINUNet(
        image_size=[16, 16, 8],
        patch_size=[2, 2, 2],
        window_size=[8, 8, 4],
        shift_sizes=[0, 1],
        embedding_size=[8, 16],
        n_heads=4,
        dropout_rate=0.0,
        embed_method="linear",
        mlp_structure=[16],
        spatial_dimensions=3,
        conv_type="regular",
        link_type="identity",
        upscale_type="transpose",
        interpolation="trilinear",
        norm_type="instance",
        dropout_param=0.0,
        padding=1,
        activation_fn=torch.nn.SiLU,
        in_channels=1,
        n_classes=2,
        depth=[8, 16],
        kernel_sizes=[3, 3],
        strides=[2, 2],
    )
    pt = tmp_path / "ref_swin.ckpt"
    torch.save({"state_dict": ref.state_dict()}, str(pt))

    yaml_path = tmp_path / "swin.yaml"
    yaml_path.write_text(
        "patch_size: [2, 2, 2]\n"
        "window_size: [8, 8, 4]\n"
        "shift_sizes: [0, 1]\n"
        "embedding_size: [8, 16]\n"
        "n_heads: 4\n"
        "mlp_structure: [16]\n"
        "depth: [8, 16]\n"
        "kernel_sizes: [3, 3]\n"
        "strides: [2, 2]\n"
        "link_type: identity\n"
        "upscale_type: transpose\n"
        "norm_type: instance\n"
        "activation_fn: swish\n"
        "batch_size: 2\n"
        "learning_rate: 0.001\n"
    )
    rng = np.random.default_rng(0)
    ds = {}
    aff = np.diag([1.0, 1.0, 1.0, 1.0])
    for i in range(2):
        vol = rng.normal(500, 100, size=(16, 16, 8)).astype(np.float32)
        path = tmp_path / f"v{i}.nii.gz"
        write_nifti(str(path), vol, affine=aff)
        ds[f"case_{i}"] = {"image": str(path)}
    ds_path = tmp_path / "ds.json"
    ds_path.write_text(_json.dumps(ds))

    ckpt_dir = tmp_path / "imported"
    adell_main(
        [
            "utils", "import_torch_checkpoint",
            "--input_path", str(pt),
            "--config_file", str(yaml_path),
            "--net_type", "swin",
            "--checkpoint_dir", str(ckpt_dir),
            "--image_keys", "image",
            "--target_size", "16", "16", "8",
            "--target_spacing", "1", "1", "1",
            "--n_classes", "2",
        ]
    )
    out_dir = tmp_path / "preds"
    adell_main(
        [
            "segmentation", "predict",
            "--dataset_json", str(ds_path),
            "--checkpoint_dir", str(ckpt_dir),
            "--output_path", str(out_dir),
            "--dev", "cpu",
        ]
    )
    import os as _os

    outs = sorted(_os.listdir(out_dir))
    assert len(outs) >= 2


@pytest.mark.parametrize(
    "conv_type,flax_conv_type",
    [
        ("depthwise", "depthwise_ref"),
        ("sae", "sae_ref"),
        ("asp", "asp_ref"),
    ],
)
def test_unet_conv_type_weight_transfer_parity(
    torch, conv_type, flax_conv_type
):
    """Reference UNet conv_type depthwise/sae/asp -> our reference-compat
    _ConvUnit variants (interop/torch_unet.py, round-4 verdict item 5):
    same weights, same volume, same output. Covers the reference quirks
    these variants reproduce — the depthwise block's POINTWISE conv
    inherits the block padding, so strided downsamples zero-pad the
    volume back out (unet.py:292-307 + init_encoder :566); the asp
    encoder's ASPP ignores kernel/stride entirely and so never
    downsamples, its decoder center-cropping the overshoot away
    (unet.py:407-413, forward :810-816); sae's scSE sums the spatial and
    channel gates with an unbottlenecked channel MLP
    (self_attention.py:40-149)."""
    import einops.layers.torch  # noqa: F401
    import jax
    import jax.numpy as jnp

    from adell_mri_tpu.interop import import_reference_unet_state_dict
    from adell_mri_tpu.models.segmentation.unet import UNet

    um = _ref_module("adell_mri.modules.segmentation.unet")
    torch.manual_seed(4)
    depth = [8, 16, 24]
    ref = um.UNet(
        spatial_dimensions=3,
        conv_type=conv_type,
        link_type="conv",
        upscale_type="transpose",
        interpolation="trilinear",
        norm_type="instance",
        dropout_param=0.0,
        activation_fn=torch.nn.SiLU,
        in_channels=2,
        n_classes=2,
        depth=depth,
        kernel_sizes=[3, 3, 3],
        strides=[2, 2, 2],
        padding="same",
    ).eval()
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 2, 16, 16, 12)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))[0].numpy()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    imported = import_reference_unet_state_dict(
        sd,
        depth=depth,
        conv_type=conv_type,
        link_type="conv",
        upscale_type="transpose",
        norm_type="instance",
        activation_fn="swish",
        in_channels=2,
    )
    ours = UNet(
        spatial_dimensions=3,
        conv_type=flax_conv_type,
        link_type="conv",
        upscale_type="transpose",
        interpolation="linear",
        norm_type="instance",
        dropout_param=0.0,
        activation_fn="swish",
        in_channels=2,
        n_classes=2,
        depth=depth,
        kernel_sizes=[3, 3, 3],
        strides=[2, 2, 2],
    )
    x_cl = np.transpose(x, (0, 2, 3, 4, 1))
    init_p = ours.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(x_cl)
    )["params"]
    got = jax.tree.map(np.shape, imported["params"])
    want = jax.tree.map(jnp.shape, init_p)
    assert got == want
    out = ours.apply({"params": imported["params"]}, jnp.asarray(x_cl))[0]
    our_out = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(our_out, ref_out, atol=1e-4)


def test_unetr_projecting_embedding_weight_transfer_parity(torch):
    """Reference UNETR with embedding_size SET (projecting embedding:
    map_to_out LayerNorm+Linear into the transformer, map_to_in Linears
    back out — the ViT embedding's own for the bottleneck, per-skip
    ``rescalers`` for the skips, whose map_to_out Linears the reference
    builds but never runs; unetr.py:253-272, vit.py:521-537) -> our
    UNETRRef with embedding_size (round-4 verdict item 5)."""
    import einops.layers.torch  # noqa: F401
    import jax
    import jax.numpy as jnp

    from adell_mri_tpu.interop import import_reference_unetr_state_dict
    from adell_mri_tpu.models.segmentation.unetr import UNETRRef

    um = _ref_module("adell_mri.modules.segmentation.unetr")
    torch.manual_seed(11)
    depth = [8, 16, 24]
    ref = um.UNETR(
        image_size=[32, 32, 16],
        patch_size=[8, 8, 8],
        number_of_blocks=4,
        return_at=[1, 2],
        attention_dim=64,
        hidden_dim=64,
        embedding_size=64,
        n_heads=4,
        mlp_structure=[64],
        spatial_dimensions=3,
        in_channels=1,
        n_classes=2,
        depth=depth,
        kernel_sizes=[3, 3, 3],
        conv_type="regular",
        link_type="residual",
        upscale_type="transpose",
        interpolation="trilinear",
        norm_type="instance",
        padding=1,
        dropout_rate=0.0,
        dropout_param=0.0,
        activation_fn=torch.nn.SiLU,
    ).eval()
    rng = np.random.default_rng(11)
    x = rng.normal(size=(2, 1, 32, 32, 16)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))[0].numpy()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    imported = import_reference_unetr_state_dict(
        sd,
        depth=depth,
        n_blocks=4,
        n_heads=4,
        return_at=[1, 2],
        link_type="residual",
        norm_type="instance",
        activation_fn="swish",
    )
    ours = UNETRRef(
        image_size=(32, 32, 16),
        patch_size=(8, 8, 8),
        n_blocks=4,
        return_at=(1, 2),
        n_heads=4,
        attention_dim=64,
        embedding_size=64,
        mlp_structure=(64,),
        depth=depth,
        norm_type="instance",
        activation_fn="swish",
        dropout_param=0.0,
        link_type="residual",
        n_classes=2,
    )
    x_cl = np.transpose(x, (0, 2, 3, 4, 1))
    init_p = ours.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(x_cl)
    )["params"]
    got = jax.tree.map(np.shape, imported["params"])
    want = jax.tree.map(jnp.shape, init_p)
    assert got == want
    out, _ = ours.apply({"params": imported["params"]}, jnp.asarray(x_cl))
    our_out = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(our_out, ref_out, atol=1e-4)
