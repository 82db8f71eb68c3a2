"""On-device transform engine tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adell_mri_tpu.transforms import (
    AugmentPolicy,
    AugmentationWorkhorse,
    SegmentationTransforms,
    SSLTransforms,
)
from adell_mri_tpu.transforms import intensity as I
from adell_mri_tpu.transforms import spatial as S

KEY = jax.random.PRNGKey(0)
VOL = jax.random.normal(KEY, (16, 16, 8, 1))
LAB = jnp.zeros((16, 16, 8)).at[4:8, 4:8, 2:5].set(1.0)


def test_identity_warp_exact():
    out = S.warp_affine(VOL, jnp.eye(4))
    np.testing.assert_allclose(np.asarray(out), np.asarray(VOL), atol=1e-5)


def test_warp_matches_scipy():
    from scipy import ndimage

    mat = np.eye(4)
    mat[:3, :3] += np.random.default_rng(0).normal(scale=0.05, size=(3, 3))
    mat[:3, 3] = [0.5, -1.0, 0.3]
    ours = S.warp_affine(VOL, jnp.asarray(mat))[..., 0]
    ref = ndimage.affine_transform(
        np.asarray(VOL)[..., 0], mat[:3, :3], offset=mat[:3, 3], order=1
    )
    # interior must agree (border handling differs at exact edges)
    np.testing.assert_allclose(
        np.asarray(ours)[2:-2, 2:-2, 2:-2], ref[2:-2, 2:-2, 2:-2], atol=1e-4
    )


def test_pos_neg_crop_contains_fg():
    fg = np.argwhere(np.asarray(LAB) > 0)
    pad = np.zeros((128, 3), np.int32)
    pad[: len(fg)] = fg
    img, lab, _ = S.pos_neg_crop(
        KEY, VOL, LAB, (8, 8, 4), jnp.asarray(pad), jnp.int32(len(fg)), 1.0
    )
    assert img.shape == (8, 8, 4, 1)
    assert float(jnp.sum(lab)) > 0


def test_pos_neg_crop_no_fg_safe():
    img, lab, _ = S.pos_neg_crop(
        KEY,
        VOL,
        jnp.zeros((16, 16, 8)),
        (8, 8, 4),
        jnp.zeros((128, 3), jnp.int32),
        jnp.int32(0),
        1.0,
    )
    assert img.shape == (8, 8, 4, 1)


def test_random_flip_deterministic_key():
    a = S.random_flip(KEY, VOL, (0, 1))
    b = S.random_flip(KEY, VOL, (0, 1))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_conditional_rescale_adc():
    x = jnp.ones((4, 4, 2, 1)) * 2000.0
    out = I.conditional_rescale(x, max_value=1000.0, scaling_factor=-2 / 3)
    np.testing.assert_allclose(float(out[0, 0, 0, 0]), 2000 * -2 / 3, rtol=1e-5)
    x2 = jnp.ones((4, 4, 2, 1)) * 0.5
    out2 = I.conditional_rescale(x2, 1000.0, -2 / 3)
    np.testing.assert_allclose(float(out2[0, 0, 0, 0]), 0.5, rtol=1e-5)


def test_gibbs_preserves_shape_and_reduces_hf():
    smooth = I.gibbs_ringing(KEY, VOL, alpha_range=(0.3, 0.3))
    assert smooth.shape == VOL.shape
    # heavy truncation must reduce variance of differences (less HF energy)
    hf = lambda v: float(jnp.var(jnp.diff(v, axis=0)))
    assert hf(smooth) < hf(VOL)


def test_workhorse_jit_and_changes_input():
    wh = AugmentationWorkhorse(n_transforms=2, ndim=3)
    fn = jax.jit(wh)
    out = fn(KEY, VOL)
    assert out.shape == VOL.shape
    assert np.all(np.isfinite(np.asarray(out)))
    assert not np.allclose(np.asarray(out), np.asarray(VOL))
    # different keys -> different augs
    out2 = fn(jax.random.PRNGKey(42), VOL)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_segmentation_pipeline_batched():
    tr = SegmentationTransforms(
        crop_size=(8, 8, 4),
        augmentations=AugmentPolicy(noise=True, affine=True, flip=True),
        max_fg=64,
    )
    fg = np.zeros((2, 64, 3), np.int32)
    fg_single = np.argwhere(np.asarray(LAB) > 0)[:64]
    fg[:, : len(fg_single)] = fg_single
    batch = {
        "image": jnp.stack([VOL, VOL]),
        "label": jnp.stack([LAB, LAB]),
        "fg_indices": jnp.asarray(fg),
        "n_fg": jnp.asarray([len(fg_single)] * 2, jnp.int32),
    }
    out = jax.jit(tr.augment)(KEY, batch)
    assert out["image"].shape == (2, 8, 8, 4, 1)
    assert out["label"].shape == (2, 8, 8, 4)


def test_ssl_two_views():
    tr = SSLTransforms(crop_size=(8, 8, 4), n_transforms=1)
    batch = {"image": jnp.stack([VOL, VOL])}
    out = jax.jit(tr.augment)(KEY, batch)
    assert out["view1"].shape == (2, 8, 8, 4, 1)
    assert out["view2"].shape == (2, 8, 8, 4, 1)
    assert not np.allclose(np.asarray(out["view1"]), np.asarray(out["view2"]))


def test_augment_distort_and_lowres_wired():
    """distort composes an elastic displacement into the warp (label stays
    consistent: binary, same support size roughly); lowres smooths only the
    image. Both parse from flags."""
    from adell_mri_tpu.transforms.pipeline import (
        AugmentPolicy,
        SegmentationTransforms,
    )

    policy = AugmentPolicy.from_flags(
        ["distort", "lowres", "affine"],
        distort_prob=1.0,
        lowres_prob=1.0,
        flip_axes=(0,),
    )
    assert policy.distort and policy.lowres
    tf = SegmentationTransforms(augmentations=policy)
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 12, 12, 8, 1)).astype(np.float32)
    lab = np.zeros((2, 12, 12, 8), np.float32)
    lab[:, 4:8, 4:8, 2:6] = 1.0
    batch = {"image": jnp.asarray(img), "label": jnp.asarray(lab)}
    out = jax.jit(tf.augment)(jax.random.PRNGKey(0), batch)
    assert out["image"].shape == img.shape
    assert out["label"].shape == lab.shape
    # label stays binary under nearest-neighbour warp
    uniq = np.unique(np.asarray(out["label"]))
    assert set(uniq.tolist()) <= {0.0, 1.0}
    # the warped label still has foreground (small elastic field)
    assert np.asarray(out["label"]).sum() > 0
    # distort actually moved something vs identity policy
    identity = SegmentationTransforms(
        augmentations=AugmentPolicy(
            intensity=False, noise=False, affine=False, flip=False
        )
    )
    out_id = jax.jit(identity.augment)(jax.random.PRNGKey(0), batch)
    assert not np.allclose(np.asarray(out["image"]), np.asarray(out_id["image"]))


def test_pos_neg_crop_tracks_flip_geometry():
    """Regression: fg_indices are computed on the PRE-warp label; the crop
    must relocate them through the applied geometry. A corner blob under a
    flip-only policy lands at the far end — stale centers would miss it."""
    from adell_mri_tpu.transforms.host import precompute_fg_indices

    vol = jnp.zeros((48, 16, 8, 1)).at[1:4, 6:10, 2:5].set(1.0)
    lab = vol[..., 0]
    fg, n_fg = precompute_fg_indices(np.asarray(lab), max_fg=64)
    tr = SegmentationTransforms(
        crop_size=(8, 8, 4),
        augmentations=AugmentPolicy(
            intensity=False, noise=False, affine=False, flip=True,
            flip_axes=(0,),
        ),
        pos_ratio=1.0,
        max_fg=64,
    )
    b = 8
    batch = {
        "image": jnp.stack([vol] * b),
        "label": jnp.stack([lab] * b),
        "fg_indices": jnp.stack([jnp.asarray(fg)] * b),
        "n_fg": jnp.asarray([n_fg] * b, jnp.int32),
    }
    out = jax.jit(tr.augment)(jax.random.PRNGKey(3), batch)
    sums = np.asarray(out["label"]).sum(axis=(1, 2, 3))
    assert (sums > 0).all(), sums


def test_pos_neg_crop_tracks_affine_translation():
    """Same regression for the warp path: pure translations larger than the
    crop half-width must not break the pos_ratio=1 fg guarantee."""
    from adell_mri_tpu.transforms.host import precompute_fg_indices

    vol = jnp.zeros((48, 16, 8, 1)).at[22:26, 6:10, 2:5].set(1.0)
    lab = vol[..., 0]
    fg, n_fg = precompute_fg_indices(np.asarray(lab), max_fg=64)
    tr = SegmentationTransforms(
        crop_size=(8, 8, 4),
        augmentations=AugmentPolicy(
            intensity=False, noise=False, flip=False, affine=True,
            rotate_range=0.0, scale_range=0.0, translate_range=0.25,
        ),
        pos_ratio=1.0,
        max_fg=64,
    )
    b = 8
    batch = {
        "image": jnp.stack([vol] * b),
        "label": jnp.stack([lab] * b),
        "fg_indices": jnp.stack([jnp.asarray(fg)] * b),
        "n_fg": jnp.asarray([n_fg] * b, jnp.int32),
    }
    out = jax.jit(tr.augment)(jax.random.PRNGKey(7), batch)
    sums = np.asarray(out["label"]).sum(axis=(1, 2, 3))
    assert (sums > 0).all(), sums


def test_random_slices_default_axis():
    """Regression: axis=-2 must select the LAST SPATIAL axis of a
    channels-last volume (it used to normalize to W)."""
    vol = jnp.broadcast_to(
        jnp.arange(6, dtype=jnp.float32)[None, None, :, None], (4, 5, 6, 2)
    )
    lab = jnp.zeros((4, 5, 6)).at[:, :, 3].set(100.0)
    v, l = S.random_slices(jax.random.PRNGKey(0), vol, lab, n_slices=4)
    assert v.shape == (4, 5, 4, 2)
    # without-replacement (reference torch.multinomial semantics): the 4
    # drawn slices are DISTINCT and always include the fg slice (3)
    drawn = set(np.asarray(v)[0, 0, :, 0].tolist())
    assert len(drawn) == 4 and 3.0 in drawn
    with pytest.raises(ValueError):
        S.random_slices(jax.random.PRNGKey(0), vol, lab, 4, axis=-1)


def test_precompute_fg_indices_2d():
    from adell_mri_tpu.transforms.host import precompute_fg_indices

    lab = np.zeros((8, 8), np.float32)
    lab[2:4, 5:7] = 1.0
    fg, n = precompute_fg_indices(lab, max_fg=16)
    assert fg.shape == (16, 2) and n == 4
    fg0, n0 = precompute_fg_indices(np.zeros((8, 8), np.float32), max_fg=16)
    assert fg0.shape == (16, 2) and n0 == 0


def test_get_all_crops_undersized_axis():
    """Axes smaller than the crop size pad up instead of producing wrapped
    or short crops."""
    vol = jnp.ones((6, 10, 1))
    crops = S.get_all_crops(vol, (8, 4))
    assert crops.shape == (3, 8, 4, 1)
    assert np.isfinite(np.asarray(crops)).all()


def test_detection_grid_flip_respects_axes_and_dtype():
    """Regression: the grid-target flip path flipped EVERY spatial axis and
    leaked f32 from a bf16 input."""
    from adell_mri_tpu.transforms.pipeline import DetectionTransforms

    tr = DetectionTransforms(
        augmentations=AugmentPolicy(
            intensity=False, noise=False, affine=False, shear=False,
            flip=True, flip_axes=(0,),
        )
    )
    b = 4
    image = jnp.zeros((b, 8, 8, 4, 1), jnp.bfloat16).at[:, :, 0].set(1.0)
    batch = {
        "image": image,
        "objectness": jnp.zeros((b, 4, 4, 2, 1)),
        "center_offsets": jnp.full((b, 4, 4, 2, 3), 0.5),
        "sizes": jnp.ones((b, 4, 4, 2, 3)),
        "classes": jnp.zeros((b, 4, 4, 2, 2)),
    }
    out = jax.jit(tr.augment)(jax.random.PRNGKey(5), batch)
    assert out["image"].dtype == jnp.bfloat16
    # marker at W=0 is invariant to axis-0 flips; a (wrong) axis-1 flip
    # would move it to W=-1
    assert float(jnp.asarray(out["image"], jnp.float32)[:, :, 0].min()) == 1.0


def test_detection_boxes_path_preserves_dtype():
    from adell_mri_tpu.transforms.pipeline import DetectionTransforms

    tr = DetectionTransforms(
        augmentations=AugmentPolicy(
            intensity=False, noise=False, affine=True, flip=True,
        ),
        anchors=np.asarray([[4.0, 4.0, 2.0]]),
        grid_shape=(4, 4, 2),
        input_shape=(16, 16, 8),
        n_classes=2,
    )
    b = 2
    batch = {
        "image": jnp.ones((b, 16, 16, 8, 1), jnp.bfloat16),
        "boxes": jnp.asarray(
            np.tile(np.asarray([[2.0, 2, 1, 8, 8, 4]], np.float32), (b, 1, 1))
        ),
        "box_classes": jnp.zeros((b, 1), jnp.int32),
        "n_boxes": jnp.ones((b,), jnp.int32),
    }
    out = jax.jit(tr.augment)(jax.random.PRNGKey(1), batch)
    assert out["image"].dtype == jnp.bfloat16
    assert out["objectness"].shape[0] == b


def test_ssl_slice_2d_load_and_views(tmp_path):
    """2D SSL on 3D volumes: load takes ONE cache-frozen random slice
    (SSLTransforms n_dim==2 parity, transforms.py:680-688) and the two
    augmented views come out 2D at crop size."""
    from adell_mri_tpu.data import write_nifti
    from adell_mri_tpu.transforms.pipeline import SSLTransforms

    vol = np.stack(
        [np.full((20, 20), float(z), np.float32) for z in range(6)], -1
    )
    path = str(tmp_path / "v.nii.gz")
    write_nifti(path, vol, np.eye(4))
    tr = SSLTransforms(
        image_keys=["T2"], target_size=(16, 16), crop_size=(8, 8),
        slice_2d=True,
    )
    s = tr.load_fn()({"T2": path, "identifier": "a"})
    assert s["image"].shape == (16, 16, 1)
    # constant-per-slice input -> the loaded slice is one constant
    vals = np.unique(np.round(s["image"], 4))
    assert len(vals) <= 2  # slice constant (min-max scaled) + crop pad
    out = jax.jit(tr.augment)(
        jax.random.PRNGKey(0),
        {"image": jnp.asarray(s["image"])[None]},
    )
    assert out["view1"].shape == (1, 8, 8, 1)
    assert out["view2"].shape == (1, 8, 8, 1)
