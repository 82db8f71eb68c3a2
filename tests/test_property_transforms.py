"""
Property-based tests for the transform layer's self-implemented numerics:
crop tiling coverage, identity-warp exactness, crop/pad inversion, resize
constants, and affine box-transform inversion.
"""

import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from adell_mri_tpu.models.detection.anchors import transform_boxes_affine
from adell_mri_tpu.transforms.host import (
    area_resize,
    center_crop_pad,
    nearest_resize,
)
from adell_mri_tpu.transforms.spatial import get_all_crops, warp_affine


@settings(max_examples=20, deadline=None)
@given(
    shape=st.tuples(st.integers(3, 14), st.integers(3, 14), st.integers(2, 8)),
    size=st.tuples(st.integers(2, 6), st.integers(2, 6), st.integers(2, 4)),
)
def test_get_all_crops_covers_every_voxel(shape, size):
    """Every voxel of the (pad-adjusted) volume appears in >= 1 crop and
    every crop has exactly the requested size (GetAllCropsd contract)."""
    vol = jnp.arange(np.prod(shape), dtype=jnp.float32).reshape(
        shape + (1,)
    )
    crops = np.asarray(get_all_crops(vol, size))
    assert crops.shape[1:] == tuple(size) + (1,)
    seen = set(crops.ravel().tolist())
    expected = set(float(v) for v in np.arange(np.prod(shape)))
    # padding inserts zeros; every ORIGINAL voxel value must be covered
    assert expected <= seen


@settings(max_examples=15, deadline=None)
@given(
    shape=st.tuples(st.integers(2, 10), st.integers(2, 10), st.integers(2, 6)),
)
def test_identity_warp_is_exact(shape):
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=shape + (2,)), jnp.float32)
    out = warp_affine(vol, jnp.eye(4))
    np.testing.assert_allclose(np.asarray(out), np.asarray(vol), atol=1e-5)


@settings(max_examples=20, deadline=None)
@given(
    shape=st.tuples(st.integers(2, 12), st.integers(2, 12), st.integers(2, 8)),
    target=st.tuples(st.integers(2, 16), st.integers(2, 16), st.integers(2, 10)),
)
def test_center_crop_pad_shape_and_center(shape, target):
    """Output has the target shape; when padding (target >= shape) the
    original volume sits centered and a crop-back recovers it exactly."""
    rng = np.random.default_rng(1)
    vol = rng.normal(size=shape).astype(np.float32)
    out = center_crop_pad(vol, target)
    assert out.shape == tuple(target)
    if all(t >= s for t, s in zip(target, shape)):
        back = center_crop_pad(out, shape)
        np.testing.assert_array_equal(back, vol)


@settings(max_examples=15, deadline=None)
@given(
    shape=st.tuples(st.integers(2, 10), st.integers(2, 10), st.integers(2, 6)),
    out=st.tuples(st.integers(2, 12), st.integers(2, 12), st.integers(2, 8)),
    c=st.floats(-100, 100),
)
def test_resize_preserves_constants(shape, out, c):
    """area and nearest resizes of a constant volume stay that constant."""
    vol = np.full(shape, np.float32(c))
    np.testing.assert_allclose(
        area_resize(vol, out), np.full(out, np.float32(c)), rtol=1e-5,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        nearest_resize(vol, out), np.full(out, np.float32(c)), rtol=1e-5,
        atol=1e-4,
    )


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    angle=st.floats(-0.1, 0.1),
    tx=st.floats(-3, 3),
)
def test_transform_boxes_affine_inverts(seed, angle, tx):
    """Mapping boxes through a warp matrix then its inverse recovers the
    original boxes (up to the AABB-of-corners wrap, exact for rotations
    about the same center composed back). Boxes are kept far enough from
    the frame bounds that the (correct) frame clipping never engages —
    clipping is lossy by design, so inversion only holds in-frame."""
    rng = np.random.default_rng(seed)
    shape = (48, 48, 48)
    lo = rng.uniform(14, 24, size=(4, 3))
    hi = lo + rng.uniform(2, 6, size=(4, 3))
    boxes = jnp.asarray(np.concatenate([lo, hi], -1), jnp.float32)
    valid = jnp.ones((4,), bool)
    c, s = np.cos(angle), np.sin(angle)
    mat = np.eye(4)
    mat[:2, :2] = [[c, -s], [s, c]]
    mat[0, 3] = tx
    mat = jnp.asarray(mat, jnp.float32)
    fwd, v1 = transform_boxes_affine(boxes, mat, valid, shape)
    back, v2 = transform_boxes_affine(
        fwd, jnp.linalg.inv(mat), v1, shape
    )
    # pure-rotation AABB wrap only GROWS boxes; the round trip must contain
    # the original box and match exactly for the translation-only case
    back = np.asarray(back)
    orig = np.asarray(boxes)
    ok = np.asarray(v2)
    assert ok.any()
    nd = 3
    assert np.all(back[ok][:, :nd] <= orig[ok][:, :nd] + 1e-3)
    assert np.all(back[ok][:, nd:] >= orig[ok][:, nd:] - 1e-3)
    if abs(angle) < 1e-9:
        np.testing.assert_allclose(back[ok], orig[ok], atol=1e-3)
