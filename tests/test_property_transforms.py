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


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    angle=st.floats(-0.25, 0.25),
    scale=st.floats(0.9, 1.1),
    tx=st.floats(-2.0, 2.0),
)
def test_warps_reproduce_linear_functions(seed, angle, scale, tx):
    """Analytic oracle for BOTH warp paths: linear interpolation
    reproduces affine-linear functions exactly, so warping
    f(v) = a . v + b through any matrix must yield a . (M @ o) + b at
    every in-bounds output voxel — for the gather warp AND the
    shear-decomposed separable warp (which the augment pipeline uses on
    TPU; transforms/pipeline.py)."""
    from adell_mri_tpu.transforms.spatial import (
        separable_max_shift,
        warp_affine_separable,
    )

    rng = np.random.default_rng(seed)
    shape = (16, 18, 12)
    a = rng.uniform(-1, 1, size=3).astype(np.float32)
    b = np.float32(rng.uniform(-5, 5))
    idx = np.stack(
        np.meshgrid(*[np.arange(s) for s in shape], indexing="ij"), -1
    ).astype(np.float32)
    vol = jnp.asarray((idx @ a + b)[..., None])

    c, s = np.cos(angle), np.sin(angle)
    mat = np.eye(4, dtype=np.float32)
    mat[:2, :2] = np.asarray([[c, -s], [s, c]]) * scale
    mat[2, 2] = scale
    mat[0, 3] = tx
    matj = jnp.asarray(mat)

    # expected: f at the SAMPLE coordinates M @ o
    coords = np.concatenate([idx, np.ones(shape + (1,), np.float32)], -1)
    sample_pts = coords @ mat.T
    expected = sample_pts[..., :3] @ a + b
    # only score voxels whose sample point is strictly interior (border
    # voxels blend with cval)
    interior = np.all(
        (sample_pts[..., :3] >= 0.5)
        & (sample_pts[..., :3] <= np.asarray(shape) - 1.5),
        axis=-1,
    )
    assert interior.sum() > 100

    got = np.asarray(warp_affine(vol, matj))[..., 0]
    np.testing.assert_allclose(
        got[interior], expected[interior], atol=5e-3
    )

    ms = int(separable_max_shift(shape, abs(angle), 0.0)) + 4
    got_sep = np.asarray(
        warp_affine_separable(vol, matj, max_shift=ms)
    )[..., 0]
    # the shear passes traverse intermediate volumes whose borders carry
    # cval; restrict to a deeper interior for the separable path
    deep = np.all(
        (sample_pts[..., :3] >= 4.0)
        & (sample_pts[..., :3] <= np.asarray(shape) - 5.0),
        axis=-1,
    )
    if deep.sum() > 50:
        np.testing.assert_allclose(
            got_sep[deep], expected[deep], atol=5e-2
        )


@settings(max_examples=10, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    neg=st.booleans(),
)
def test_fused_intensity_identity_when_off(seed, neg):
    """fused_intensity_aug_batch with every knob at its neutral value is
    the IDENTITY — including on negative voxels (a past bug: sigma=0
    rectified negatives to |x| through the Rician magnitude)."""
    import jax

    from adell_mri_tpu.ops.pallas.intensity import fused_intensity_aug_batch

    rng = np.random.default_rng(seed)
    x = rng.normal(size=(2, 6, 6, 4, 1)).astype(np.float32)
    if neg:
        x = -np.abs(x)
    out = fused_intensity_aug_batch(
        jax.random.PRNGKey(seed),
        jnp.asarray(x),
        gamma_range=(1.0, 1.0),
        scale_delta=0.0,
        shift_delta=0.0,
        sigma=0.0,
        rician=True,
    )
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-5)


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_gibbs_alpha_one_keeps_volume(seed):
    """gibbs_ringing's alpha is the fraction of spectrum RETAINED (the
    inverse of MONAI's convention): alpha=1 keeps all of k-space and must
    return the volume unchanged up to FFT round-trip error, and any
    alpha<1 must actually remove energy."""
    import jax

    from adell_mri_tpu.transforms.intensity import gibbs_ringing

    rng = np.random.default_rng(seed)
    x = rng.normal(size=(8, 8, 4, 1)).astype(np.float32)
    out = gibbs_ringing(
        jax.random.PRNGKey(seed), jnp.asarray(x), alpha_range=(1.0, 1.0)
    )
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-4)
    cut = gibbs_ringing(
        jax.random.PRNGKey(seed), jnp.asarray(x), alpha_range=(0.5, 0.5)
    )
    assert float(np.abs(np.asarray(cut) - x).max()) > 1e-3


def test_augment_fire_probability_matches_reference():
    """Per-op gating: the reference fires every Rand*d at prob=0.2
    (augmentations.py:51). With the default policy, the fraction of
    samples actually WARPED (affine) must sit near 0.2 — not 1.0 (the
    pre-parity behavior) — and prob=1.0 warps every sample."""
    import jax

    from adell_mri_tpu.transforms.pipeline import AugmentPolicy, _augment_one

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.normal(size=(12, 12, 8, 1)), jnp.float32)

    def changed_fraction(policy, n=300):
        keys = jax.random.split(jax.random.PRNGKey(0), n)

        def one(k):
            out, _ = _augment_one(k, img, None, policy)
            return (jnp.abs(out - img).max() > 1e-4).astype(jnp.float32)

        return float(jnp.mean(jax.vmap(one)(keys)))

    base = dict(
        intensity=False, noise=False, flip=False, affine=True,
        translate_range=0.3,
    )
    frac_default = changed_fraction(AugmentPolicy(**base))
    assert 0.1 < frac_default < 0.33, frac_default
    frac_always = changed_fraction(AugmentPolicy(**base, prob=1.0), n=50)
    assert frac_always > 0.95, frac_always


def test_intensity_fire_probability():
    """The fused intensity pass gates gamma/shift/noise per sample at the
    policy prob; neutral samples are bit-identical to the input."""
    import jax

    from adell_mri_tpu.ops.pallas.intensity import fused_intensity_aug_batch

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((400, 4, 4, 2, 1)), jnp.float32)
    out = fused_intensity_aug_batch(
        jax.random.PRNGKey(1),
        x,
        gamma_range=(0.5, 1.5),
        scale_delta=0.0,
        shift_delta=0.1,
        sigma=0.02,
        rician=True,
        gamma_prob=0.2,
        shift_prob=0.2,
        noise_prob=0.2,
        std_shift=True,
    )
    changed = np.asarray(
        jnp.abs(out - x).reshape(x.shape[0], -1).max(axis=1) > 1e-6
    )
    # P(any of three independent 0.2 gates fires) = 1 - 0.8^3 = 0.488
    assert 0.35 < changed.mean() < 0.62, changed.mean()
