"""
Property-based tests for the NIfTI codec (data/nifti.py) — the one binary
format we implement ourselves (the reference reads through nibabel inside
MONAI's LoadImaged). Invariants:

1. write -> read round-trips data, dtype family, and affine for any shape/
   dtype/affine combination.
2. reorient_to_ras preserves WORLD coordinates: for any
   permutation x flip orientation, every voxel's value stays at the same
   physical position (affine' @ v' == affine @ v).
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from adell_mri_tpu.data import read_nifti, reorient_to_ras, write_nifti
from adell_mri_tpu.data.nifti import orientation_codes

_DTYPES = [np.float32, np.int16, np.uint8, np.float64]


@st.composite
def _affines(draw):
    """Random permutation x flips x anisotropic spacing x translation."""
    perm = draw(st.permutations([0, 1, 2]))
    flips = [draw(st.booleans()) for _ in range(3)]
    spac = [draw(st.floats(0.5, 3.0)) for _ in range(3)]
    aff = np.zeros((4, 4))
    aff[3, 3] = 1.0
    for world, vox in enumerate(perm):
        aff[world, vox] = (-1.0 if flips[world] else 1.0) * spac[world]
    aff[:3, 3] = [draw(st.floats(-50, 50)) for _ in range(3)]
    return aff


@settings(max_examples=25, deadline=None)
@given(
    shape=st.tuples(
        st.integers(2, 6), st.integers(2, 6), st.integers(2, 6)
    ),
    dtype_i=st.integers(0, len(_DTYPES) - 1),
    affine=_affines(),
    fourth=st.integers(0, 3),
)
def test_nifti_round_trip(tmp_path_factory, shape, dtype_i, affine, fourth):
    tmp = tmp_path_factory.mktemp("prop")
    dtype = _DTYPES[dtype_i]
    if fourth:
        shape = shape + (fourth,)
    rng = np.random.default_rng(0)
    if np.issubdtype(dtype, np.floating):
        data = rng.normal(size=shape).astype(dtype)
    else:
        info = np.iinfo(dtype)
        data = rng.integers(
            info.min, info.max, size=shape, endpoint=True
        ).astype(dtype)
    path = str(tmp / "x.nii.gz")
    write_nifti(path, data, affine)
    img = read_nifti(path)
    np.testing.assert_array_equal(np.asarray(img.data), data)
    np.testing.assert_allclose(img.affine, affine, atol=1e-5)


@settings(max_examples=25, deadline=None)
@given(affine=_affines())
def test_reorient_preserves_world_coordinates(tmp_path_factory, affine):
    tmp = tmp_path_factory.mktemp("prop")
    rng = np.random.default_rng(1)
    data = rng.normal(size=(4, 5, 6)).astype(np.float32)
    path = str(tmp / "x.nii.gz")
    write_nifti(path, data, affine)
    img = reorient_to_ras(read_nifti(path))
    # canonical orientation: codes must be (+1, +2, +3) = R, A, S
    assert tuple(orientation_codes(img.affine)) == (1, 2, 3)
    inv = np.linalg.inv(img.affine)
    for v in [(0, 0, 0), (3, 4, 5), (1, 2, 3), (2, 0, 4)]:
        w = affine @ np.array(list(v) + [1.0])
        v2 = inv @ w
        v2i = tuple(int(round(c)) for c in v2[:3])
        np.testing.assert_allclose(v2[:3], v2i, atol=1e-4)
        assert img.data[v2i] == pytest.approx(float(data[v]))


@settings(max_examples=10, deadline=None)
@given(affine=_affines())
def test_reorient_idempotent(tmp_path_factory, affine):
    tmp = tmp_path_factory.mktemp("prop")
    data = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    path = str(tmp / "x.nii.gz")
    write_nifti(path, data, affine)
    img1 = reorient_to_ras(read_nifti(path))
    img2 = reorient_to_ras(img1)
    np.testing.assert_array_equal(img1.data, img2.data)
    np.testing.assert_allclose(img1.affine, img2.affine, atol=1e-6)
