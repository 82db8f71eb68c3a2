"""NIfTI codec round-trip and orientation tests."""

import numpy as np
import pytest

from adell_mri_tpu.data import read_nifti, reorient_to_ras, write_nifti
from adell_mri_tpu.data.nifti import NiftiImage, orientation_codes


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
@pytest.mark.parametrize(
    "dtype", [np.float32, np.int16, np.uint8, np.float64]
)
def test_roundtrip(tmp_path, suffix, dtype):
    rng = np.random.default_rng(0)
    if np.issubdtype(dtype, np.integer):
        data = rng.integers(0, 100, size=(7, 9, 5)).astype(dtype)
    else:
        data = rng.normal(size=(7, 9, 5)).astype(dtype)
    affine = np.array(
        [
            [0.5, 0, 0, -10.0],
            [0, 0.7, 0, 3.0],
            [0, 0, 3.0, 7.0],
            [0, 0, 0, 1.0],
        ]
    )
    path = str(tmp_path / ("img" + suffix))
    write_nifti(path, data, affine)
    img = read_nifti(path)
    np.testing.assert_allclose(img.data, data)
    np.testing.assert_allclose(img.affine, affine, atol=1e-5)
    np.testing.assert_allclose(img.spacing, [0.5, 0.7, 3.0], atol=1e-5)


def test_reorient_to_ras_identity():
    img = NiftiImage(np.arange(24.0).reshape(2, 3, 4), np.eye(4))
    out = reorient_to_ras(img)
    np.testing.assert_array_equal(out.data, img.data)


def test_reorient_to_ras_flip_and_permute():
    rng = np.random.default_rng(1)
    data = rng.normal(size=(4, 5, 6))
    # LPS -> RAS requires flipping x and y
    affine = np.diag([-1.0, -1.0, 1.0, 1.0])
    affine[:3, 3] = [3.0, 4.0, 0.0]
    out = reorient_to_ras(NiftiImage(data, affine))
    assert orientation_codes(out.affine) == (1, 2, 3)
    np.testing.assert_allclose(
        out.data, np.flip(np.flip(data, 0), 1), atol=0
    )
    # world position of voxel (0,0,0) must be preserved under index remap
    corner_old = affine @ np.array([3, 4, 0, 1.0])
    corner_new = out.affine @ np.array([0, 0, 0, 1.0])
    np.testing.assert_allclose(corner_old, corner_new, atol=1e-6)


def test_reorient_axis_swap():
    rng = np.random.default_rng(2)
    data = rng.normal(size=(3, 4, 5))
    # voxel axis 0 points superior, axis 2 points right: permutation needed
    affine = np.zeros((4, 4))
    affine[2, 0] = 1.0  # axis0 -> +z
    affine[1, 1] = 1.0  # axis1 -> +y
    affine[0, 2] = 1.0  # axis2 -> +x
    affine[3, 3] = 1.0
    out = reorient_to_ras(NiftiImage(data, affine))
    assert out.data.shape == (5, 4, 3)
    assert orientation_codes(out.affine) == (1, 2, 3)


def test_reorient_from_ras_roundtrip():
    """reorient_to_ras then reorient_from_ras restores the original voxel
    layout exactly (the Invertd byte-layout parity predict relies on)."""
    from adell_mri_tpu.data.nifti import (
        NiftiImage,
        reorient_from_ras,
        reorient_to_ras,
    )

    rng = np.random.default_rng(0)
    data = rng.normal(size=(5, 6, 7)).astype(np.float32)
    # LPS affine with permuted axes: x->-P, y->-R, z->S
    affine = np.asarray(
        [
            [0.0, -1.0, 0.0, 3.0],
            [-1.0, 0.0, 0.0, 5.0],
            [0.0, 0.0, 1.5, -2.0],
            [0.0, 0.0, 0.0, 1.0],
        ]
    )
    img = NiftiImage(data=data, affine=affine, header=None)
    ras = reorient_to_ras(img)
    assert ras.data.shape != data.shape or not np.array_equal(ras.data, data)
    back = reorient_from_ras(ras.data, affine)
    np.testing.assert_array_equal(back, data)
