"""
Separable (gather-free) affine warp: exact for single-factor transforms,
close to scipy trilinear on smooth volumes for composed augmentation-scale
transforms (used for augmentation only — see warp_affine_separable notes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import ndimage

from adell_mri_tpu.transforms import spatial as S


@pytest.mark.parametrize(
    "edit",
    [
        {(0, 3): 3.5},                 # translation
        {(0, 0): 0.9},                 # scale
        {(1, 0): 0.2},                 # single lower shear
        {(0, 1): 0.2},                 # single upper shear
        {(0, 0): 0.9, (1, 1): 1.1, (0, 3): 2.0},  # scale + translate
    ],
)
def test_single_factor_exact(edit):
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(24, 24, 12, 1)), jnp.float32)
    m = np.eye(4, dtype=np.float32)
    for (i, j), v in edit.items():
        m[i, j] = v
    ref = np.asarray(S.warp_affine(vol, jnp.asarray(m)))
    sep = np.asarray(S.warp_affine_separable(vol, jnp.asarray(m), max_shift=12))
    np.testing.assert_allclose(
        ref[4:-4, 4:-4, 3:-3], sep[4:-4, 4:-4, 3:-3], atol=1e-4
    )


@pytest.mark.parametrize("trial", range(3))
def test_composed_close_on_smooth_volumes(trial):
    rng = np.random.default_rng(0)
    v = ndimage.gaussian_filter(
        rng.normal(size=(32, 32, 16)).astype(np.float32), 1.5
    )
    vol = jnp.asarray(v[..., None])
    mat = np.asarray(
        S.random_affine_matrix(
            jax.random.PRNGKey(trial),
            (32, 32, 16),
            rotate_range=0.26,
            scale_range=0.1,
            shear_range=0.05,
            translate_range=2.0 / 32,
        )
    )
    gt = ndimage.affine_transform(v, mat[:3, :3], offset=mat[:3, 3], order=1)
    sep = np.asarray(
        S.warp_affine_separable(vol, jnp.asarray(mat), max_shift=16)
    )[..., 0]
    sl = (slice(8, -8), slice(8, -8), slice(5, -5))
    scale = np.abs(gt[sl]).max()
    assert np.abs(sep[sl] - gt[sl]).mean() / scale < 0.05


def test_separable_identity_exact():
    rng = np.random.default_rng(9)
    vol = jnp.asarray(rng.normal(size=(16, 16, 8, 2)), jnp.float32)
    out = S.warp_affine_separable(vol, jnp.eye(4), max_shift=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vol), atol=1e-5)


def test_separable_nearest_labels_stay_binary():
    rng = np.random.default_rng(3)
    lab = (rng.uniform(size=(24, 24, 12, 1)) > 0.8).astype(np.float32)
    mat = S.random_affine_matrix(
        jax.random.PRNGKey(1), (24, 24, 12), rotate_range=0.2
    )
    out = np.asarray(
        S.warp_affine_separable(
            jnp.asarray(lab), mat, max_shift=10, method="nearest"
        )
    )
    assert set(np.unique(out)).issubset({0.0, 1.0})


def test_max_shift_helper():
    s = S.separable_max_shift((128, 128, 32), 0.26, 0.05)
    assert 30 <= s <= 70
    assert S.separable_max_shift((16, 16, 8), 0.0, 0.0) >= 1
