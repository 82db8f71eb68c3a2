"""
Inference engine tests. The identity-model reconstruction test mirrors the
reference's strongest numerical test
(testing/test_segmentation_inference_pl.py:22-33): sliding window over
identity must reconstruct the input exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from adell_mri_tpu.inference import (
    FlippedInference,
    SegmentationInference,
    SlidingWindowSegmentation,
    sliding_window_grid,
    sliding_window_inference,
)

KEY = jax.random.PRNGKey(0)


def test_grid_covers_and_realigns_edges():
    grid = sliding_window_grid((10, 10), (4, 4), stride_frac=0.5)
    # edge tiles must flush to s - w = 6
    assert [0, 2, 4, 6] == sorted(set(grid[:, 0].tolist()))
    grid = sliding_window_grid((4, 4), (8, 8))
    assert grid.tolist() == [[0, 0]]


def test_identity_reconstruction_exact():
    vol = jax.random.normal(KEY, (10, 12, 6, 1))
    out = sliding_window_inference(
        lambda x: x, vol, window=(4, 4, 4), stride_frac=0.5, batch_size=3
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(vol), atol=1e-5)


def test_identity_reconstruction_2d_various_strides():
    vol = jax.random.normal(KEY, (9, 7, 2))
    for frac in (0.25, 0.5, 1.0):
        out = sliding_window_inference(
            lambda x: x, vol, window=(4, 4), stride_frac=frac, batch_size=2
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(vol), atol=1e-5)


def test_small_volume_pads_to_window():
    """An axis smaller than the window pads the VOLUME up to the window
    (MONAI semantics) instead of clamping the window — a clamped window
    fed the model input shapes it was never built for."""
    vol = jax.random.normal(KEY, (3, 12, 6, 1))  # first axis < window

    def fn(x):
        assert x.shape[1:] == (4, 4, 4, 1)  # the net ALWAYS sees 4x4x4
        return x

    out = sliding_window_inference(
        fn, vol, window=(4, 4, 4), stride_frac=0.5, batch_size=2
    )
    assert out.shape == vol.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(vol), atol=1e-5)


def test_stride_validation_and_absolute_mode():
    """stride_frac outside (0, 1] raises (it used to leave interior
    voxels covered by no tile and scored 0.0); the object's stride >= 1
    means ABSOLUTE voxels, the documented reference surface."""
    import pytest

    with pytest.raises(ValueError):
        sliding_window_grid((16, 16), (4, 4), stride_frac=2.0)
    with pytest.raises(ValueError):
        sliding_window_grid((16, 16), (4, 4), stride=(8, 8))
    vol = jax.random.normal(KEY, (10, 10, 1))
    sw = SlidingWindowSegmentation(
        (4, 4), lambda b, x: x[..., :1], stride=2, batch_size=2,
        with_params=True,
    )
    out = sw(vol, {})
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(vol[..., :1]), atol=1e-5
    )


def test_whole_volume_tta_is_jitted():
    """The non-sliding-window ensemble x flip path runs through ONE jitted
    program with traced params (it used to run op-by-op eagerly)."""
    calls = []

    def base(params, x, rng=None):
        calls.append(1)
        return x * params["scale"]

    inf = SegmentationInference(
        base,
        [{"scale": jnp.asarray(1.0)}, {"scale": jnp.asarray(1.0)}],
        flip=True,
        n_classes=2,
    )
    vol = jax.random.normal(KEY, (6, 6, 6, 1))
    out = inf(vol)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vol), atol=1e-5)
    n_traces = len(calls)
    # second checkpoint + a second call reuse the compiled program: the
    # python base fn must not trace again
    inf(vol)
    assert len(calls) == n_traces


def test_sliding_window_object_and_batched():
    sw = SlidingWindowSegmentation(
        (4, 4, 4), lambda x: x[..., :1] * 0 + 1.0, n_classes=2, batch_size=2
    )
    vol = jax.random.normal(KEY, (2, 8, 8, 4, 1))
    out = sw(vol)
    assert out.shape == (2, 8, 8, 4, 1)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


def test_flipped_inference_identity():
    fi = FlippedInference(lambda x: x, flips=[(0,), (1,)])
    vol = jax.random.normal(KEY, (6, 6, 1))
    np.testing.assert_allclose(np.asarray(fi(vol)), np.asarray(vol), atol=1e-6)


def test_sharded_sliding_window_matches_single_device():
    """Tile grid sharded over the 8-virtual-device data mesh == the
    single-device scan, exactly (psum of disjoint-tile accumulators)."""
    from adell_mri_tpu.inference.sliding_window import (
        sliding_window_inference_sharded,
    )
    from adell_mri_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    assert mesh.shape["data"] == 8

    def fn(x):  # non-trivial, position-sensitive through values
        return jnp.tanh(x) * 2.0 + x**2

    vol = jax.random.normal(KEY, (10, 12, 6, 1))
    ref = sliding_window_inference(
        fn, vol, window=(4, 4, 4), stride_frac=0.5, batch_size=3
    )
    out = sliding_window_inference_sharded(
        fn, vol, window=(4, 4, 4), mesh=mesh, stride_frac=0.5, batch_size=2
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sharded_sliding_window_via_object_and_composition():
    from adell_mri_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    sw = SlidingWindowSegmentation(
        (4, 4, 4), lambda x: x, n_classes=2, batch_size=2, mesh=mesh
    )
    vol = jax.random.normal(KEY, (8, 10, 6, 1))
    np.testing.assert_allclose(np.asarray(sw(vol)), np.asarray(vol), atol=1e-5)

    def base_fn(params, x, rng=None):
        return x[..., :1] + params

    si = SegmentationInference(
        base_inference_function=base_fn,
        checkpoint_params=[-1.0, 1.0],
        sliding_window_size=(4, 4, 4),
        mesh=mesh,
    )
    out = si(vol)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(vol[..., :1]), atol=1e-5
    )


def test_segmentation_inference_ensemble():
    # two "checkpoints" that predict constant 0 and 1 -> ensemble mean 0.5
    def base_fn(params, x, rng=None):
        return jnp.full(x.shape[:-1] + (1,), params)

    si = SegmentationInference(
        base_inference_function=base_fn,
        checkpoint_params=[0.0, 1.0],
        sliding_window_size=(4, 4),
        flip=True,
    )
    vol = jax.random.normal(KEY, (8, 8, 1))
    out = si(vol)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)


def test_ensemble_shares_one_compiled_program():
    """Checkpoint params are TRACED arguments of the sliding-window jit:
    N checkpoints + flips over one shape -> exactly one cache entry (the
    old design baked each param set in as compile-time constants)."""
    calls = []

    def base_fn(params, x, rng=None):
        calls.append(1)
        return jnp.full(x.shape[:-1] + (1,), params)

    si = SegmentationInference(
        base_inference_function=base_fn,
        checkpoint_params=[0.25, 0.75],
        sliding_window_size=(4, 4),
        flip=True,
    )
    vol = jax.random.normal(KEY, (8, 8, 1))
    out = si(vol)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)
    # the engine is shared and keyed by shape only
    # (2 checkpoints x 3 flip variants all reuse it)
    # base_fn traces once per compile; a second call with new params
    # must not retrace
    n_traces = len(calls)
    si.checkpoint_params = [0.1, 0.9]
    out2 = si(vol)
    np.testing.assert_allclose(np.asarray(out2), 0.5, atol=1e-6)
    assert len(calls) == n_traces
