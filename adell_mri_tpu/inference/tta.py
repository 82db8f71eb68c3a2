"""
Test-time augmentation and composed inference.

Parity targets: adell_mri/utils/inference.py — FlippedInference (:303),
SegmentationInference (:787-989) composing sliding window x flips x
MC-dropout x checkpoint ensembling with TensorListReduction.
"""

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp


class FlippedInference:
    """
    Averages predictions over flip TTA: for each flip-axis subset, flip
    input, predict, flip back (parity: inference.py:303).
    """

    def __init__(
        self,
        inference_function: Callable,
        flips: Sequence[Sequence[int]] = ((0,), (1,), (2,)),
        include_identity: bool = True,
    ):
        self.fn = inference_function
        self.flips = [tuple(f) for f in flips]
        if include_identity:
            self.flips = [()] + [f for f in self.flips if f != ()]

    def __call__(self, vol: jax.Array) -> jax.Array:
        preds = []
        for axes in self.flips:
            x = jnp.flip(vol, axes) if axes else vol
            p = self.fn(x)
            preds.append(jnp.flip(p, axes) if axes else p)
        return sum(preds) / len(preds)


class TensorListReduction:
    """Mean-reduces a list of prediction tensors with optional postproc."""

    def __init__(self, postproc_fn: Optional[Callable] = None):
        self.postproc_fn = postproc_fn

    def __call__(self, tensors: List[jax.Array]) -> jax.Array:
        out = sum(tensors) / len(tensors)
        if self.postproc_fn is not None:
            out = self.postproc_fn(out)
        return out


class SegmentationInference:
    """
    Composes: per-checkpoint model -> [MC-dropout repeats] -> [sliding
    window] -> [flip TTA] -> reduction (parity: inference.py:787).

    Args:
        base_inference_function: ``(params, x) -> probs`` on a window/volume.
        checkpoint_params: list of param pytrees to ensemble over.
        sliding_window_size: enables windowed inference when set.
        stride, flip, mc_iterations: as the reference CLI exposes them
        (entrypoints/segmentation/predict.py:359-372).
    """

    def __init__(
        self,
        base_inference_function: Callable,
        checkpoint_params: Sequence,
        sliding_window_size: Optional[Sequence[int]] = None,
        stride: float = 0.5,
        flip: bool = False,
        mc_iterations: Optional[int] = None,
        n_classes: int = 2,
        batch_size: int = 4,
        postproc_fn: Optional[Callable] = None,
        rng: Optional[jax.Array] = None,
        mesh=None,
    ):
        self.base_fn = base_inference_function
        self.checkpoint_params = list(checkpoint_params)
        self.sliding_window_size = sliding_window_size
        self.stride = stride
        self.flip = flip
        self.mc_iterations = mc_iterations
        self.n_classes = n_classes
        self.batch_size = batch_size
        self.reduction = TensorListReduction(postproc_fn)
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        # mesh with data-axis > 1 shards the sliding-window tile grid
        # across devices (sliding_window_inference_sharded)
        self.mesh = mesh

    def _bundle_fn(self, bundle, x):
        """``bundle = (params, rng)`` rides as ONE traced pytree so every
        checkpoint (and MC repeat) reuses the same compiled program."""
        params, rng = bundle
        if self.mc_iterations:
            preds = []
            for i in range(self.mc_iterations):
                preds.append(
                    self.base_fn(params, x, rng=jax.random.fold_in(rng, i))
                )
            return sum(preds) / len(preds)
        return self.base_fn(params, x)

    def __call__(self, vol: jax.Array) -> jax.Array:
        from adell_mri_tpu.inference.sliding_window import (
            SlidingWindowSegmentation,
        )

        sw = None
        if self.sliding_window_size is not None:
            # ONE window engine shared by all checkpoints AND calls:
            # params/rng are traced arguments, so the ensemble compiles
            # once per input shape
            if getattr(self, "_sw", None) is None:
                self._sw = SlidingWindowSegmentation(
                    self.sliding_window_size,
                    self._bundle_fn,
                    n_classes=self.n_classes,
                    stride=self.stride,
                    batch_size=self.batch_size,
                    mesh=self.mesh,
                    with_params=True,
                )
            sw = self._sw

        if sw is None and getattr(self, "_jit_whole", None) is None:
            # whole-volume path: jit ONE function covering model + MC
            # repeats + flip TTA, with (params, rng) traced so every
            # checkpoint shares the compiled program — unjitted, the
            # ensemble x flips x MC loops dispatched hundreds of eager
            # ops per volume
            ndim = vol.ndim - 1

            def whole(bundle, x):
                f = lambda v: self._bundle_fn(bundle, v)  # noqa: E731
                if self.flip:
                    f = FlippedInference(
                        f, flips=[(d,) for d in range(ndim)]
                    )
                return f(x)

            self._jit_whole = jax.jit(whole)

        outputs = []
        for ci, params in enumerate(self.checkpoint_params):
            rng = jax.random.fold_in(self.rng, ci)
            if sw is not None:
                bundle = (params, rng)
                fn = lambda x, _b=bundle: sw(x, _b)  # noqa: E731
                if self.flip:
                    # flips stay outside the window jit: each flipped
                    # pass reuses the one compiled window program
                    fn = FlippedInference(
                        fn,
                        flips=[
                            (d,)
                            for d in range(len(self.sliding_window_size))
                        ],
                    )
                outputs.append(fn(vol))
            else:
                outputs.append(self._jit_whole((params, rng), vol))
        return self.reduction(outputs)
