"""
Sliding-window segmentation inference.

Parity target: adell_mri/utils/inference.py — SlidingWindowSegmentation
(:394-784): strided crop generator with edge re-alignment (:439-457),
micro-batched model calls, overlap-count averaging (:726-784).

TPU-first redesign (SURVEY.md §7): the crop grid is computed at trace time
from the static input shape (bucketed shapes bound recompiles); tiles are
processed in fixed-size micro-batches inside a lax.scan; accumulation is a
scatter-add (dynamic_update_slice) carried through the scan — the whole
inference is ONE jit-compiled program, no per-tile host round-trips.
"""

import math
from functools import partial
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def sliding_window_grid(
    spatial: Sequence[int],
    window: Sequence[int],
    stride: Optional[Sequence[int]] = None,
    stride_frac: float = 0.5,
) -> np.ndarray:
    """
    Static tile-start grid with edge re-alignment (parity:
    inference.py:439-457): strides of ``stride_frac * window`` and a final
    tile flush against each edge. Returns [n_tiles, ndim] int32.
    """
    ndim = len(spatial)
    if stride is None:
        stride = [max(1, int(w * stride_frac)) for w in window]
    axes: List[List[int]] = []
    for s, w, st in zip(spatial, window, stride):
        if w >= s:
            starts = [0]
        else:
            starts = list(range(0, s - w + 1, st))
            if starts[-1] != s - w:
                starts.append(s - w)
        axes.append(starts)
    import itertools

    return np.asarray(list(itertools.product(*axes)), np.int32)


def sliding_window_inference(
    fn: Callable[[jax.Array], jax.Array],
    vol: jax.Array,
    window: Sequence[int],
    stride_frac: float = 0.5,
    batch_size: int = 4,
    out_channels: Optional[int] = None,
) -> jax.Array:
    """
    Runs ``fn`` ([b, *window, C] -> [b, *window, C_out]) over all tiles of
    ``vol`` [*S, C] and averages overlaps. Jit-safe for a fixed vol shape.
    """
    spatial = vol.shape[:-1]
    ndim = len(spatial)
    window = tuple(min(w, s) for w, s in zip(window, spatial))
    positions = sliding_window_grid(spatial, window, stride_frac=stride_frac)
    n_tiles = len(positions)
    pad = (-n_tiles) % batch_size
    if pad:
        positions = np.concatenate(
            [positions, np.tile(positions[-1:], (pad, 1))]
        )
    valid = np.concatenate(
        [np.ones(n_tiles, np.float32), np.zeros(pad, np.float32)]
    )
    positions_dev = jnp.asarray(positions).reshape(-1, batch_size, ndim)
    valid_dev = jnp.asarray(valid).reshape(-1, batch_size)

    if out_channels is None:
        probe = jax.eval_shape(
            fn, jax.ShapeDtypeStruct((1,) + window + (vol.shape[-1],), vol.dtype)
        )
        out_channels = probe.shape[-1]

    acc0 = jnp.zeros(spatial + (out_channels,), jnp.float32)
    cnt0 = jnp.zeros(spatial + (1,), jnp.float32)

    def scan_body(carry, inputs):
        acc, cnt = carry
        pos, val = inputs  # [b, ndim], [b]

        crops = jax.vmap(
            lambda p: jax.lax.dynamic_slice(
                vol, list(p) + [0], list(window) + [vol.shape[-1]]
            )
        )(pos)
        preds = fn(crops).astype(jnp.float32)

        ones = jnp.ones(window + (1,), jnp.float32)

        def add_one(carry, tile):
            acc, cnt = carry
            p, pred, v = tile
            patch = jax.lax.dynamic_slice(
                acc, list(p) + [0], list(window) + [out_channels]
            )
            acc = jax.lax.dynamic_update_slice(
                acc, patch + pred * v, list(p) + [0]
            )
            cpatch = jax.lax.dynamic_slice(
                cnt, list(p) + [0], list(window) + [1]
            )
            cnt = jax.lax.dynamic_update_slice(
                cnt, cpatch + ones * v, list(p) + [0]
            )
            return (acc, cnt), None

        (acc, cnt), _ = jax.lax.scan(add_one, (acc, cnt), (pos, preds, val))
        return (acc, cnt), None

    (acc, cnt), _ = jax.lax.scan(
        scan_body, (acc0, cnt0), (positions_dev, valid_dev)
    )
    return acc / jnp.maximum(cnt, 1.0)


class SlidingWindowSegmentation:
    """
    Object wrapper with the reference's constructor surface
    (inference.py:394): sliding_window_size, stride (fraction or absolute),
    n_classes inference fn. Jit-compiled per input shape (shape-bucketed
    cache).
    """

    def __init__(
        self,
        sliding_window_size: Sequence[int],
        inference_function: Callable,
        n_classes: int = 2,
        stride: float = 0.5,
        batch_size: int = 4,
    ):
        self.window = tuple(sliding_window_size)
        self.fn = inference_function
        self.out_channels = n_classes if n_classes > 2 else 1
        self.stride = stride
        self.batch_size = batch_size
        self._cache = {}

    def _compiled(self, shape):
        if shape not in self._cache:
            self._cache[shape] = jax.jit(
                partial(
                    sliding_window_inference,
                    self.fn,
                    window=self.window,
                    stride_frac=self.stride,
                    batch_size=self.batch_size,
                    out_channels=self.out_channels,
                )
            )
        return self._cache[shape]

    def __call__(self, vol: jax.Array) -> jax.Array:
        """vol [*S, C] (single case) or [B, *S, C] (batched over cases)."""
        if vol.ndim == len(self.window) + 2:
            return jnp.stack([self(v) for v in vol])
        return self._compiled(vol.shape)(vol)
