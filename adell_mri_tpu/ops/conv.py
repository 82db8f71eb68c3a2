"""
3D convolution lowerings.

BASELINE.md records XLA's NDHWC 3D conv at 4.2 TFLOP/s on this stack while
the bf16 matmul calibration hits 50 TFLOP/s — the "forward-pass wall"
(VERDICT r1 item 2b). This module provides mathematically-equivalent
alternative lowerings so the hot path can pick whichever the current
XLA/TPU runtime tiles best:

- ``xla``: ``lax.conv_general_dilated`` NDHWC (the default everywhere);
- ``im2col``: k^3 shifted views concatenated on the channel axis followed
  by ONE [voxels, k^3*Cin] x [k^3*Cin, Cout] matmul — turns the conv into
  the dense MXU shape the calibration measures. Costs k^3 x activation
  memory for the patch tensor, so it suits the narrow-channel stem levels
  where XLA's conv tiling underutilizes the MXU (K dim k^3*Cin >= 128
  already at Cin=8 for k=3).

``lowering="auto"`` (the default) picks im2col whenever the patch tensor
fits ``ADELL_IM2COL_MAX_BYTES`` (4 GB default) and xla otherwise;
``ADELL_CONV_LOWERING=xla|im2col`` forces either. The benchmark in
benchmarks/benchmark_conv3d.py measures both on hardware.
"""

import os
from typing import Any

import flax.linen as _nn
import jax
import jax.numpy as jnp

_DIMNUMS = ("NDHWC", "DHWIO", "NDHWC")


def conv3d_xla(x, w, strides=(1, 1, 1), padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding,
        dimension_numbers=_DIMNUMS,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def conv3d_im2col(x, w, strides=(1, 1, 1), padding="SAME"):
    """
    x: [B, D, H, W, Cin]; w: [kd, kh, kw, Cin, Cout]. SAME or VALID.
    Gathers the k^3 shifted views with static slices (XLA fuses these into
    the matmul operand layout) and contracts in one dot.
    """
    kd, kh, kw, cin, cout = w.shape
    if padding == "SAME":
        # XLA SAME semantics: output = ceil(in/stride), total pad =
        # max((out-1)*stride + k - in, 0), low = total // 2
        pads = [(0, 0)]
        for size, k, s in zip(x.shape[1:4], (kd, kh, kw), strides):
            out = -(-size // s)
            total = max((out - 1) * s + k - size, 0)
            pads.append((total // 2, total - total // 2))
        pads.append((0, 0))
        x = jnp.pad(x, pads)
    elif padding != "VALID":
        # explicit per-axis (low, high) pairs (torch-style symmetric
        # padding differs from SAME at stride > 1)
        x = jnp.pad(x, [(0, 0)] + [tuple(p) for p in padding] + [(0, 0)])
    b, d, h, ww_, _ = x.shape
    od = (d - kd) // strides[0] + 1
    oh = (h - kh) // strides[1] + 1
    ow = (ww_ - kw) // strides[2] + 1
    views = []
    for dz in range(kd):
        for dy in range(kh):
            for dx in range(kw):
                views.append(
                    jax.lax.slice(
                        x,
                        (0, dz, dy, dx, 0),
                        (b, dz + od * strides[0] - strides[0] + 1,
                         dy + oh * strides[1] - strides[1] + 1,
                         dx + ow * strides[2] - strides[2] + 1, cin),
                        (1,) + tuple(strides) + (1,),
                    )
                )
    patches = jnp.concatenate(views, axis=-1)  # [B, od, oh, ow, k^3*Cin]
    wmat = w.reshape(kd * kh * kw * cin, cout)
    out = jax.lax.dot_general(
        patches.reshape(-1, kd * kh * kw * cin),
        wmat,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return out.reshape(b, od, oh, ow, cout)


#: Patch-tensor budget for the auto heuristic. im2col materializes
#: [B, *out_spatial, k^3*Cin]; above this it risks HBM pressure (and the
#: backward materializes the same shape again for the dot's grad), so
#: auto falls back to XLA's conv. v5e has 16 GB HBM; 4 GB leaves room for
#: the rest of the step. Override with ADELL_IM2COL_MAX_BYTES.
_IM2COL_MAX_BYTES = int(
    os.environ.get("ADELL_IM2COL_MAX_BYTES", 4 * 1024**3)
)


def _im2col_patch_bytes(x_shape, k, strides, dtype):
    out_spatial = [
        -(-s // st) for s, st in zip(x_shape[1:4], strides)
    ]  # SAME: ceil(in/stride)
    voxels = x_shape[0]
    for s in out_spatial:
        voxels *= s
    return voxels * k[0] * k[1] * k[2] * x_shape[4] * jnp.dtype(dtype).itemsize


_DEFAULT_BACKEND = None


def _tpu_backend() -> bool:
    global _DEFAULT_BACKEND
    if _DEFAULT_BACKEND is None:
        _DEFAULT_BACKEND = jax.default_backend()
    return _DEFAULT_BACKEND not in ("cpu", "gpu")


def _pick_lowering(x, k, strides):
    """auto: im2col when its patch tensor fits the budget (it beat XLA's
    3D-conv tiling at every UNet hot shape, up to 4.5x —
    benchmarks/benchmark_conv3d.py / BASELINE.md), else xla. The win is a
    TPU MXU-tiling property: on CPU/GPU the materialized k^3 patch tensor
    is pure overhead, so auto only fires on TPU-like backends."""
    env = os.environ.get("ADELL_CONV_LOWERING", "auto")
    if env in ("xla", "im2col"):
        return env
    if not _tpu_backend():
        return "xla"
    if _im2col_patch_bytes(x.shape, k, strides, x.dtype) <= _IM2COL_MAX_BYTES:
        return "im2col"
    return "xla"


def conv3d(x, w, strides=(1, 1, 1), padding="SAME", lowering: str = "auto"):
    if lowering == "auto":
        lowering = _pick_lowering(x, w.shape[:3], strides)
    if lowering == "im2col":
        return conv3d_im2col(x, w, strides, padding)
    return conv3d_xla(x, w, strides, padding)


class TpuConv(_nn.Module):
    """
    Drop-in for channels-last ``nn.Conv`` whose 3D forward routes through
    the im2col matmul lowering when the auto heuristic approves (measured
    up to 4.5x over XLA's 3D conv tiling on this stack — see
    benchmarks/benchmark_conv3d.py; force with ``ADELL_CONV_LOWERING``).
    Parameter tree matches nn.Conv
    (``kernel`` [*k, cin, cout], ``bias`` [cout]) so checkpoints are
    interchangeable; give instances the name ``Conv_{i}`` to keep tree
    paths identical to an nn.Conv at the same position.
    """

    features: int
    kernel_size: tuple
    strides: tuple = None
    # "SAME" | "VALID" | tuple of per-axis (low, high) pairs
    padding: Any = "SAME"
    use_bias: bool = True

    @_nn.compact
    def __call__(self, x):
        ndim = x.ndim - 2
        k = tuple(self.kernel_size)
        strides = tuple(self.strides or (1,) * ndim)
        w = self.param(
            "kernel",
            _nn.initializers.lecun_normal(),
            k + (x.shape[-1], self.features),
        )
        # nn.Conv promotes the kernel to the input dtype (the bf16 policy
        # may cast inputs but not params, or vice versa)
        w = w.astype(x.dtype)
        lowering = (
            _pick_lowering(x, k, strides) if ndim == 3 else "xla"
        )
        if ndim == 3 and lowering == "im2col":
            y = conv3d_im2col(x, w, strides, self.padding)
        else:
            spatial = "DHW"[3 - ndim:]
            dn = jax.lax.conv_dimension_numbers(
                x.shape, w.shape,
                ("N" + spatial + "C", spatial + "IO", "N" + spatial + "C"),
            )
            # no preferred_element_type here: its transpose rule mixes
            # dtypes in the backward; TPU bf16 convs accumulate f32 in
            # the MXU regardless
            y = jax.lax.conv_general_dilated(
                x, w, window_strides=strides, padding=self.padding,
                dimension_numbers=dn,
            )
        if self.use_bias:
            b = self.param("bias", _nn.initializers.zeros, (self.features,))
            y = y + b
        return y
