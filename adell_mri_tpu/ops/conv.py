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

``conv3d(..., lowering="auto")`` consults ``ADELL_CONV_LOWERING``
(unset/"xla"/"im2col"); the benchmark in benchmarks/benchmark_conv3d.py
measures both on hardware.
"""

import os

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


def conv3d(x, w, strides=(1, 1, 1), padding="SAME", lowering: str = "auto"):
    if lowering == "auto":
        lowering = os.environ.get("ADELL_CONV_LOWERING", "xla")
    if lowering == "im2col":
        return conv3d_im2col(x, w, strides, padding)
    return conv3d_xla(x, w, strides, padding)


class TpuConv(_nn.Module):
    """
    Drop-in for channels-last ``nn.Conv`` whose 3D forward can route
    through the im2col matmul lowering (``ADELL_CONV_LOWERING=im2col``;
    measured up to 4.5x over XLA's 3D conv tiling on this stack — see
    benchmarks/benchmark_conv3d.py). Parameter tree matches nn.Conv
    (``kernel`` [*k, cin, cout], ``bias`` [cout]) so checkpoints are
    interchangeable; give instances the name ``Conv_{i}`` to keep tree
    paths identical to an nn.Conv at the same position.
    """

    features: int
    kernel_size: tuple
    strides: tuple = None
    padding: str = "SAME"
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
        lowering = os.environ.get("ADELL_CONV_LOWERING", "xla")
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
