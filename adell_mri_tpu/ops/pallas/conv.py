"""
Implicit-GEMM 3D convolution Pallas kernel (channels-first formulation).

Why another conv lowering (beyond ops/conv.py xla|im2col): the im2col
matmul beats XLA's conv tiling at every UNet hot shape (BASELINE.md), but
it (a) materializes the k^3 x activation patch tensor in HBM (3.6 GB at
the flagship stem — the dot's operand must be contiguous, so XLA writes
27 shifted copies of x and reads them back), and (b) computes
[voxels, k^3*Cin] x [k^3*Cin, Cout] whose LANE dimension is Cout — 32 at
the stem, a quarter of the 128-lane MXU. The stem level carries ~2/3 of
the flagship UNet's conv FLOPs, so both costs land exactly where the
FLOPs are.

This kernel flips the GEMM: out^T [Cout, voxels] =
W^T [Cout, k^3*Cin] @ patches^T [k^3*Cin, voxels]. Lanes become the voxel
axis (always >= 128), Cout only streams through the MXU's M dimension
where small values are free, and the patch matrix is built tile-by-tile
IN VMEM from static shifted slices of a halo slab — it never exists in
HBM. Data layout inside the kernel is channels-first [B, C, D, W, H]
with the 128-multiple spatial axis as lanes.

Scope (v1): k=3x3x3, stride 1, SAME padding, one spatial axis a multiple
of 128 (the flagship stem/decoder levels; other shapes fall back to
im2col upstream). Grid = (B, D): one program per padded z-slab, safe
standard-BlockSpec pipelining only — no manual DMA, no scalar prefetch
(the axon compile service has wedged on those; memory note
axon-pallas-quirks).

DECISION (2026-08-19 on-chip A/B, calibration 196 TFLOP/s, BASELINE.md
session H): FORCE-ONLY — lost to z2d 4.8x fwd at the stem (13.15 ms vs
2.76). The voxel-lane GEMM is sound but the in-VMEM patch build (27
unaligned lane-axis slices + concat + reshape per tile) is VPU-bound at
~5x the MXU time it feeds. At Cout=32 the no-structural-zeros ceiling is
~25% of peak (32 of 128 output lanes); z2d's 42 TF/s (21%) is near it,
so no conv lowering has meaningful headroom left at this shape.

Backward: the hand-derived im2col matmul vjp (ops/conv.py
_conv3d_im2col_bwd) — dW is one big matmul, dx is a stride-1 conv that
itself routes back through this kernel when shapes qualify.

Reference hot path being replaced: MONAI CPU transform workers + torch
Conv3d (adell_mri/modules/segmentation/unet.py:751); here the conv IS
the device hot loop.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

#: VMEM budget for the per-program working set (halo slabs + patch tile
#: + out slab); v5e has ~16 MB of VMEM per core.
_VMEM_BUDGET = int(os.environ.get("ADELL_PALLAS_CONV_VMEM", 10 * 1024**2))
#: W-chunk: patch tile is [27*Cin, TW*H] — 8 keeps it ~1.8 MB at the stem
_TW = 8


def _kernel(x0_ref, x1_ref, x2_ref, w_ref, o_ref, *, cin, cout, w_sz, h_sz,
            tw, out_dtype):
    """One (b, z) output slab [Cout, W, H] from three padded z-slabs
    [Cin, W+2, H+2] and the tap-major weight matrix [Cout, 27*Cin]."""
    slabs = (x0_ref, x1_ref, x2_ref)
    wmat = w_ref[...]
    for wc in range(0, w_sz, tw):
        pieces = []
        for dz in range(3):
            slab = slabs[dz]
            for dw in range(3):
                for dh in range(3):
                    piece = slab[0, :, 0, wc + dw:wc + dw + tw,
                                 dh:dh + h_sz]
                    pieces.append(piece.reshape(cin, tw * h_sz))
        patches = jnp.concatenate(pieces, axis=0)  # [27*Cin, TW*H]
        acc = jnp.dot(
            wmat, patches, preferred_element_type=jnp.float32
        )  # [Cout, TW*H]
        o_ref[0, :, 0, wc:wc + tw, :] = acc.reshape(
            cout, tw, h_sz
        ).astype(out_dtype)


def _supported(x_shape, w_shape, strides, padding, elt_bytes: int = 2):
    """``elt_bytes``: input element size — f32 inputs cost twice the
    bf16 default in every VMEM term below (a 2-byte hardcode under-counted
    f32 and let over-budget shapes through to a Mosaic VMEM error)."""
    kd, kh, kw = w_shape[:3]
    if (kd, kh, kw) != (3, 3, 3):
        return None
    if tuple(strides) != (1, 1, 1) or padding != "SAME":
        return None
    _, d, h, w, cin = x_shape
    # lanes must be a 128-multiple spatial axis
    if h % 128 == 0:
        swap = False
    elif w % 128 == 0:
        swap = True
    else:
        return None
    w_sz, h_sz = (h, w) if swap else (w, h)
    # non-multiples above one tile are rejected; anything <= _TW runs as a
    # single tw = w_sz chunk (the old gate `w_sz != _TW` was vacuous when
    # w_sz % _TW == 0 and wrongly rejected small-W shapes)
    if w_sz % _TW != 0 and w_sz > _TW:
        return None
    cout = w_shape[4]
    tw = _TW if w_sz % _TW == 0 else w_sz
    eb = int(elt_bytes)
    vmem = (
        3 * cin * (w_sz + 2) * (h_sz + 2) * eb * 2  # halo slabs, 2x buffered
        + 27 * cin * tw * h_sz * eb                  # patch tile
        + cout * w_sz * h_sz * eb * 2                # out slab, 2x buffered
        + cout * 27 * cin * eb                       # wmat
        + cout * tw * h_sz * 4                       # f32 acc
    )
    if vmem > _VMEM_BUDGET:
        return None
    return swap, tw


def conv3d_pallas_raw(x, w, *, interpret=False):
    """x: [B, D, H, W, Cin] (channels-last), w: [3, 3, 3, Cin, Cout];
    stride 1, SAME. Returns [B, D, H, W, Cout] or None when unsupported.
    """
    sup = _supported(
        x.shape, w.shape, (1, 1, 1), "SAME", elt_bytes=x.dtype.itemsize
    )
    if sup is None:
        return None
    swap, tw = sup
    b, d, h, w_ax, cin = x.shape
    cout = w.shape[4]
    if swap:
        # lanes axis is W: exchange the H/W roles (conv is equivariant
        # under matching spatial permutation of x and the kernel)
        x = jnp.swapaxes(x, 2, 3)
        w = jnp.swapaxes(w, 1, 2)
        h, w_ax = w_ax, h
    # channels-first [B, Cin, D, W, H] with lanes = H, then SAME-pad the
    # three spatial dims by 1
    x_cf = jnp.transpose(x, (0, 4, 1, 3, 2))
    x_cf = jnp.pad(
        x_cf, ((0, 0), (0, 0), (1, 1), (1, 1), (1, 1))
    )
    # tap-major, cin-minor weight matrix in the kernel's (dz, dw, dh)
    # tap order: w is [kd, kh, kw, cin, cout] -> (kd, kw, kh, cin)
    wmat = jnp.transpose(w, (4, 0, 2, 1, 3)).reshape(cout, 27 * cin)

    slab_spec = lambda dz: pl.BlockSpec(
        (1, cin, 1, w_ax + 2, h + 2),
        lambda bb, zz, dz=dz: (bb, 0, zz + dz, 0, 0),
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, cin=cin, cout=cout, w_sz=w_ax, h_sz=h, tw=tw,
            out_dtype=x.dtype,
        ),
        grid=(b, d),
        in_specs=[
            slab_spec(0),
            slab_spec(1),
            slab_spec(2),
            pl.BlockSpec((cout, 27 * cin), lambda bb, zz: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, cout, 1, w_ax, h), lambda bb, zz: (bb, 0, zz, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, cout, d, w_ax, h), x.dtype),
        interpret=interpret,
    )(x_cf, x_cf, x_cf, wmat)
    # back to channels-last [B, D, H, W, Cout] (undoing the swap if any)
    out = jnp.transpose(out, (0, 2, 4, 3, 1))
    if swap:
        out = jnp.swapaxes(out, 2, 3)
    return out


def conv3d_pallas_supported(
    x_shape, w_shape, strides, padding, elt_bytes: int = 2
) -> bool:
    return (
        _supported(x_shape, w_shape, strides, padding, elt_bytes=elt_bytes)
        is not None
    )
