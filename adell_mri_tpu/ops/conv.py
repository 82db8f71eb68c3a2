"""
3D convolution lowerings.

BASELINE.md records XLA's NDHWC 3D conv at 4.2 TFLOP/s on this stack while
the bf16 matmul calibration hits 50 TFLOP/s — the "forward-pass wall"
(VERDICT r1 item 2b). This module provides mathematically-equivalent
alternative lowerings so the hot path can pick whichever the current
XLA/TPU runtime tiles best:

- ``xla``: ``lax.conv_general_dilated`` NDHWC;
- ``z2d``: the 3D conv decomposed over its smallest-kernel axis into k 2D
  convs on shifted slabs (XLA's 2D conv path tiles well where its 3D path
  is erratically pathological at stem shapes — BASELINE.md round-3);
- ``s2d``: patchify convs (kernel == strides) as space-to-depth + ONE GEMM
  (force-only: XLA's own conv path won the on-chip A/B at patchify shapes);
- ``im2col``/``im2col_t``/``zfold``: explicit patch-tensor GEMM variants —
  HBM-bound by construction on a healthy MXU (round-3 measurement), kept
  for degraded-bandwidth environments and benchmarking;
- ``pallas``: implicit-GEMM kernel building patch tiles in VMEM.

``lowering="auto"`` (the default, see ``_pick_lowering``) chooses z2d on
TPU for general convs and plain xla for patchify convs and off-TPU.
``ADELL_CONV_LOWERING`` forces any lowering. ``ADELL_IM2COL_MAX_BYTES``
only gates im2col rows in benchmarks/benchmark_conv3d.py — it does NOT
steer the training auto policy.
"""

import os
from typing import Any

import flax.linen as _nn
import jax
import jax.numpy as jnp

_DIMNUMS = ("NDHWC", "DHWIO", "NDHWC")


def conv3d_xla(x, w, strides=(1, 1, 1), padding="SAME"):
    # no preferred_element_type: its transpose rule mixes dtypes in the
    # backward (f32 cotangent vs bf16 operands fails conv_general_dilated),
    # and TPU bf16 convs accumulate f32 in the MXU regardless — same
    # reasoning as TpuConv's inline call below. w casts to x.dtype so the
    # OUTPUT dtype matches the other lowerings (an f32 w against bf16 x
    # would otherwise return f32 here but bf16 under z2d — a silent
    # promotion of everything downstream, routing-dependent)
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=strides, padding=padding,
        dimension_numbers=_DIMNUMS,
    )


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


def _explicit_pads(x_shape, k, strides, padding):
    """Resolve SAME/VALID/explicit padding to per-spatial-axis (lo, hi)."""
    if padding == "SAME":
        pads = []
        for size, kk, s in zip(x_shape[1:4], k, strides):
            out = -(-size // s)
            total = max((out - 1) * s + kk - size, 0)
            pads.append((total // 2, total - total // 2))
        return tuple(pads)
    if padding == "VALID":
        return ((0, 0), (0, 0), (0, 0))
    return tuple((int(lo), int(hi)) for lo, hi in padding)


def _im2col_patches(x, k, strides):
    """Shifted-view patch tensor [B, od, oh, ow, k^3*Cin] of an already-
    padded x — the shared core of the forward and the dW backward."""
    kd, kh, kw = k
    b, d, h, w_, cin = x.shape
    od = (d - kd) // strides[0] + 1
    oh = (h - kh) // strides[1] + 1
    ow = (w_ - kw) // strides[2] + 1
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
    return jnp.concatenate(views, axis=-1)


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3d_im2col_trainable(x, w, strides, padding):
    """im2col conv whose BACKWARD is also slices + lax.pad + matmuls.

    Autodiff of ``conv3d_im2col`` emits transposed strided gathers that
    have crashed the remote TPU compile service (tpu_compile_helper
    HTTP 500, BASELINE.md round-3 log), and would run as scatters anyway.
    This variant derives the gradients by hand in the same MXU-friendly
    primitive family as the forward:

    - ``dW = patches^T @ g`` — one dense [k^3*Cin, voxels]x[voxels, Cout]
      matmul (patches recomputed: k^3 static slices, fused by XLA);
    - ``dx = corr(interior-dilated g, flip(w) with Cin/Cout swapped)`` —
      the textbook conv input-gradient, lowered through the SAME im2col
      matmul path at stride 1 (interior dilation via ``lax.pad``).

    ``strides``/``padding`` are nondiff static args and must be hashable
    (tuples / "SAME" / "VALID" / tuple of (lo, hi) pairs).
    """
    return conv3d_im2col(x, w, strides, padding)


def _conv3d_im2col_fwd(x, w, strides, padding):
    return conv3d_im2col(x, w, strides, padding), (x, w)


def _conv3d_im2col_bwd(strides, padding, res, g):
    x, w = res
    kd, kh, kw, cin, cout = w.shape
    k = (kd, kh, kw)
    pads = _explicit_pads(x.shape, k, strides, padding)

    # dW: recompute the padded input's patch tensor and contract the
    # voxel axis against g. Computed TRANSPOSED — [Cout, V] x [V, k^3*Cin]
    # — so the output lane axis is k^3*Cin (>= 128 already at Cin >= 5)
    # instead of Cout (32 at the UNet stem, a quarter of the MXU's lanes);
    # the transpose back is kernel-sized, i.e. free.
    xp = jnp.pad(x, ((0, 0),) + tuple(pads) + ((0, 0),))
    patches = _im2col_patches(xp, k, strides)
    v = patches.shape[0] * patches.shape[1] * patches.shape[2] * patches.shape[3]
    dw_t = jax.lax.dot_general(
        g.reshape(v, cout),
        patches.reshape(v, kd * kh * kw * cin),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Cout, k^3*Cin]
    dw = (
        dw_t.T.astype(w.dtype).reshape(kd, kh, kw, cin, cout)
    )

    # dx: full correlation of the interior-dilated cotangent with the
    # spatially-flipped, channel-swapped kernel, at stride 1. With
    # forward pads (lo, hi) and dilated-g length L per axis, the exact
    # alignment is pad_lo' = k-1-lo and pad_hi' = in + lo - L (covers the
    # SAME-ceil and VALID-remainder cases where in != L + k-1 - lo - hi;
    # positions the forward never read get zero gradient from the pad).
    g_dil = jax.lax.pad(
        g.astype(jnp.float32),
        jnp.float32(0),
        [(0, 0, 0)]
        + [(0, 0, s - 1) for s in strides]
        + [(0, 0, 0)],
    ).astype(g.dtype)
    bwd_pads = []
    crop_lo, crop_hi = [0], [0]  # batch axis
    for ax in range(3):
        lo, _hi = pads[ax]
        L = g_dil.shape[1 + ax]
        p_lo = k[ax] - 1 - lo
        p_hi = x.shape[1 + ax] + lo - L
        # explicit pads > k-1 (never produced by SAME/VALID/torch-style
        # padding) make these negative: crop g_dil instead of padding
        crop_lo.append(max(-p_lo, 0))
        crop_hi.append(max(-p_hi, 0))
        bwd_pads.append((max(p_lo, 0), max(p_hi, 0)))
    if any(crop_lo) or any(crop_hi):
        crop_lo.append(0)
        crop_hi.append(0)
        g_dil = jax.lax.slice(
            g_dil,
            crop_lo,
            [s - c for s, c in zip(g_dil.shape, crop_hi)],
        )
    w_rot = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
    dx = None
    if (
        tuple(bwd_pads) == ((1, 1), (1, 1), (1, 1))
        and os.environ.get("ADELL_CONV_LOWERING") == "pallas"
        and _tpu_backend()
    ):
        # stride-1 SAME k=3 forward: dx is itself a SAME conv, so it can
        # ride the implicit-GEMM kernel when the shape qualifies
        from .pallas.conv import conv3d_pallas_raw

        dx = conv3d_pallas_raw(g_dil, w_rot)
    if dx is None:
        dx = conv3d_im2col(
            g_dil, w_rot, strides=(1, 1, 1), padding=tuple(bwd_pads)
        )
    return dx.astype(x.dtype), dw


conv3d_im2col_trainable.defvjp(_conv3d_im2col_fwd, _conv3d_im2col_bwd)


def conv3d_im2col_t(x, w, strides=(1, 1, 1), padding="SAME"):
    """Transposed im2col: ``out^T [Cout, V] = W^T [Cout, k^3*Cin] @
    patches^T [k^3*Cin, V]``.

    Same math as ``conv3d_im2col`` but the GEMM's lane axis is the voxel
    count V (always a 128-multiple at real shapes) instead of Cout — at
    the 32-channel stem the standard orientation leaves 3/4 of the MXU
    lanes idle and pads every [.., 32]-minor intermediate 4x in HBM
    (T(8,128) tiling). The patch rows are channels-first shifted views,
    so the one-off input/output transposes are the only extra traffic.
    """
    kd, kh, kw, cin, cout = w.shape
    pads = _explicit_pads(x.shape, (kd, kh, kw), strides, padding)
    xp = jnp.pad(x, ((0, 0),) + tuple(pads) + ((0, 0),))
    x_cf = jnp.transpose(xp, (4, 0, 1, 2, 3))  # [Cin, B, Dp, Hp, Wp]
    c, b, d, h, w_ = x_cf.shape
    od = (d - kd) // strides[0] + 1
    oh = (h - kh) // strides[1] + 1
    ow = (w_ - kw) // strides[2] + 1
    v = b * od * oh * ow
    views = []
    for dz in range(kd):
        for dy in range(kh):
            for dx in range(kw):
                views.append(
                    jax.lax.slice(
                        x_cf,
                        (0, 0, dz, dy, dx),
                        (c, b, dz + od * strides[0] - strides[0] + 1,
                         dy + oh * strides[1] - strides[1] + 1,
                         dx + ow * strides[2] - strides[2] + 1),
                        (1, 1) + tuple(strides),
                    ).reshape(cin, v)
                )
    patches_t = jnp.concatenate(views, axis=0)  # [k^3*Cin, V]
    wmat_t = w.reshape(kd * kh * kw * cin, cout).T  # [Cout, k^3*Cin]
    out_t = jax.lax.dot_general(
        wmat_t, patches_t,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)  # [Cout, V]
    out = out_t.reshape(cout, b, od, oh, ow)
    return jnp.transpose(out, (1, 2, 3, 4, 0))


_DIMNUMS_2D = ("NHWC", "HWIO", "NHWC")


def conv3d_z2d(x, w, strides=(1, 1, 1), padding="SAME"):
    """3D conv as a sum of k_slab 2D convs over shifted slabs.

    ``y[:, z] = sum_dz conv2d(x[:, z+dz-lo], w[dz])`` with (B, slab)
    folded into the conv batch. Avoids the im2col patch tensor entirely
    (the only extra HBM is XLA's partial-sum fusion) and rides XLA's 2D
    conv path, which tiles narrow-channel stems better than the 3D path
    (benchmarks/benchmark_conv3d.py). Supports any k/stride.

    The slab axis is the spatial axis with the SMALLEST kernel extent
    (fewest 2D convs) — for anisotropic kernels like AHNet's (3, 3, 1)
    this folds the whole conv into ONE 2D conv instead of three
    degenerate (3, 1) ones; axes are transposed in/out when that axis
    isn't the first (XLA's layout assignment absorbs the transposes).
    """
    k3 = w.shape[:3]
    ax = min(range(3), key=lambda a: k3[a])
    if ax != 0:
        other = [a for a in range(3) if a != ax]
        sp = [ax] + other  # spatial permutation, slab axis first
        x_p = jnp.transpose(x, (0,) + tuple(a + 1 for a in sp) + (4,))
        w_p = jnp.transpose(w, tuple(sp) + (3, 4))
        st_p = tuple(strides[a] for a in sp)
        pad_p = (
            padding
            if isinstance(padding, str)
            else tuple(padding[a] for a in sp)
        )
        y = conv3d_z2d(x_p, w_p, st_p, pad_p)
        inv = [0] * 3
        for i, a in enumerate(sp):
            inv[a] = i
        return jnp.transpose(y, (0,) + tuple(i + 1 for i in inv) + (4,))
    kd, kh, kw, cin, cout = w.shape
    pads = _explicit_pads(x.shape, (kd, kh, kw), strides, padding)
    xz = jnp.pad(x, ((0, 0), tuple(pads[0])) + ((0, 0),) * 3)
    b, dpad, h, w_, _ = xz.shape
    od = (dpad - kd) // strides[0] + 1
    out = None
    for dz in range(kd):
        slab = jax.lax.slice(
            xz,
            (0, dz, 0, 0, 0),
            (b, dz + (od - 1) * strides[0] + 1, h, w_, cin),
            (1, strides[0], 1, 1, 1),
        )  # [B, od, H, W, Cin]
        y = jax.lax.conv_general_dilated(
            slab.reshape(b * od, h, w_, cin),
            w[dz],
            window_strides=tuple(strides[1:]),
            padding=[tuple(pads[1]), tuple(pads[2])],
            # no preferred_element_type: its transpose rule mixes dtypes
            # under bf16 autodiff (f32 cotangent vs bf16 operand); the
            # TPU conv accumulates f32 inside the MXU regardless
            dimension_numbers=_DIMNUMS_2D,
        )
        out = y if out is None else out + y
    oh, ow = out.shape[1:3]
    return out.astype(x.dtype).reshape(b, od, oh, ow, cout)


def conv3d_b2(x, w, strides=(1, 1, 1), padding="SAME"):
    """3D conv on a 2x2x2 space-to-depth blocking — fills the MXU's
    output-channel lanes at narrow-channel levels.

    At Cout<=32 a direct conv's GEMM feeds only N=Cout of the MXU's 128
    output lanes (25% fill at the flagship's 32-channel levels 0-1 —
    the measured ~10%-of-peak forward). Blocking space by 2 per axis
    multiplies both channel dims by 8 (N=8*Cout fills the array) at the
    cost of structural zeros in the embedded blocked kernel: per-axis
    extent E=ceil((k+1)/2), FLOP overhead prod(4*E)/(8*prod(k)) = 2.37x
    at k=3^3. Net expected ~1.7x at Cout=32, ~3.4x at Cout=16; a LOSS at
    Cout>=64 (fill already >=50%), so any auto policy must gate on Cout.
    FORCE-ONLY (ADELL_CONV_LOWERING=b2): the 2026-08-19 on-chip A/B at
    calibration 197.8 TFLOP/s went to z2d at BOTH cout<=64 shapes (stem
    fwd+bwd 8.1 ms z2d vs 10.7 b2; level2 1.42 vs 2.86 — BASELINE.md
    session-G rows). z2d already reaches 43-61 TF/s there; the 2.37x
    structural-zero overhead eats b2's lane-fill gain.

    Derivation: outputs {2j, 2j+1} read padded coords [2j, 2j+k] (the
    low pad shifts every patch onto a block boundary regardless of its
    size), i.e. blocks {j .. j+E-1}. Blocked weight
    W_b[e][(u,cin)][(o,cout)] = W[2e+u-o] where 0<=2e+u-o<k (e block
    offset, u/o input/output intra-block offsets) — a per-axis one-hot
    embedding applied as one einsum (at most one kernel tap per blocked
    entry, so bf16 stays exact, and the map is linear: autodiff reaches
    w and x through it).

    Stride-1 only: a stride-2 output grid misaligns with the blocks
    (extent 3 per axis, 8x structural overhead — a loss by construction).
    """
    if tuple(strides) != (1, 1, 1):
        raise ValueError("conv3d_b2 supports stride 1 only")
    import numpy as np

    kd, kh, kw, cin, cout = w.shape
    ks = (kd, kh, kw)
    pads = _explicit_pads(x.shape, ks, strides, padding)
    out_sp = tuple(
        x.shape[1 + a] + pads[a][0] + pads[a][1] - ks[a] + 1
        for a in range(3)
    )
    ext = tuple((k + 2) // 2 for k in ks)  # ceil((k+1)/2)
    ob = tuple(-(-o // 2) for o in out_sp)
    pad_cfg = [(0, 0)]
    for a in range(3):
        need = 2 * (ob[a] + ext[a] - 1)
        pad_cfg.append((pads[a][0], need - x.shape[1 + a] - pads[a][0]))
    pad_cfg.append((0, 0))
    xp = jnp.pad(x, pad_cfg)
    b = x.shape[0]
    mb = tuple(xp.shape[1 + a] // 2 for a in range(3))
    xb = (
        xp.reshape(b, mb[0], 2, mb[1], 2, mb[2], 2, cin)
        .transpose(0, 1, 3, 5, 2, 4, 6, 7)
        .reshape(b, mb[0], mb[1], mb[2], 8 * cin)
    )

    def _t(k, e):
        t = np.zeros((e, 2, 2, k), np.float32)
        for eo in range(e):
            for u in range(2):
                for o in range(2):
                    i = 2 * eo + u - o
                    if 0 <= i < k:
                        t[eo, u, o, i] = 1.0
        return t

    t3 = np.einsum(
        "dupi,evqj,fxrk->defuvxpqrijk",
        _t(kd, ext[0]), _t(kh, ext[1]), _t(kw, ext[2]),
    )
    wb = jnp.einsum(
        "defuvxpqrijk,ijkmn->defuvxmpqrn",
        jnp.asarray(t3, w.dtype), w,
    ).reshape(ext[0], ext[1], ext[2], 8 * cin, 8 * cout)
    yb = conv3d_z2d(xb, wb, (1, 1, 1), ((0, 0), (0, 0), (0, 0)))
    y = (
        yb.reshape(b, ob[0], ob[1], ob[2], 2, 2, 2, cout)
        .transpose(0, 1, 4, 2, 5, 3, 6, 7)
        .reshape(b, 2 * ob[0], 2 * ob[1], 2 * ob[2], cout)
    )
    return y[:, : out_sp[0], : out_sp[1], : out_sp[2]]


def conv3d_zfold(x, w, strides=(1, 1, 1), padding="SAME"):
    """3D conv as ONE 2D conv over a z-fold of the input.

    The kd z-taps are concatenated on the channel axis
    ([B, D, H, W, kd*Cin], a kd-x — not k^3-x — patch blowup), then a
    single [kh, kw, kd*Cin, Cout] 2D conv over (H, W) with (B, D) folded
    into the batch finishes the contraction. Gives XLA's 2D conv a wide
    input-channel dim (kd*Cin) at the narrow stem where its 3D tiling
    starves the MXU.
    """
    kd, kh, kw, cin, cout = w.shape
    pads = _explicit_pads(x.shape, (kd, kh, kw), strides, padding)
    xz = jnp.pad(x, ((0, 0), tuple(pads[0])) + ((0, 0),) * 3)
    b, dpad, h, w_, _ = xz.shape
    od = (dpad - kd) // strides[0] + 1
    slabs = [
        jax.lax.slice(
            xz,
            (0, dz, 0, 0, 0),
            (b, dz + (od - 1) * strides[0] + 1, h, w_, cin),
            (1, strides[0], 1, 1, 1),
        )
        for dz in range(kd)
    ]
    xf = jnp.concatenate(slabs, axis=-1)  # [B, od, H, W, kd*Cin]
    # [kh, kw, kd*Cin, Cout] with the channel blocks in dz order
    wf = jnp.concatenate([w[dz] for dz in range(kd)], axis=2)
    y = jax.lax.conv_general_dilated(
        xf.reshape(b * od, h, w_, kd * cin),
        wf,
        window_strides=tuple(strides[1:]),
        padding=[tuple(pads[1]), tuple(pads[2])],
        # no preferred_element_type: see conv3d_z2d
        dimension_numbers=_DIMNUMS_2D,
    ).astype(x.dtype)
    oh, ow = y.shape[1:3]
    return y.reshape(b, od, oh, ow, cout)


def conv3d_s2d(x, w, strides=(1, 1, 1), padding="SAME"):
    """Patchify conv (kernel == strides) as space-to-depth + ONE matmul.

    Non-overlapping windows mean the "conv" is exactly a block reshape
    followed by a [B*V, k^3*Cin] @ [k^3*Cin, Cout] GEMM — the mirror of
    TpuConvTranspose's depth-to-space lowering. Covers ConvNeXt
    stem/downsample and ViT/UNETR convolutional patch embedding, which
    otherwise ride XLA's 3D conv at FULL input resolution (the shape
    class where it craters — BASELINE.md round-3 stem cliff).
    """
    kd, kh, kw, cin, cout = w.shape
    if (kd, kh, kw) != tuple(strides):  # not an assert: must survive -O
        raise ValueError(
            f"s2d requires kernel == strides, got {(kd, kh, kw)} vs "
            f"{tuple(strides)}"
        )
    pads = _explicit_pads(x.shape, (kd, kh, kw), strides, padding)
    xz = jnp.pad(x, ((0, 0),) + tuple(tuple(p) for p in pads) + ((0, 0),))
    b, dpad, hpad, wpad, _ = xz.shape
    od, oh, ow = dpad // kd, hpad // kh, wpad // kw
    # VALID with a non-divisible axis drops the remainder voxels
    xz = xz[:, : od * kd, : oh * kh, : ow * kw]
    xb = xz.reshape(b, od, kd, oh, kh, ow, kw, cin)
    xb = xb.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        b, od, oh, ow, kd * kh * kw * cin
    )
    wf = w.reshape(kd * kh * kw * cin, cout)
    return (xb @ wf).astype(x.dtype)


def conv3d_dw_z2d(x, w, strides=(1, 1, 1), padding="SAME"):
    """Depthwise 3D conv as a sum of kd depthwise 2D convs over z-shifted
    slabs (the z2d decomposition applied per-channel). ``w`` is the flax
    depthwise kernel [kd, kh, kw, 1, C]. Candidate lowering for the
    ConvNeXt 7^3 depthwise (benchmarks/benchmark_conv3d.py); opt-in via
    ADELL_DW_LOWERING=z2d until a healthy-window measurement decides."""
    kd, kh, kw, _, c = w.shape
    pads = _explicit_pads(x.shape, (kd, kh, kw), strides, padding)
    xz = jnp.pad(x, ((0, 0), tuple(pads[0])) + ((0, 0),) * 3)
    b, dpad, h, w_, _ = xz.shape
    od = (dpad - kd) // strides[0] + 1
    out = None
    for dz in range(kd):
        slab = jax.lax.slice(
            xz,
            (0, dz, 0, 0, 0),
            (b, dz + (od - 1) * strides[0] + 1, h, w_, c),
            (1, strides[0], 1, 1, 1),
        )
        y = jax.lax.conv_general_dilated(
            slab.reshape(b * od, h, w_, c),
            w[dz],
            window_strides=tuple(strides[1:]),
            padding=[tuple(pads[1]), tuple(pads[2])],
            dimension_numbers=_DIMNUMS_2D,
            feature_group_count=c,
        )
        out = y if out is None else out + y
    oh, ow = out.shape[1:3]
    return out.astype(x.dtype).reshape(b, od, oh, ow, c)


class TpuDwConv(_nn.Module):
    """Depthwise ``nn.Conv`` drop-in (kernel [*k, 1, C], bias [C] — same
    param tree as nn.Conv with feature_group_count=C). On TPU, 3D
    forwards route through conv3d_dw_z2d by default — it beat XLA's
    grouped conv 2.3-3.6x at the ConvNeXt 7^3 shapes in the 2026-08-18
    healthy-window A/B (1.61 vs 3.73 ms at 32^2x16x96, 0.26 vs 0.94 ms
    at 16^2x8x192, calibration 229 TFLOP/s). ``ADELL_DW_LOWERING``
    forces either lowering on any backend."""

    features: int
    kernel_size: tuple
    strides: tuple = None
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
            k + (1, self.features),
        ).astype(x.dtype)
        # explicit env force wins regardless of backend (same contract as
        # ADELL_CONV_LOWERING in _pick_lowering); auto = z2d on TPU
        lowering = os.environ.get("ADELL_DW_LOWERING") or (
            "z2d" if _tpu_backend() else "xla"
        )
        if ndim == 3 and lowering == "z2d":
            y = conv3d_dw_z2d(x, w, strides, self.padding)
        else:
            spatial = "DHW"[3 - ndim:]
            dn = jax.lax.conv_dimension_numbers(
                x.shape, w.shape,
                ("N" + spatial + "C", spatial + "IO", "N" + spatial + "C"),
            )
            y = jax.lax.conv_general_dilated(
                x, w, window_strides=strides, padding=self.padding,
                dimension_numbers=dn, feature_group_count=self.features,
            )
        if self.use_bias:
            b = self.param("bias", _nn.initializers.zeros, (self.features,))
            # cast like the kernel: an f32 bias would promote the output
            # and silently break the bf16 compute chain downstream
            y = y + b.astype(y.dtype)
        return y


@_partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3d_pallas_trainable(x, w, strides, padding):
    """Implicit-GEMM Pallas forward (ops/pallas/conv.py: voxel-lane GEMM,
    patch matrix built in VMEM — no HBM patch tensor) with the same
    hand-derived matmul backward as the im2col lowering. Callers must
    check ``conv3d_pallas_supported`` first; unsupported shapes fall
    back to im2col here as a belt-and-braces guard."""
    from .pallas.conv import conv3d_pallas_raw

    out = conv3d_pallas_raw(x, w)
    if out is None:
        return conv3d_im2col(x, w, strides, padding)
    return out


def _conv3d_pallas_fwd(x, w, strides, padding):
    return conv3d_pallas_trainable(x, w, strides, padding), (x, w)


conv3d_pallas_trainable.defvjp(_conv3d_pallas_fwd, _conv3d_im2col_bwd)


@jax.custom_vjp
def conv3d_pallas_fz(x, w):
    """Pallas implicit-GEMM FORWARD + z2d-derived BACKWARD (stride-1 SAME
    k=3^3 with one 128-multiple spatial axis; other shapes fall back to
    z2d inside). Why a second trainable pallas wrapper:
    ``conv3d_pallas_trainable``'s backward is the im2col matmul vjp, which
    materializes the k^3 patch tensor in HBM — 3.4 GB at the flagship stem,
    unusable exactly where the Pallas forward pays. Here the backward
    differentiates the z2d lowering instead (its grads are conv-transposes
    XLA tiles well — the production default's own backward), so training
    gets the Pallas forward at z2d's backward cost. The z2d primal built
    by jax.vjp in the backward is dead code (a conv is bilinear: its vjp
    closes over x and w only), so XLA DCEs it."""
    from .pallas.conv import conv3d_pallas_raw

    out = conv3d_pallas_raw(
        x, w, interpret=os.environ.get("ADELL_PALLAS_INTERPRET", "0") == "1"
    )
    if out is None:
        return conv3d_z2d(x, w, (1, 1, 1), "SAME")
    return out


def _pallas_fz_fwd(x, w):
    return conv3d_pallas_fz(x, w), (x, w)


def _pallas_fz_bwd(res, g):
    x, w = res
    _, vjp = jax.vjp(
        lambda a, b: conv3d_z2d(a, b, (1, 1, 1), "SAME"), x, w
    )
    return tuple(vjp(g))


conv3d_pallas_fz.defvjp(_pallas_fz_fwd, _pallas_fz_bwd)


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


def _pick_lowering(x, k, strides, padding="SAME", cout=None):
    """auto: ``z2d`` (sum of kd 2D convs over z-shifted slabs) on TPU
    backends, ``xla`` elsewhere.

    Healthy-chip measurement (BASELINE.md round 3, calibration-bracketed)
    overturned the earlier im2col default: with the MXU at 130-200
    TFLOP/s, XLA's conv family runs 20-170 TFLOP/s at every >=64-channel
    UNet level while im2col's materialized patch tensor holds it to
    4.6-57 (it is HBM-bound by design) and fails to compile at the stem
    (17 GB of lane-padded shifted slices). z2d matched or beat plain xla
    at every shape measured adjacently in the same run (2x at the
    64-ch level, 1.4x at the deepest) — the 2D conv path tiles
    narrow-channel shapes better than the 3D one. im2col's earlier
    "up to 4.5x" wins were measured on contention-degraded windows where
    MXU starvation inverted the ranking; kept as an env opt-in for such
    environments. ``pallas`` remains opt-in (compile service risk)."""
    env = os.environ.get("ADELL_CONV_LOWERING", "auto")
    if env == "s2d":
        # s2d only exists for patchify convs; a forced sweep over a real
        # model must not crash its stride-1 convs — those fall back
        return "s2d" if tuple(k) == tuple(strides) else "z2d"
    if env == "b2":
        # b2 only exists for stride-1 convs; strided convs fall back
        return "b2" if tuple(strides) == (1, 1, 1) else "z2d"
    if env in ("xla", "im2col", "z2d", "zfold", "im2col_t"):
        return env
    if (
        env in ("pallas", "pallas_fz")
        and cout is not None
        and (
            _tpu_backend()
            # interpret mode runs the kernels on CPU — honor the force
            # there too, otherwise off-chip "parity" drives through the
            # dispatcher silently validate the XLA path instead
            or os.environ.get("ADELL_PALLAS_INTERPRET", "0") == "1"
        )
    ):
        from .pallas.conv import conv3d_pallas_supported

        if conv3d_pallas_supported(
            x.shape, tuple(k) + (x.shape[4], cout), strides, padding,
            elt_bytes=x.dtype.itemsize,
        ):
            return env
    if not _tpu_backend():
        return "xla"
    if tuple(k) == tuple(strides):
        # patchify conv (kernel == strides): XLA's conv path WON the
        # healthy-window on-chip A/B (2026-08-18, calibration 229
        # TFLOP/s: 0.19 vs 0.54 ms at the 1-ch ConvNeXt stem, 0.54 vs
        # 2.25 ms at the 4-ch 4^3->768 patch embed) — the explicit
        # space-to-depth reshape materializes a transposed copy XLA's
        # own im2col-style tiling avoids. s2d stays a force-only option
        # (ADELL_CONV_LOWERING=s2d) for environments where the conv path
        # misbehaves.
        return "xla"
    return "z2d"


def _hashable_padding(padding):
    if isinstance(padding, str):
        return padding
    return tuple((int(lo), int(hi)) for lo, hi in padding)


#: Zero-pad Cout up to this many lanes before the conv and slice the
#: result back (exact semantics: extra output channels of an all-zero
#: kernel are zero). Works around the measured narrow-Cout conv cliff;
#: 0 disables. Opt-in until validated on an uncontended chip.
_PAD_COUT = int(os.environ.get("ADELL_CONV_PAD_COUT", 0))
#: only pad when the (large-spatial) voxel count crosses this threshold —
#: small feature maps don't hit the cliff and the extra FLOPs would lose
_PAD_COUT_MIN_VOXELS = int(
    os.environ.get("ADELL_CONV_PAD_COUT_MIN_VOXELS", 256 * 1024)
)


def _maybe_pad_cout(x, w, fn):
    cout = w.shape[4]
    voxels = x.shape[0] * x.shape[1] * x.shape[2] * x.shape[3]
    if (
        _PAD_COUT > 0
        and cout < _PAD_COUT
        and voxels >= _PAD_COUT_MIN_VOXELS
    ):
        w_pad = jnp.pad(w, ((0, 0),) * 4 + ((0, _PAD_COUT - cout),))
        return lambda *a: fn(a[0], w_pad, *a[2:])[..., :cout]
    return fn


def conv3d(x, w, strides=(1, 1, 1), padding="SAME", lowering: str = "auto"):
    # one dtype for every lowering: lax.conv rejects mixed operands
    # outright, and matching w to x here means the output dtype cannot
    # depend on which lowering the auto policy picked
    if w.dtype != x.dtype:
        w = w.astype(x.dtype)
    if lowering == "auto":
        lowering = _pick_lowering(
            x, w.shape[:3], strides, padding, cout=w.shape[4]
        )
    if lowering == "pallas":
        return conv3d_pallas_trainable(
            x, w, tuple(strides), _hashable_padding(padding)
        )
    if lowering == "pallas_fz":
        if tuple(strides) == (1, 1, 1) and padding == "SAME":
            return conv3d_pallas_fz(x, w)
        return conv3d_z2d(x, w, strides, padding)
    if lowering == "im2col":
        return conv3d_im2col_trainable(
            x, w, tuple(strides), _hashable_padding(padding)
        )
    fn = {
        "z2d": conv3d_z2d,
        "zfold": conv3d_zfold,
        "im2col_t": conv3d_im2col_t,
        "s2d": conv3d_s2d,
        "b2": conv3d_b2,
    }.get(lowering, conv3d_xla)
    if lowering == "b2":  # b2 widens cout x8 itself; padding would fight it
        return fn(x, w, strides, padding)
    return _maybe_pad_cout(x, w, fn)(x, w, strides, padding)


class TpuConv(_nn.Module):
    """
    Drop-in for channels-last ``nn.Conv``. On TPU backends the 3D forward
    routes through the measured-best lowering (``_pick_lowering``):
    ``s2d`` (space-to-depth + one GEMM) for patchify convs where
    kernel == strides, else ``z2d`` (sum of z-shifted 2D convs — 7-270x
    over XLA's erratically-pathological 3D path at stem shapes and never
    slower anywhere measured; BASELINE.md round 3). Force with
    ``ADELL_CONV_LOWERING``
    (xla/z2d/zfold/s2d/b2/im2col/im2col_t/pallas/pallas_fz).
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
            _pick_lowering(x, k, strides, self.padding, cout=self.features)
            if ndim == 3
            else "xla"
        )
        if ndim == 3 and lowering == "pallas":
            y = conv3d_pallas_trainable(
                x, w, strides, _hashable_padding(self.padding)
            )
        elif ndim == 3 and lowering == "pallas_fz":
            # same contract as conv3d(): Pallas implicit-GEMM forward for
            # qualifying stride-1 SAME convs, z2d otherwise — without this
            # arm a forced pallas_fz silently fell through to the XLA path
            # this module exists to avoid
            if strides == (1, 1, 1) and self.padding == "SAME":
                y = conv3d_pallas_fz(x, w)
            else:
                y = conv3d_z2d(x, w, strides, self.padding)
        elif ndim == 3 and lowering == "im2col":
            y = conv3d_im2col_trainable(
                x, w, strides, _hashable_padding(self.padding)
            )
        elif ndim == 3 and lowering == "b2":
            y = conv3d_b2(x, w, strides, self.padding)
        elif ndim == 3 and lowering in ("z2d", "zfold", "im2col_t", "s2d"):
            fn = {
                "z2d": conv3d_z2d,
                "zfold": conv3d_zfold,
                "im2col_t": conv3d_im2col_t,
                "s2d": conv3d_s2d,
            }[lowering]
            y = _maybe_pad_cout(x, w, fn)(x, w, strides, self.padding)
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
            # cast like the kernel: an f32 bias would promote the output
            # and silently break the bf16 compute chain downstream
            y = y + b.astype(y.dtype)
        return y


def conv_transpose_block(x, w):
    """Transposed conv with kernel == strides as one matmul + a
    depth-to-space rearrange.

    ``out[b, z*sz+dz, y*sy+dy, x*sx+dx, co] = sum_ci in[..., ci] *
    w[dz, dy, dx, ci, co]`` — for kernel == strides the output blocks
    never overlap, so the transpose conv is a per-voxel linear map
    [V, Cin] @ [Cin, prod(k)*Cout] (lane dim prod(k)*Cout, MXU-wide even
    at narrow decoders) followed by a reshape/transpose. Avoids XLA's
    conv_transpose path, which shares the 3D-conv family's erratic
    narrow-channel behavior on this stack (BASELINE.md round-3).
    Supports any spatial rank.
    """
    k = w.shape[:-2]
    cin, cout = w.shape[-2], w.shape[-1]
    nsp = len(k)
    b = x.shape[0]
    sp = x.shape[1:-1]
    # nn.ConvTranspose (transpose_kernel=False) applies the spatially
    # FLIPPED kernel: out[.., i*s+di, .., o] = sum_c x * w[k-1-di, ..]
    w = jnp.flip(w, axis=tuple(range(nsp)))
    wmat = w.reshape((-1, cin, cout))  # [prod(k), Cin, Cout], tap-major
    wmat = jnp.moveaxis(wmat, 1, 0).reshape(cin, -1)  # [Cin, prod(k)*Cout]
    v = b
    for s_ in sp:
        v *= s_
    xw = jax.lax.dot_general(
        x.reshape(v, cin), wmat,
        dimension_numbers=(((1,), (0,)), ((), ())),
    )  # [V, prod(k)*Cout]
    # [B, *sp, *k, Cout] -> interleave each spatial dim with its tap dim
    xw = xw.reshape((b,) + sp + k + (cout,))
    perm = [0]
    for i in range(nsp):
        perm.extend([1 + i, 1 + nsp + i])
    perm.append(1 + 2 * nsp)
    xw = jnp.transpose(xw, perm)
    out_sp = tuple(s_ * kk for s_, kk in zip(sp, k))
    return xw.reshape((b,) + out_sp + (cout,))


class TpuConvTranspose(_nn.Module):
    """Drop-in for ``nn.ConvTranspose`` restricted to kernel == strides
    (the non-overlapping upsample the UNet decoders use): parameter tree
    matches nn.ConvTranspose (``kernel`` [*k, cin, cout], ``bias``), the
    forward is the block-matmul lowering above. Falls back to
    nn.ConvTranspose semantics only through that equality — callers with
    kernel != strides should use nn.ConvTranspose directly."""

    features: int
    kernel_size: tuple
    use_bias: bool = True

    @_nn.compact
    def __call__(self, x):
        k = tuple(self.kernel_size)
        w = self.param(
            "kernel",
            _nn.initializers.lecun_normal(),
            k + (x.shape[-1], self.features),
        )
        w = w.astype(x.dtype)
        y = conv_transpose_block(x, w)
        if self.use_bias:
            b = self.param(
                "bias", _nn.initializers.zeros, (self.features,)
            )
            y = y + b.astype(y.dtype)
        return y
