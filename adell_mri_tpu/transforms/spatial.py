"""
On-device spatial transforms.

Replaces the CPU MONAI spatial chain (RandAffined / Rand*Elasticd / flips /
crops — adell_mri/transform_factory/augmentations.py:29-177 and
utils/monai_transforms/image_ops.py) with jit-compiled JAX. The core design
(SURVEY.md §7): all geometric augmentation composes into ONE affine (+ one
optional elastic displacement field), applied as a single trilinear gather —
instead of MONAI's chain of sequential CPU resamples.

Conventions: volumes are channels-last ``[*spatial, C]``; batched variants
are built with ``jax.vmap``. Matrices are homogeneous (ndim+1)² acting on
voxel coordinates (unit = voxel; callers fold spacing in if needed).
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# interpolation core
# ---------------------------------------------------------------------------


def _gather_nd(vol: jax.Array, idx: Sequence[jax.Array]) -> jax.Array:
    """vol[*spatial, C] gathered at integer index arrays (same shape)."""
    return vol[tuple(idx)]


def sample_volume(
    vol: jax.Array,
    coords: jax.Array,
    method: str = "linear",
    cval: float = 0.0,
) -> jax.Array:
    """
    Samples ``vol`` [*S, C] at fractional voxel ``coords`` [ndim, *out_S].
    Trilinear/bilinear (method="linear") or nearest. Out-of-bounds -> cval.
    One fused gather per corner; XLA lowers this to efficient dynamic
    gathers on TPU.
    """
    ndim = coords.shape[0]
    spatial = vol.shape[:ndim]
    in_bounds = jnp.ones(coords.shape[1:], bool)
    for d in range(ndim):
        in_bounds &= (coords[d] >= 0) & (coords[d] <= spatial[d] - 1)

    if method == "nearest":
        idx = [
            jnp.clip(jnp.round(coords[d]).astype(jnp.int32), 0, spatial[d] - 1)
            for d in range(ndim)
        ]
        out = _gather_nd(vol, idx)
    else:
        lo = [jnp.floor(coords[d]) for d in range(ndim)]
        frac = [coords[d] - lo[d] for d in range(ndim)]
        lo = [
            jnp.clip(lo[d].astype(jnp.int32), 0, spatial[d] - 1)
            for d in range(ndim)
        ]
        hi = [jnp.clip(lo[d] + 1, 0, spatial[d] - 1) for d in range(ndim)]
        out = 0.0
        for corner in range(2**ndim):
            idx, w = [], 1.0
            for d in range(ndim):
                if corner >> d & 1:
                    idx.append(hi[d])
                    w = w * frac[d]
                else:
                    idx.append(lo[d])
                    w = w * (1.0 - frac[d])
            out = out + _gather_nd(vol, idx) * w[..., None]
    mask = in_bounds[..., None]
    return jnp.where(mask, out, jnp.asarray(cval, vol.dtype))


def affine_coords(
    matrix: jax.Array, out_shape: Sequence[int]
) -> jax.Array:
    """
    Homogeneous matrix [(ndim+1), (ndim+1)] -> input-space coordinates
    [ndim, *out_shape] for every output voxel.
    """
    import math

    ndim = len(out_shape)
    n_vox = math.prod(int(s) for s in out_shape)
    grids = jnp.meshgrid(
        *[jnp.arange(s, dtype=jnp.float32) for s in out_shape], indexing="ij"
    )
    flat = jnp.stack(
        [g.reshape(-1) for g in grids] + [jnp.ones((n_vox,), jnp.float32)]
    )
    mapped = matrix @ flat
    return mapped[:ndim].reshape((ndim,) + tuple(out_shape))


def warp_affine(
    vol: jax.Array,
    matrix: jax.Array,
    out_shape: Optional[Sequence[int]] = None,
    method: str = "linear",
    cval: float = 0.0,
    displacement: Optional[jax.Array] = None,
) -> jax.Array:
    """
    One fused affine (+elastic) resample: output voxel o samples input at
    ``matrix @ o (+ displacement[o])``. ``displacement`` is [ndim, *out_S].
    """
    out_shape = tuple(out_shape or vol.shape[:-1])
    coords = affine_coords(matrix, out_shape)
    if displacement is not None:
        coords = coords + displacement
    return sample_volume(vol, coords, method=method, cval=cval)


# ---------------------------------------------------------------------------
# matrix builders
# ---------------------------------------------------------------------------


def _homogeneous(ndim: int, linear: jax.Array, translation: jax.Array):
    m = jnp.eye(ndim + 1)
    m = m.at[:ndim, :ndim].set(linear)
    m = m.at[:ndim, ndim].set(translation)
    return m


def center_matrix(shape: Sequence[int], sign: float = 1.0) -> jax.Array:
    ndim = len(shape)
    c = jnp.asarray([(s - 1) / 2.0 for s in shape])
    return _homogeneous(ndim, jnp.eye(ndim), sign * c)


def rotation_matrix(ndim: int, angles: jax.Array) -> jax.Array:
    """angles: [1] for 2D, [3] for 3D (about each axis pair)."""
    if ndim == 2:
        c, s = jnp.cos(angles[0]), jnp.sin(angles[0])
        rot = jnp.asarray([[c, -s], [s, c]])
    else:
        cx, sx = jnp.cos(angles[0]), jnp.sin(angles[0])
        cy, sy = jnp.cos(angles[1]), jnp.sin(angles[1])
        cz, sz = jnp.cos(angles[2]), jnp.sin(angles[2])
        rx = jnp.asarray([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        ry = jnp.asarray([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        rz = jnp.asarray([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        rot = rx @ ry @ rz
    return _homogeneous(ndim, rot, jnp.zeros(ndim))


def scale_shear_matrix(
    ndim: int, scales: jax.Array, shears: Optional[jax.Array] = None
) -> jax.Array:
    lin = jnp.diag(scales)
    if shears is not None:
        # fill off-diagonals row-major (MONAI shear convention)
        k = 0
        for i in range(ndim):
            for j in range(ndim):
                if i != j:
                    lin = lin.at[i, j].set(shears[k])
                    k += 1
    return _homogeneous(ndim, lin, jnp.zeros(ndim))


def random_affine_matrix(
    key: jax.Array,
    shape: Sequence[int],
    rotate_range: float = 0.0,
    scale_range: float = 0.0,
    shear_range: float = 0.0,
    translate_range: float = 0.0,
) -> jax.Array:
    """
    Samples a centered random affine (parity: RandomAffined,
    utils/monai_transforms/random.py:11 / RandAffined usage in
    transform_factory/augmentations.py).
    """
    ndim = len(shape)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n_angles = 1 if ndim == 2 else 3

    def _per_axis(v, n):
        # per-axis bounds (reference RandAffined rotate_range is a 3-list,
        # scale_range [0.1, 0.1, 0.05], translate_range [4, 4, 1],
        # augmentations.py:103,291-299); scalars broadcast, traced OK
        v = jnp.asarray(v, jnp.float32).reshape(-1)
        return jnp.broadcast_to(v[:n] if v.size > 1 else v, (n,))

    rot = _per_axis(rotate_range, n_angles)
    angles = jax.random.uniform(
        k1, (n_angles,), minval=-rot, maxval=rot
    )
    scl = _per_axis(scale_range, ndim)
    scales = 1.0 + jax.random.uniform(
        k2, (ndim,), minval=-scl, maxval=scl
    )
    shears = jax.random.uniform(
        k3, (ndim * (ndim - 1),), minval=-shear_range, maxval=shear_range
    )
    trn = _per_axis(translate_range, ndim)
    trans = jax.random.uniform(
        k4, (ndim,), minval=-trn, maxval=trn
    ) * jnp.asarray(shape)
    m = (
        center_matrix(shape, +1.0)
        @ rotation_matrix(ndim, angles)
        @ scale_shear_matrix(ndim, scales, shears)
        @ center_matrix(shape, -1.0)
    )
    return m.at[:ndim, ndim].add(trans)


def random_elastic_displacement(
    key: jax.Array,
    out_shape: Sequence[int],
    grid_size: int = 4,
    magnitude: float = 2.0,
) -> jax.Array:
    """
    Coarse random displacement grid upsampled to the output shape
    (Rand3DElasticd analogue). Returns [ndim, *out_shape] in voxels.
    """
    ndim = len(out_shape)
    coarse = jax.random.normal(
        key, (ndim,) + (grid_size,) * ndim
    ) * magnitude
    return jax.image.resize(
        coarse, (ndim,) + tuple(out_shape), method="cubic"
    )


# ---------------------------------------------------------------------------
# flips / crops / padding
# ---------------------------------------------------------------------------


def random_flip(key: jax.Array, vol: jax.Array, axes: Sequence[int], prob: float = 0.5):
    """Randomly flips spatial axes (RandFlipd analogue); jit-safe."""
    keys = jax.random.split(key, len(axes))
    for ax, k in zip(axes, keys):
        do = jax.random.bernoulli(k, prob)
        vol = jnp.where(do, jnp.flip(vol, axis=ax), vol)
    return vol


def random_flip_with_matrix(
    key: jax.Array,
    vol: jax.Array,
    axes: Sequence[int],
    ndim: int,
    prob: float = 0.5,
):
    """``random_flip`` (same key-split pattern, so identical draws) that also
    returns the homogeneous reflection matrix mapping output voxel -> input
    voxel, so callers can relocate host-precomputed coordinates (e.g. the
    pos/neg-crop foreground indices) through the applied geometry."""
    keys = jax.random.split(key, len(axes))
    diag = jnp.ones((ndim,))
    trans = jnp.zeros((ndim,))
    for ax, k in zip(axes, keys):
        do = jax.random.bernoulli(k, prob)
        vol = jnp.where(do, jnp.flip(vol, axis=ax), vol)
        diag = diag.at[ax].set(jnp.where(do, -1.0, 1.0))
        trans = trans.at[ax].set(
            jnp.where(do, float(vol.shape[ax] - 1), 0.0)
        )
    return vol, _homogeneous(ndim, jnp.diag(diag), trans)


def center_crop_or_pad(vol: jax.Array, target: Sequence[int], cval: float = 0.0):
    """Static center crop/pad of spatial axes to ``target`` (channels-last)."""
    ndim = len(target)
    out = vol
    # pad first
    pads = []
    for d in range(ndim):
        diff = max(0, target[d] - out.shape[d])
        pads.append((diff // 2, diff - diff // 2))
    pads.append((0, 0))
    if any(p != (0, 0) for p in pads):
        out = jnp.pad(out, pads, constant_values=cval)
    # then crop
    starts = [max(0, (out.shape[d] - target[d]) // 2) for d in range(ndim)]
    slices = tuple(
        slice(s, s + t) for s, t in zip(starts, target)
    ) + (slice(None),)
    return out[slices]


def dynamic_crop(vol: jax.Array, start: jax.Array, size: Sequence[int]):
    """Crop at a traced start index (jit-safe via dynamic_slice)."""
    ndim = len(size)
    starts = [start[d] for d in range(ndim)] + [0]
    sizes = list(size) + [vol.shape[-1]]
    return jax.lax.dynamic_slice(vol, starts, sizes)


def random_crop(key: jax.Array, vol: jax.Array, size: Sequence[int]):
    """Uniform random crop of fixed size."""
    ndim = len(size)
    maxs = jnp.asarray(
        [max(vol.shape[d] - size[d], 0) for d in range(ndim)]
    )
    u = jax.random.uniform(key, (ndim,))
    start = jnp.floor(u * (maxs + 1)).astype(jnp.int32)
    start = jnp.minimum(start, maxs)
    return dynamic_crop(vol, start, size)


def pos_neg_crop(
    key: jax.Array,
    vol: jax.Array,
    label: jax.Array,
    size: Sequence[int],
    fg_indices: jax.Array,
    n_fg: jax.Array,
    pos_ratio: float = 0.5,
):
    """
    RandCropByPosNegLabeld analogue (SURVEY.md §7 hard parts): with
    probability ``pos_ratio`` center the crop on a random foreground voxel
    drawn from host-precomputed ``fg_indices`` [max_fg, ndim] (padded; n_fg
    gives the valid count), else crop uniformly. Fixed output size, jit-safe.
    """
    ndim = len(size)
    k1, k2, k3 = jax.random.split(key, 3)
    maxs = jnp.asarray([max(vol.shape[d] - size[d], 0) for d in range(ndim)])
    # uniform start
    u = jax.random.uniform(k1, (ndim,))
    uniform_start = jnp.minimum(
        jnp.floor(u * (maxs + 1)).astype(jnp.int32), maxs
    )
    # fg-centered start
    idx = jax.random.randint(k2, (), 0, jnp.maximum(n_fg, 1))
    center = fg_indices[idx]
    fg_start = jnp.clip(
        center - jnp.asarray([s // 2 for s in size]), 0, maxs
    )
    use_fg = jnp.logical_and(
        jax.random.bernoulli(k3, pos_ratio), n_fg > 0
    )
    start = jnp.where(use_fg, fg_start, uniform_start)
    return (
        dynamic_crop(vol, start, size),
        dynamic_crop(
            label if label.ndim == vol.ndim else label[..., None],
            start,
            size,
        ),
        start,
    )


def random_slices(
    key: jax.Array,
    vol: jax.Array,
    label: jax.Array,
    n_slices: int,
    axis: int = -2,
    base: float = 0.001,
):
    """
    Mask-weighted 2.5D slice sampling (parity: RandomSlices,
    utils/monai_transforms/random.py:120): each slice's weight is its
    share of the volume's positive voxels plus ``base`` (the reference's
    minimum probability; its 2D segmentation path passes 0.05,
    entrypoints/segmentation/train.py:392), and ``n_slices`` DISTINCT
    slices are drawn (torch.multinomial without replacement) via the
    Gumbel top-k trick. Returns vol/label with the slice axis reduced to
    n_slices. ``axis`` indexes the FULL (channels-last) array; the default
    -2 is the last spatial axis of a ``[*spatial, C]`` volume.
    """
    axis = axis % vol.ndim
    if axis == vol.ndim - 1:
        raise ValueError(
            "random_slices axis is the channel axis of a channels-last "
            "volume; pass a spatial axis (default -2 = last spatial)"
        )
    if n_slices > vol.shape[axis]:
        raise ValueError(
            f"n_slices={n_slices} exceeds the {vol.shape[axis]}-slice axis "
            "(sampling is without replacement, like the reference)"
        )
    lab = label if label.ndim == vol.ndim else label[..., None]
    sum_axes = tuple(d for d in range(lab.ndim) if d != axis)
    # positive-voxel share per slice (multiclass integer labels count each
    # foreground voxel once; the reference averages per-class proportions)
    sums = jnp.sum((lab > 0).astype(jnp.float32), axis=sum_axes)
    weights = sums / jnp.maximum(jnp.sum(sums), 1.0) + base
    # Efraimidis-Spirakis: top-k of log(w) + Gumbel noise == weighted
    # sampling without replacement
    g = jax.random.gumbel(key, weights.shape)
    _, idx = jax.lax.top_k(jnp.log(weights) + g, n_slices)
    return (
        jnp.take(vol, idx, axis=axis),
        jnp.take(lab, idx, axis=axis),
    )


def get_all_crops(vol: jax.Array, size: Sequence[int], strides: Optional[Sequence[int]] = None):
    """
    Deterministic tiling of a volume into all crops (parity: GetAllCropsd,
    utils/monai_transforms/image_ops.py:330). Static shapes: returns
    [n_crops, *size, C].
    """
    ndim = len(size)
    strides = strides or size
    # undersized axes pad up to the crop size first (negative starts would
    # otherwise wrap or produce short crops that break jnp.stack)
    if any(vol.shape[d] < size[d] for d in range(ndim)):
        vol = center_crop_or_pad(
            vol, [max(vol.shape[d], size[d]) for d in range(ndim)]
        )
    starts_per_dim = []
    for d in range(ndim):
        s = list(range(0, vol.shape[d] - size[d] + 1, strides[d]))
        if s[-1] != vol.shape[d] - size[d]:
            s.append(vol.shape[d] - size[d])
        starts_per_dim.append(s)
    import itertools

    crops = []
    for combo in itertools.product(*starts_per_dim):
        slices = tuple(
            slice(st, st + sz) for st, sz in zip(combo, size)
        ) + (slice(None),)
        crops.append(vol[slices])
    return jnp.stack(crops)


# ---------------------------------------------------------------------------
# gather-free separable affine warp
# ---------------------------------------------------------------------------
#
# XLA lowers the 8-corner gather of `warp_affine` to slow TPU gathers
# (~45 ms for a [128,128,32] batch-of-4 on v5e). For augmentation-sized
# affines the same warp decomposes exactly into single-axis passes:
#   M = L @ D @ U   (unit-lower  x  diagonal  x  unit-upper, Doolittle)
# Each unit-triangular factor is one or two SHEAR passes — resampling one
# axis at integer+fractional shifts that are CONSTANT along that axis — so
# linear interpolation becomes a sum of statically-sliced, hat-weighted
# copies (pure VPU, no gather). The diagonal factor is a per-axis
# scale+translate, one tiny [out, in] hat-weight matmul per axis (MXU).
#
# Accuracy: each individual pass is EXACT 1D linear interpolation, but the
# composition differs from one-shot trilinear interpolation (each pass
# re-interpolates the previous pass's piecewise-linear output) — the same
# property as the classic multi-pass shear rotation algorithms. On smooth
# volumes the deviation is ~2% mean relative; on white noise it can be
# large. USE FOR AUGMENTATION ONLY (a random warp with a slightly wider
# interpolation kernel is an equally valid augmentation); deterministic
# preprocessing and inference resampling use the exact host fastvol /
# gather paths. ~28x faster than the XLA gather warp on TPU v5e.


def _hat(x):
    return jnp.maximum(0.0, 1.0 - jnp.abs(x))


def _ldu_3x3(m, eps=1e-6):
    """Doolittle LDU of a 3x3 (no pivoting). Returns (l21,l31,l32),
    (d0,d1,d2), (u12,u13,u23) of M = L @ diag(d) @ U."""
    a = m
    d0 = a[0, 0]
    u12 = a[0, 1] / jnp.where(jnp.abs(d0) < eps, eps, d0)
    u13 = a[0, 2] / jnp.where(jnp.abs(d0) < eps, eps, d0)
    l21 = a[1, 0] / jnp.where(jnp.abs(d0) < eps, eps, d0)
    d1 = a[1, 1] - l21 * a[0, 1]
    u23 = (a[1, 2] - l21 * a[0, 2]) / jnp.where(jnp.abs(d1) < eps, eps, d1)
    l31 = a[2, 0] / jnp.where(jnp.abs(d0) < eps, eps, d0)
    l32 = (a[2, 1] - l31 * a[0, 1]) / jnp.where(jnp.abs(d1) < eps, eps, d1)
    d2 = a[2, 2] - l31 * a[0, 2] - l32 * u23 * d1
    return (l21, l31, l32), (d0, d1, d2), (u12, u13, u23)


def _shear_pass(vol, axis, shift, max_shift, method, cval):
    """out[..., i, ...] = vol sampled at i + shift along ``axis``; shift is
    broadcastable to vol's spatial shape with size 1 on ``axis``. Sum of
    2*max_shift+1 statically sliced hat-weighted copies."""
    size = vol.shape[axis]
    pad = [(0, 0)] * vol.ndim
    pad[axis] = (max_shift, max_shift)
    padded = jnp.pad(vol, pad, constant_values=cval)
    shift = jnp.clip(shift, -max_shift, max_shift)
    if method == "nearest":
        shift = jnp.round(shift)
    out = jnp.zeros_like(vol)
    for d in range(-max_shift, max_shift + 1):
        # weights in the volume dtype: only two adjacent terms are nonzero
        # so low-precision accumulation is safe, and bf16 halves the HBM
        # traffic of the slice sweep
        w = _hat(shift - d).astype(vol.dtype)
        sl = [slice(None)] * vol.ndim
        sl[axis] = slice(max_shift + d, max_shift + d + size)
        out = out + w * padded[tuple(sl)]
    return out


def _scale_pass(vol, axis, scale, offset, method, cval):
    """out[..., i, ...] = vol sampled at scale*i + offset along ``axis``
    via one [out, in] hat-weight matmul."""
    size = vol.shape[axis]
    i = jnp.arange(size, dtype=jnp.float32)
    pos = scale * i + offset
    if method == "nearest":
        pos = jnp.round(pos)
    w = _hat(pos[:, None] - i[None, :])  # [out, in]
    moved = jnp.moveaxis(vol, axis, 0)
    flat = moved.reshape(size, -1)
    out = w @ flat + (1.0 - jnp.sum(w, axis=1))[:, None] * cval
    # positions fully outside [0, size-1] -> cval
    valid = (pos >= -1.0) & (pos <= size)
    out = jnp.where(valid[:, None], out, cval)
    return jnp.moveaxis(out.reshape(moved.shape), 0, axis)


def warp_affine_separable(
    vol: jax.Array,
    matrix: jax.Array,
    max_shift: int = 32,
    method: str = "linear",
    cval: float = 0.0,
) -> jax.Array:
    """
    Gather-free equivalent of ``warp_affine`` for 3D volumes [X, Y, Z, C]:
    output voxel o samples input at ``matrix @ o`` (homogeneous 4x4).
    ``max_shift`` statically bounds the per-line shear displacement
    (ceil(max off-diagonal coefficient x axis length)); shifts beyond it
    clamp. Output shape = input shape.
    """
    m = matrix[:3, :3]
    t = matrix[:3, 3]
    (l21, l31, l32), (d0, d1, d2), (u12, u13, u23) = _ldu_3x3(m)
    # fold the translation into the diagonal pass: t = L @ s  =>  s
    s0 = t[0]
    s1 = t[1] - l21 * s0
    s2 = t[2] - l31 * s0 - l32 * s1

    x = jnp.arange(vol.shape[0], dtype=jnp.float32)
    y = jnp.arange(vol.shape[1], dtype=jnp.float32)
    z = jnp.arange(vol.shape[2], dtype=jnp.float32)

    out = vol
    # L passes (applied to the original volume; innermost factor)
    out = _shear_pass(
        out, 1, (l21 * x)[:, None, None, None], max_shift, method, cval
    )
    out = _shear_pass(
        out,
        2,
        (l31 * x[:, None] + l32 * y[None, :])[:, :, None, None],
        max_shift,
        method,
        cval,
    )
    # D pass: per-axis scale + translation
    out = _scale_pass(out, 0, d0, s0, method, cval)
    out = _scale_pass(out, 1, d1, s1, method, cval)
    out = _scale_pass(out, 2, d2, s2, method, cval)
    # U passes (outermost factor: applied last, in output coordinates).
    # Composing axis0-then-axis1 shears gives an extra u12*u23 term in the
    # (0,2) slot, so the axis0 pass uses u13 - u12*u23.
    u13_c = u13 - u12 * u23
    out = _shear_pass(
        out,
        0,
        (u12 * y[:, None] + u13_c * z[None, :])[None, :, :, None],
        max_shift,
        method,
        cval,
    )
    out = _shear_pass(
        out, 1, (u23 * z)[None, None, :, None], max_shift, method, cval
    )
    return out


def separable_max_shift(
    shape: Sequence[int], rotate_range, shear_range: float
) -> int:
    """Static per-line shift bound for warp_affine_separable given the
    augmentation policy's rotation/shear ranges (LDU shear coefficients
    are bounded by ~tan of the combined angle; 1.3x safety margin).
    ``rotate_range`` may be a per-axis sequence (reference RandAffined
    rotate_range=[pi/8, pi/8, pi/16]); the bound uses its max."""
    import math

    if not isinstance(rotate_range, (int, float)):
        rotate_range = max(rotate_range) if len(rotate_range) else 0.0
    coeff = math.tan(min(rotate_range + shear_range, 1.0)) * 1.3
    return max(1, int(math.ceil(coeff * max(shape))))


def compose_flips(
    key: jax.Array,
    matrix: jax.Array,
    shape: Sequence[int],
    axes: Sequence[int],
    prob: float = 0.5,
):
    """
    Folds per-axis random reflections into an affine warp matrix: axis d
    flips with probability ``prob`` by negating its row about the volume
    centre — the separable warp's scale pass then realizes the flip for
    free (negative scale), saving a full-volume select+reverse per axis.
    """
    ndim = len(shape)
    flips = jax.random.bernoulli(key, prob, (len(axes),))
    diag = jnp.ones((ndim,))
    trans = jnp.zeros((ndim,))
    for i, d in enumerate(axes):
        sign = jnp.where(flips[i], -1.0, 1.0)
        diag = diag.at[d].set(sign)
        # reflection about the centre: i -> (s-1) - i
        trans = trans.at[d].set(jnp.where(flips[i], float(shape[d] - 1), 0.0))
    f = _homogeneous(ndim, jnp.diag(diag), trans)
    return matrix @ f
