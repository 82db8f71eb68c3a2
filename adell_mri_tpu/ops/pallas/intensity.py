"""
Fused intensity augmentation as one Pallas TPU kernel.

The reference applies RandGaussianNoised / RandRicianNoised /
RandAdjustContrastd / RandScaleIntensityd / RandShiftIntensityd as separate
CPU MONAI transforms (transform_factory/augmentations.py:29-177). The
jax.random equivalents in ``transforms/intensity.py`` each pay a threefry
key expansion and a separate HBM pass when not fused. This kernel does the
whole chain in ONE read-modify-write over the volume using the TPU's
on-chip PRNG (pltpu.prng_random_bits):

    out = clip_or_not( (unit(x) ** gamma) * span + lo ) * scale + shift
          + sigma * N(0, 1)        (gaussian)   OR
          sqrt((x + n1)^2 + n2^2)  (rician)

All parameters are traced scalars so one compiled kernel serves every
random draw. Volumes are processed as (rows, 128) lane-aligned blocks.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per grid step; 512 x 128 x 4B = 256 KiB per buffer — small enough to
# double-buffer comfortably in ~16 MB VMEM, large enough to amortize grid
# overhead
_BLOCK_ROWS = 512
_LANES = 128


def _uniform_from_bits(bits):
    """uint32 -> float32 uniform in [0, 1) via mantissa trick."""
    f = pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000), jnp.float32)
    return f - 1.0


def _normal_pair(shape):
    """Two standard-normal draws via Box-Muller on PRNG bits."""
    u1 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32))
    u2 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32))
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
    theta = 2.0 * jnp.pi * u2
    return r * jnp.cos(theta), r * jnp.sin(theta)


def _kernel(seed_ref, par_ref, x_ref, o_ref, *, rician: bool, noise: bool):
    # per-block seed: mix the grid position in so blocks draw independent
    # streams from one host-provided seed. Scalars arrive as plain SMEM
    # inputs — PrefetchScalarGridSpec wedges the axon remote compiler (see
    # memory note axon-pallas-quirks).
    if noise:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))

    lo = par_ref[0, 0]
    hi = par_ref[1, 0]
    gamma = par_ref[2, 0]
    scale = par_ref[3, 0]
    shift = par_ref[4, 0]
    sigma = par_ref[5, 0]

    x = x_ref[:]
    span = jnp.maximum(hi - lo, 1e-6)
    unit = (x - lo) / span
    # gamma contrast on the unit-normalized volume (RandAdjustContrastd)
    unit = jnp.exp(gamma * jnp.log(jnp.maximum(unit, 1e-6)))
    x = unit * span + lo
    # multiplicative scale + additive shift (RandScale/ShiftIntensityd)
    x = x * scale + shift
    if noise:
        n1, n2 = _normal_pair(x.shape)
        if rician:
            x = jnp.sqrt((x + sigma * n1) ** 2 + (sigma * n2) ** 2)
        else:
            x = x + sigma * n1
    o_ref[:] = x


def fused_intensity_aug(
    seed,
    x,
    lo,
    hi,
    gamma=1.0,
    scale=1.0,
    shift=0.0,
    sigma=0.0,
    rician: bool = False,
):
    """
    One-pass fused intensity chain. ``x`` is any-shaped float32 volume whose
    element count is a multiple of 128; ``lo``/``hi`` are its precomputed
    min/max (one cheap XLA reduction, fused upstream). ``seed`` is an int32
    scalar. Falls back to the XLA reference off-TPU.
    """
    # a concretely-zero sigma must disable the noise branch entirely: the
    # Rician magnitude sqrt((x+0)^2 + 0^2) = |x| would silently rectify
    # negative voxels of z-score-normalized volumes (the batch variant
    # already gates on sigma > 0)
    try:
        noise = float(sigma) > 0.0
    except TypeError:  # traced sigma: keep the branch, value decides
        noise = True
    if jax.devices()[0].platform not in ("tpu", "axon"):
        return fused_intensity_aug_reference(
            seed, x, lo, hi, gamma, scale, shift, sigma, rician and noise
        )
    return _fused_intensity_kernel_call(
        seed, x, lo, hi, gamma, scale, shift, sigma,
        rician=rician, noise=noise,
    )


@functools.partial(jax.jit, static_argnames=("rician", "noise"))
def _fused_intensity_kernel_call(
    seed, x, lo, hi, gamma, scale, shift, sigma,
    rician: bool = False, noise: bool = True,
):
    shape = x.shape
    flat = x.reshape(-1, _LANES)
    rows = flat.shape[0]
    block = min(_BLOCK_ROWS, rows)
    grid = pl.cdiv(rows, block)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    par = jnp.stack(
        [
            jnp.asarray(v, jnp.float32)
            for v in (lo, hi, gamma, scale, shift, sigma)
        ]
    ).reshape(6, 1)
    out = pl.pallas_call(
        functools.partial(_kernel, rician=rician, noise=noise),
        out_shape=jax.ShapeDtypeStruct(flat.shape, jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (6, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (block, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (block, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )(seed_arr, par, flat.astype(jnp.float32))
    return out.reshape(shape).astype(x.dtype)


def _batch_kernel(seed_ref, par_ref, x_ref, o_ref, *, rician: bool, noise: bool):
    """Per-sample-parameter variant: grid (B, row_blocks); par [B, 6] lives
    unblocked in SMEM (SMEM blocks cannot split the batch dim) and is
    indexed by the batch program id."""
    bi = pl.program_id(0)
    if noise:
        pltpu.prng_seed(
            seed_ref[0, 0] + bi * pl.num_programs(1) + pl.program_id(1)
        )
    lo = par_ref[bi, 0]
    hi = par_ref[bi, 1]
    gamma = par_ref[bi, 2]
    scale = par_ref[bi, 3]
    shift = par_ref[bi, 4]
    sigma = par_ref[bi, 5]
    x = x_ref[0]
    span = jnp.maximum(hi - lo, 1e-6)
    unit = (x - lo) / span
    unit = jnp.exp(gamma * jnp.log(jnp.maximum(unit, 1e-6)))
    x = unit * span + lo
    x = x * scale + shift
    if noise:
        n1, n2 = _normal_pair(x.shape)
        if rician:
            # per-sample sigma can be 0 (prob-gated off): the magnitude
            # would rectify negatives to |x|, so guard like the scalar path
            x = jnp.where(
                sigma > 0.0,
                jnp.sqrt((x + sigma * n1) ** 2 + (sigma * n2) ** 2),
                x,
            )
        else:
            x = x + sigma * n1
    o_ref[0] = x


@functools.partial(jax.jit, static_argnames=("rician", "noise"))
def _fused_batch_kernel_call(seed, x, par, rician: bool, noise: bool):
    """x [B, *S, C] -> same; par [B, 6] = (lo, hi, gamma, scale, shift,
    sigma) per sample."""
    b = x.shape[0]
    shape = x.shape
    flat = x.reshape(b, -1, _LANES)
    rows = flat.shape[1]
    block = min(_BLOCK_ROWS, rows)
    grid = (b, pl.cdiv(rows, block))
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    out = pl.pallas_call(
        functools.partial(_batch_kernel, rician=rician, noise=noise),
        out_shape=jax.ShapeDtypeStruct(flat.shape, jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda bi, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, block, _LANES),
                lambda bi, i: (bi, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block, _LANES),
            lambda bi, i: (bi, i, 0),
            memory_space=pltpu.VMEM,
        ),
    )(seed_arr, par.astype(jnp.float32), flat.astype(jnp.float32))
    return out.reshape(shape).astype(x.dtype)


def fused_intensity_aug_batch(
    key,
    x,
    gamma_range=(0.7, 1.5),
    scale_delta: float = 0.1,
    shift_delta: float = 0.1,
    sigma: float = 0.0,
    rician: bool = True,
    gamma_prob: float = 1.0,
    shift_prob: float = 1.0,
    noise_prob: float = 1.0,
    std_shift: bool = False,
):
    """
    Batch-level fused gamma-contrast + scale/shift + noise with per-sample
    random parameters (replaces the RandAdjustContrastd /
    RandScaleIntensityd / RandShiftIntensityd / RandRicianNoised chain).
    One HBM pass on TPU; vectorized XLA math elsewhere.

    ``*_prob`` fire each op per SAMPLE like the reference's MONAI chain
    (every Rand*d carries prob=0.2, transform_factory/augmentations.py:51)
    — a non-firing sample gets that op's exact identity parameters.
    ``std_shift`` scales the shift by the sample's standard deviation
    (RandStdShiftIntensityd semantics: shift = factor * std(x)).
    """
    b = x.shape[0]
    kg, ksc, ksh, kseed, kn, kp = jax.random.split(key, 6)
    gamma = jax.random.uniform(
        kg, (b,), minval=gamma_range[0], maxval=gamma_range[1]
    )
    scale = 1.0 + jax.random.uniform(
        ksc, (b,), minval=-scale_delta, maxval=scale_delta
    )
    shift = jax.random.uniform(
        ksh, (b,), minval=-shift_delta, maxval=shift_delta
    )
    red_axes = tuple(range(1, x.ndim))
    lo = jnp.min(x, axis=red_axes)
    hi = jnp.max(x, axis=red_axes)
    if std_shift:
        shift = shift * jnp.std(
            x.astype(jnp.float32), axis=red_axes
        )
    kpg, kps, kpn = jax.random.split(kp, 3)
    if gamma_prob < 1.0:
        gamma = jnp.where(
            jax.random.bernoulli(kpg, gamma_prob, (b,)), gamma, 1.0
        )
    if shift_prob < 1.0:
        fire = jax.random.bernoulli(kps, shift_prob, (b,))
        scale = jnp.where(fire, scale, 1.0)
        shift = jnp.where(fire, shift, 0.0)
    sig = jnp.full((b,), float(sigma), jnp.float32)
    if noise_prob < 1.0:
        sig = jnp.where(
            jax.random.bernoulli(kpn, noise_prob, (b,)), sig, 0.0
        )
    noise = sigma > 0
    total = 1
    for s in x.shape[1:]:
        total *= s
    # the kernel variants exercised so far (scalar-prefetch, batched SMEM
    # params) wedge the axon remote-compile service (memory note
    # axon-pallas-quirks), so the pallas path is opt-in; the XLA fallback
    # is a fully fused elementwise chain and costs only the threefry bits
    import os

    use_kernel = os.environ.get("ADELL_PALLAS_INTENSITY", "0") == "1"
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    if use_kernel and on_tpu and total % _LANES == 0:
        par = jnp.stack([lo, hi, gamma, scale, shift, sig], axis=1)
        seed = jax.random.randint(kseed, (), 0, 2**31 - 1)
        return _fused_batch_kernel_call(
            seed, x, par, rician=rician, noise=noise
        )
    # vectorized fallback (identical math, threefry noise)
    bshape = (b,) + (1,) * (x.ndim - 1)
    lo_b, hi_b = lo.reshape(bshape), hi.reshape(bshape)
    span = jnp.maximum(hi_b - lo_b, 1e-6)
    unit = (x - lo_b) / span
    unit = jnp.exp(gamma.reshape(bshape) * jnp.log(jnp.maximum(unit, 1e-6)))
    out = unit * span + lo_b
    out = out * scale.reshape(bshape) + shift.reshape(bshape)
    if noise:
        k1, k2 = jax.random.split(kn)
        n1 = jax.random.normal(k1, x.shape, jnp.float32)
        sig_b = sig.reshape(bshape)
        if rician:
            n2 = jax.random.normal(k2, x.shape, jnp.float32)
            # guard per-sample sigma==0 (prob-gated off): the magnitude
            # would rectify negative voxels to |x|
            out = jnp.where(
                sig_b > 0,
                jnp.sqrt((out + sig_b * n1) ** 2 + (sig_b * n2) ** 2),
                out,
            )
        else:
            out = out + sig_b * n1
    return out.astype(x.dtype)


def fused_intensity_aug_reference(
    seed, x, lo, hi, gamma=1.0, scale=1.0, shift=0.0, sigma=0.0, rician=False
):
    """Pure-XLA oracle with identical math (different random stream)."""
    key = jax.random.PRNGKey(jnp.asarray(seed, jnp.int32))
    span = jnp.maximum(hi - lo, 1e-6)
    unit = (x - lo) / span
    unit = jnp.exp(gamma * jnp.log(jnp.maximum(unit, 1e-6)))
    out = unit * span + lo
    out = out * scale + shift
    k1, k2 = jax.random.split(key)
    n1 = jax.random.normal(k1, x.shape, jnp.float32)
    if rician:
        n2 = jax.random.normal(k2, x.shape, jnp.float32)
        out = jnp.sqrt((out + sigma * n1) ** 2 + (sigma * n2) ** 2)
    else:
        out = out + sigma * n1
    return out.astype(x.dtype)
