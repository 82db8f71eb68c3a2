"""
TrivialAugment-style SSL augmentation engine, on device.

Parity target: adell_mri/modules/augmentations.py — the 27-op registry
(generic/mri_specific/spatial lists :10-37), single-scalar magnitude scaling
(:103-162) and AugmentationWorkhorsed (:189, picks N random ops per sample).
TPU-first design: every op is a jit-safe ``(key, x, magnitude) -> x`` with
static shapes; per-sample op choice is a ``lax.switch`` so one compiled
program covers the whole registry (SURVEY.md §7).
"""

from typing import Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp

from adell_mri_tpu.transforms import intensity as I
from adell_mri_tpu.transforms import spatial as S

AugOp = Callable[[jax.Array, jax.Array, jax.Array], jax.Array]

generic_augments: List[str] = [
    "gaussian_noise",
    "shift_intensity",
    "scale_intensity",
    "contrast",
    "gaussian_smooth_x",
    "gaussian_smooth_y",
    "gaussian_smooth_z",
    "gaussian_sharpen_x",
    "gaussian_sharpen_y",
    "gaussian_sharpen_z",
    "coarse_dropout",
]
mri_specific_augments: List[str] = [
    "rbf",
    "gibbs_noise",
    "spike_noise",
    "rician_noise",
]
spatial_augments: List[str] = [
    "rotate_x",
    "rotate_y",
    "rotate_z",
    "translate_x",
    "translate_y",
    "translate_z",
    "shear_x",
    "shear_y",
    "shear_z",
    "scale_x",
    "scale_y",
    "scale_z",
]


def _smooth_axis(key, x, mag, axis):
    # anisotropic smoothing: blur only one axis
    sigma = 0.3 + mag  # magnitude-scaled
    k1d_radius = 3
    moved = jnp.moveaxis(x, axis, -2)
    flat = moved.reshape(-1, moved.shape[-2], moved.shape[-1])
    grid = jnp.arange(-k1d_radius, k1d_radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (grid / jnp.maximum(sigma, 1e-3)) ** 2)
    k = k / jnp.sum(k)
    kernel = jnp.tile(k[:, None, None], (1, 1, flat.shape[-1]))
    conv = jax.lax.conv_general_dilated(
        flat, kernel, (1,), [(k1d_radius, k1d_radius)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=flat.shape[-1],
    )
    return jnp.moveaxis(conv.reshape(moved.shape), -2, axis)


def _sharpen_axis(key, x, mag, axis):
    return x + (0.5 + mag) * (x - _smooth_axis(key, x, 0.5, axis))


def _coarse_dropout(key, x, mag):
    ndim = x.ndim - 1
    grid = 8
    k = jax.random.uniform(key, (grid,) * ndim + (1,))
    keep = (k > 0.1 * (1 + mag)).astype(x.dtype)
    mask = jax.image.resize(keep, x.shape[:-1] + (1,), method="nearest")
    return x * mask


def _spike_noise(key, x, mag):
    """k-space spike (RandKSpaceSpikeNoise analogue)."""
    ndim = x.ndim - 1
    axes = tuple(range(ndim))
    kk = jnp.fft.fftn(x, axes=axes)
    pos_key, amp_key = jax.random.split(key)
    pos = [
        jax.random.randint(jax.random.fold_in(pos_key, d), (), 0, x.shape[d])
        for d in range(ndim)
    ]
    log_mag = jnp.log(jnp.maximum(jnp.mean(jnp.abs(kk)), 1e-6)) + (
        4.0 + 4.0 * mag
    )
    spike = jnp.exp(log_mag)
    flat_idx = 0
    # scatter one spike via dynamic_update_slice on the flattened array
    strides = []
    acc = 1
    for d in reversed(range(ndim)):
        strides.insert(0, acc)
        acc *= x.shape[d]
    flat_idx = sum(p * s for p, s in zip(pos, strides))
    kflat = kk.reshape(-1, x.shape[-1])
    kflat = kflat.at[flat_idx].add(spike)
    out = jnp.fft.ifftn(kflat.reshape(kk.shape), axes=axes)
    return jnp.real(out).astype(x.dtype)


def _affine_one(key, x, mag, kind: str, axis: int):
    ndim = x.ndim - 1
    shape = x.shape[:-1]
    n_angles = 1 if ndim == 2 else 3
    angles = jnp.zeros(n_angles)
    scales = jnp.ones(ndim)
    shears = jnp.zeros(ndim * (ndim - 1))
    trans = jnp.zeros(ndim)
    sign = jnp.where(jax.random.bernoulli(key), 1.0, -1.0)
    if kind == "rotate":
        angles = angles.at[min(axis, n_angles - 1)].set(sign * mag * jnp.pi / 6)
    elif kind == "translate":
        trans = trans.at[axis].set(sign * mag * 0.1 * shape[axis])
    elif kind == "shear":
        shears = shears.at[axis * (ndim - 1)].set(sign * mag * 0.3)
    elif kind == "scale":
        scales = scales.at[axis].set(1.0 + sign * mag * 0.3)
    m = (
        S.center_matrix(shape, +1.0)
        @ S.rotation_matrix(ndim, angles)
        @ S.scale_shear_matrix(ndim, scales, shears)
        @ S.center_matrix(shape, -1.0)
    )
    m = m.at[:ndim, ndim].add(trans)
    return S.warp_affine(x, m)


def build_registry(ndim: int = 3) -> Dict[str, AugOp]:
    """All ops share the signature (key, x, magnitude in [0,1]) -> x."""
    reg: Dict[str, AugOp] = {
        "gaussian_noise": lambda k, x, m: I.gaussian_noise(k, x, 1.0 * m),
        "shift_intensity": lambda k, x, m: x
        + jax.random.uniform(k, (), minval=-0.5, maxval=0.5) * m,
        "scale_intensity": lambda k, x, m: x
        * (1.0 + jax.random.uniform(k, (), minval=-0.5, maxval=0.5) * m),
        "contrast": lambda k, x, m: I.adjust_contrast(
            k, x, gamma_range=(1.0 / (1.0 + 2.0 * m + 1e-6), 1.0 + 2.0 * m)
        ),
        "coarse_dropout": _coarse_dropout,
        "rbf": lambda k, x, m: I.bias_field(k, x, magnitude=0.3 * m),
        "gibbs_noise": lambda k, x, m: I.gibbs_ringing(
            k, x, alpha_range=(1.0 - 0.9 * m, 1.0 - 0.5 * m + 1e-3)
        ),
        "spike_noise": _spike_noise,
        "rician_noise": lambda k, x, m: I.rician_noise(k, x, 0.3 * m),
    }
    for d, ax in enumerate("xyz"[:ndim]):
        reg[f"gaussian_smooth_{ax}"] = (
            lambda k, x, m, d=d: _smooth_axis(k, x, m, d)
        )
        reg[f"gaussian_sharpen_{ax}"] = (
            lambda k, x, m, d=d: _sharpen_axis(k, x, m, d)
        )
        for kind in ("rotate", "translate", "shear", "scale"):
            reg[f"{kind}_{ax}"] = (
                lambda k, x, m, kind=kind, d=d: _affine_one(k, x, m, kind, d)
            )
    return reg


class AugmentationWorkhorse:
    """
    TrivialAugment engine (parity: AugmentationWorkhorsed,
    modules/augmentations.py:189): for each call, picks ``n_transforms``
    random ops from the registry with random magnitudes and applies them
    sequentially. Compiled once: op selection is lax.switch over the full
    registry; one program covers all op sequences.
    """

    def __init__(
        self,
        augmentations: Sequence[str] = None,
        n_transforms: int = 1,
        ndim: int = 3,
    ):
        registry = build_registry(ndim)
        if augmentations is None:
            augmentations = list(registry)
        self.names = [a for a in augmentations if a in registry]
        self.ops = [registry[n] for n in self.names]
        self.n_transforms = n_transforms

    def __call__(self, key: jax.Array, x: jax.Array) -> jax.Array:
        # unrolled python loop: n_transforms is tiny and static, and each
        # iteration needs fresh rng keys inside the switch branches
        for _ in range(self.n_transforms):
            key, k_choice, k_mag, k_op = jax.random.split(key, 4)
            choice = jax.random.randint(k_choice, (), 0, len(self.ops))
            mag = jax.random.uniform(k_mag)
            x = jax.lax.switch(
                choice,
                [
                    (lambda op: lambda x: op(k_op, x, mag))(op)
                    for op in self.ops
                ],
                x,
            )
        return x
