"""
On-device intensity transforms.

Replaces the CPU MONAI intensity chain (ScaleIntensityd, RandGaussianNoised,
RandRicianNoised, RandGibbsNoised, RandBiasFieldd, RandAdjustContrastd,
RandGaussianSmoothd, histogram shift — transform_factory/augmentations.py:29-177
and utils/monai_transforms/image_intensity_ops.py) with fused elementwise JAX
ops that XLA folds into neighbouring kernels. All functions take
channels-last arrays and are jit/vmap-safe with static output shapes.
"""

from typing import Optional

import jax
import jax.numpy as jnp


def scale_intensity(x, minv: float = 0.0, maxv: float = 1.0, eps: float = 1e-6):
    """Min-max rescale to [minv, maxv] (ScaleIntensityd analogue)."""
    lo = jnp.min(x)
    hi = jnp.max(x)
    return (x - lo) / jnp.maximum(hi - lo, eps) * (maxv - minv) + minv


def conditional_rescale(x, max_value: float, scaling_factor: float):
    """
    Rescales by ``scaling_factor`` only when the max exceeds ``max_value``
    (parity: ConditionalRescalingd,
    utils/monai_transforms/image_intensity_ops.py:77 — used for ADC maps with
    ADC_FACTOR = -2/3, transform_factory/transforms.py:24).
    """
    needs = jnp.max(x) > max_value
    return jnp.where(needs, x * scaling_factor, x)


def offset_intensity(x, offset: Optional[float] = None):
    """Subtracts offset (default: per-volume min; parity: Offsetd :124)."""
    off = jnp.min(x) if offset is None else offset
    return x - off


def normalize(x, eps: float = 1e-6):
    """Zero-mean unit-variance (NormalizeIntensityd analogue)."""
    return (x - jnp.mean(x)) / jnp.maximum(jnp.std(x), eps)


def scale_intensity_along_dim(x, axis: int = -2, eps: float = 1e-6):
    """
    Per-slice min-max scaling along one axis (parity:
    ScaleIntensityAlongDimd :265).
    """
    axes = tuple(d for d in range(x.ndim) if d != axis % x.ndim)
    lo = jnp.min(x, axis=axes, keepdims=True)
    hi = jnp.max(x, axis=axes, keepdims=True)
    return (x - lo) / jnp.maximum(hi - lo, eps)


def gaussian_noise(key, x, std: float = 0.1):
    return x + jax.random.normal(key, x.shape, x.dtype) * std


def rician_noise(key, x, std: float = 0.1):
    """sqrt((x+n1)^2 + n2^2) — MRI magnitude noise (RandRicianNoised)."""
    k1, k2 = jax.random.split(key)
    n1 = jax.random.normal(k1, x.shape, x.dtype) * std
    n2 = jax.random.normal(k2, x.shape, x.dtype) * std
    return jnp.sqrt((x + n1) ** 2 + n2**2)


def gibbs_ringing(key, x, alpha_range=(0.2, 0.8)):
    """
    Truncates high k-space frequencies (RandGibbsNoised analogue). FFT runs
    on device; alpha is the fraction of spectrum RETAINED — the INVERSE of
    MONAI's convention (there alpha=0 is the identity, 1 full truncation;
    callers translating reference ranges must pass 1 - monai_alpha).
    """
    ndim = x.ndim - 1
    alpha = jax.random.uniform(
        key, (), minval=alpha_range[0], maxval=alpha_range[1]
    )
    axes = tuple(range(ndim))
    k = jnp.fft.fftshift(jnp.fft.fftn(x, axes=axes), axes=axes)
    mask = jnp.ones((), bool)
    for d in range(ndim):
        n = x.shape[d]
        freq = jnp.abs(jnp.arange(n) - n / 2) / (n / 2)
        keep = freq <= alpha
        shape = [1] * x.ndim
        shape[d] = n
        mask = mask & keep.reshape(shape)
    k = jnp.where(mask, k, 0.0)
    out = jnp.fft.ifftn(jnp.fft.ifftshift(k, axes=axes), axes=axes)
    return jnp.real(out).astype(x.dtype)


def bias_field(key, x, grid_size: int = 4, magnitude: float = 0.3):
    """
    Multiplicative smooth bias field: coarse log-field upsampled and
    exponentiated (RandBiasFieldd analogue; the N4 *correction* inverse
    BiasFieldCorrectiond :203 is a host-side preprocessing op).
    """
    ndim = x.ndim - 1
    coarse = jax.random.normal(key, (grid_size,) * ndim + (1,)) * magnitude
    field = jax.image.resize(
        coarse, x.shape[:-1] + (1,), method="cubic"
    )
    return x * jnp.exp(field)


def adjust_contrast(key, x, gamma_range=(0.7, 1.5), eps: float = 1e-6):
    """Gamma contrast on a [0,1]-normalized copy (RandAdjustContrastd)."""
    gamma = jax.random.uniform(
        key, (), minval=gamma_range[0], maxval=gamma_range[1]
    )
    lo, hi = jnp.min(x), jnp.max(x)
    unit = (x - lo) / jnp.maximum(hi - lo, eps)
    return unit**gamma * (hi - lo) + lo


def _gaussian_kernel1d(sigma, radius: int):
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / jnp.maximum(sigma, 1e-3)) ** 2)
    return k / jnp.sum(k)


def gaussian_smooth(x, sigma: float = 1.0, radius: int = 3):
    """Separable Gaussian blur over spatial axes (RandGaussianSmoothd)."""
    ndim = x.ndim - 1
    k1d = _gaussian_kernel1d(jnp.asarray(sigma, jnp.float32), radius)
    out = x
    for d in range(ndim):
        shape = [1] * (x.ndim + 1)
        # conv via correlation along axis d: move axis to last, use conv1d
        moved = jnp.moveaxis(out, d, -2)  # [..., L, C]
        flat = moved.reshape(-1, moved.shape[-2], moved.shape[-1])
        kernel = jnp.tile(
            k1d[:, None, None], (1, 1, flat.shape[-1])
        )  # [K, 1, C]
        conv = jax.lax.conv_general_dilated(
            flat,
            kernel,
            window_strides=(1,),
            padding=[(radius, radius)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=flat.shape[-1],
        )
        out = jnp.moveaxis(
            conv.reshape(moved.shape), -2, d
        )
    return out


def random_gaussian_smooth(key, x, sigma_range=(0.5, 1.5), radius: int = 3):
    sigma = jax.random.uniform(
        key, (), minval=sigma_range[0], maxval=sigma_range[1]
    )
    return gaussian_smooth(x, sigma, radius)


def sharpen(x, alpha: float = 1.0, sigma: float = 1.0):
    """Unsharp mask (RandGaussianSharpend analogue)."""
    return x + alpha * (x - gaussian_smooth(x, sigma))


def histogram_shift(key, x, num_control_points: int = 10):
    """
    Random monotone intensity remap via control points
    (RandHistogramShiftd analogue).
    """
    lo, hi = jnp.min(x), jnp.max(x)
    unit = (x - lo) / jnp.maximum(hi - lo, 1e-6)
    ref = jnp.linspace(0, 1, num_control_points)
    jitter = jax.random.uniform(
        key, (num_control_points,), minval=0.0, maxval=1.0
    )
    new_pts = jnp.sort(jitter)
    new_pts = new_pts.at[0].set(0.0).at[-1].set(1.0)
    remapped = jnp.interp(unit, ref, new_pts)
    return remapped * (hi - lo) + lo


def low_resolution(key, x, zoom_range=(0.5, 1.0)):
    """
    Simulates low resolution: downsample by a random factor and resize back
    (RandSimulateLowResolutiond analogue). Uses a static worst-case
    intermediate grid with coordinate scaling to stay shape-static.
    """
    zoom = jax.random.uniform(
        key, (), minval=zoom_range[0], maxval=zoom_range[1]
    )
    # downsample-then-upsample approximated by smoothing with sigma ~ 1/zoom
    sigma = jnp.clip((1.0 / zoom - 1.0), 0.0, 3.0)
    return gaussian_smooth(x, sigma)


def salt_and_pepper(key, x, prob: float = 0.01):
    k1, k2 = jax.random.split(key)
    noise = jax.random.uniform(k1, x.shape)
    lo, hi = jnp.min(x), jnp.max(x)
    x = jnp.where(noise < prob / 2, lo, x)
    return jnp.where(noise > 1 - prob / 2, hi, x)
