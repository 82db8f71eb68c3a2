"""
Host-side deterministic preprocessing (runs once per volume, cached).

Replaces the deterministic prefix of the reference's MONAI pipeline —
LoadImaged -> Orientationd(RAS) -> Spacingd -> Resized/SpatialPadd/
CenterSpatialCropd (transform_factory/transforms.py:106-259) — with a single
composed resample (one scipy map_coordinates call per volume instead of a
chain). Everything random runs on device (adell_mri_tpu.transforms.*).

Also ports the spacing-inference helpers
(adell_mri/utils/sitk_utils.py:43,74).
"""

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from adell_mri_tpu.data.nifti import NiftiImage, read_nifti, reorient_to_ras
from adell_mri_tpu.utils import get_logger

logger = get_logger(__name__)


def spacing_values_from_dataset_json(
    dataset: Dict[str, dict], key: str, n: Optional[int] = None
) -> List[Tuple[float, ...]]:
    """Reads voxel spacings from NIfTI headers (parity: sitk_utils.py:43)."""
    spacings = []
    for i, (pid, entry) in enumerate(dataset.items()):
        if n is not None and i >= n:
            break
        if key not in entry:
            continue
        try:
            img = read_nifti(entry[key])
            spacings.append(tuple(float(s) for s in img.spacing))
        except Exception as e:
            logger.warning("spacing read failed for %s: %s", pid, e)
    return spacings


def get_spacing_quantile(
    spacings: List[Tuple[float, ...]], q: float = 0.5
) -> List[float]:
    """Per-axis quantile of spacings (parity: sitk_utils.py:74)."""
    arr = np.asarray(spacings)
    return [float(x) for x in np.quantile(arr, q, axis=0)]


def resample_to_spec(
    img: NiftiImage,
    target_spacing: Optional[Sequence[float]] = None,
    target_size: Optional[Sequence[int]] = None,
    interp_order: int = 1,
    cval: float = 0.0,
    keep_channels: bool = False,
) -> np.ndarray:
    """
    One composed resample: target grid -> (crop/pad center alignment) ->
    spacing scale -> original voxel grid, evaluated with a single
    map_coordinates call. Matches Spacingd + CenterSpatialCropd/SpatialPadd
    composition but touches each voxel once.

    4D NIfTIs (e.g. multi-b-value DWI): ``keep_channels=True`` resamples
    every trailing-axis channel and returns ``[x, y, z, C]``; the default
    keeps the historical first-channel behavior for 3D-contract callers.
    """
    data = img.data
    if data.ndim > 3:
        if keep_channels:
            flat = data.reshape(data.shape[:3] + (-1,))
            chans = [
                resample_to_spec(
                    NiftiImage(
                        data=np.ascontiguousarray(flat[..., c]),
                        affine=img.affine,
                        header=img.header,
                    ),
                    target_spacing,
                    target_size,
                    interp_order=interp_order,
                    cval=cval,
                )
                for c in range(flat.shape[-1])
            ]
            return np.stack(chans, axis=-1)
        data = data[..., 0]
    spacing = img.spacing
    if target_spacing is None:
        target_spacing = spacing
    zoom = np.asarray(spacing, float) / np.asarray(target_spacing, float)
    resampled_shape = np.round(np.asarray(data.shape) * zoom).astype(int)
    if target_size is None:
        target_size = resampled_shape
    target_size = np.asarray(target_size, int)

    # center offset of the target grid inside the (virtually) resampled
    # grid; dst[i] samples src at (i + offset) / zoom — one fused gather
    # via the native fastvol kernel (scipy fallback inside)
    from adell_mri_tpu.data.native import resample_affine_grid

    offset = (resampled_shape - target_size) / 2.0
    return resample_affine_grid(
        data.astype(np.float32),
        tuple(int(t) for t in target_size),
        zoom=list(zoom),
        offset=list(offset),
        order=interp_order,
        cval=cval,
    )


def precompute_fg_indices(
    label: np.ndarray, max_fg: int = 4096, seed: int = 0
) -> Tuple[np.ndarray, int]:
    """
    Foreground voxel coordinates for device-side pos/neg cropping
    (FgBgToIndicesd analogue, SURVEY.md §7 hard parts): padded to a fixed
    ``max_fg`` so shapes stay static under jit.
    """
    ndim = label.ndim
    fg = np.argwhere(label > 0)
    n = len(fg)
    if n == 0:
        return np.zeros((max_fg, ndim), np.int32), 0
    if n > max_fg:
        rng = np.random.default_rng(seed)
        fg = fg[rng.choice(n, size=max_fg, replace=False)]
        n = max_fg
    out = np.zeros((max_fg, ndim), np.int32)
    out[:n] = fg
    return out, n


def area_resize(vol: np.ndarray, out_shape: Sequence[int]) -> np.ndarray:
    """
    Adaptive-average ("area" mode) resize, exact vs
    ``torch.nn.functional.interpolate(mode="area")`` /
    ``adaptive_avg_pool``: output cell i averages source indices
    [floor(i*in/out), ceil((i+1)*in/out)). Computed with one integral
    image per call — O(voxels) regardless of zoom factor. This is the
    engine under MONAI ``Resized(mode="area")``, the reference's image
    resize (entrypoints/segmentation/train.py:180-203).
    """
    vol = np.asarray(vol, np.float64)
    out_shape = tuple(int(s) for s in out_shape)
    ndim = len(out_shape)
    # integral image with a zero border on every resized axis
    integ = vol
    for ax in range(ndim):
        integ = np.cumsum(integ, axis=ax)
        pad = [(0, 0)] * integ.ndim
        pad[ax] = (1, 0)
        integ = np.pad(integ, pad)

    bounds = []
    for ax, out in enumerate(out_shape):
        n = vol.shape[ax]
        i = np.arange(out)
        lo = np.floor(i * n / out).astype(np.int64)
        hi = np.ceil((i + 1) * n / out).astype(np.int64)
        bounds.append((lo, hi))

    # inclusion-exclusion over the 2^ndim corners of each output box
    out = np.zeros(
        out_shape + vol.shape[ndim:], np.float64
    )
    count = np.ones(out_shape, np.float64)
    for ax, (lo, hi) in enumerate(bounds):
        shape = [1] * ndim
        shape[ax] = -1
        count = count * (hi - lo).reshape(shape)
    for corner in range(2**ndim):
        idx = []
        sign = 1.0
        for ax, (lo, hi) in enumerate(bounds):
            if corner >> ax & 1:
                idx.append(lo)
            else:
                idx.append(hi)
            sign *= -1.0 if (corner >> ax & 1) else 1.0
        grids = np.ix_(*idx)
        out = out + sign * integ[grids]
    count = count.reshape(out_shape + (1,) * (vol.ndim - ndim))
    return (out / count).astype(np.float32)


def center_crop_pad(vol: np.ndarray, target: Sequence[int]) -> np.ndarray:
    """Center crop/pad on the leading len(target) axes (SpatialPadd +
    CenterSpatialCropd composition)."""
    target = tuple(int(t) for t in target)
    for ax, t in enumerate(target):
        s = vol.shape[ax]
        if s < t:
            pad = [(0, 0)] * vol.ndim
            pad[ax] = ((t - s) // 2, t - s - (t - s) // 2)
            vol = np.pad(vol, pad)
        elif s > t:
            lo = (s - t) // 2
            sl = [slice(None)] * vol.ndim
            sl[ax] = slice(lo, lo + t)
            vol = vol[tuple(sl)]
    return vol


def nearest_resize(vol: np.ndarray, out_shape: Sequence[int]) -> np.ndarray:
    """Nearest-neighbour resize on the leading len(out_shape) axes (the
    reference's label resize mode)."""
    out_shape = tuple(int(s) for s in out_shape)
    # torch 'nearest' convention: src = floor(i * in / out)
    idx = tuple(
        np.minimum(
            np.floor(np.arange(o) * vol.shape[ax] / o), vol.shape[ax] - 1
        ).astype(np.int64)
        for ax, o in enumerate(out_shape)
    )
    return vol[np.ix_(*idx)]


def make_load_fn(
    image_keys: Sequence[str],
    label_keys: Optional[Sequence[str]] = None,
    target_spacing: Optional[Sequence[float]] = None,
    target_size: Optional[Sequence[int]] = None,
    resize_size: Optional[Sequence[int]] = None,
    adc_keys: Sequence[str] = (),
    adc_factor: float = -2 / 3,
    max_fg: int = 4096,
    label_mode: str = "binary",
    positive_labels: Sequence[int] = (1,),
    scale_intensity: bool = True,
    extra_scalar_keys: Sequence[str] = (),
    missing_to_empty: bool = False,
    sample_channels: Optional[int] = None,
):
    """
    Builds the CachedVolumeDataset load_fn: reads every image key, RAS
    orients, resamples once to (target_spacing, target_size), min-max scales
    (ADC keys conditionally rescaled instead,
    transform_factory/transforms.py:24), stacks channels-last, combines/
    binarizes labels (LabelOperatorSegmentationd analogue) and precomputes
    fg indices.

    4D NIfTIs contribute ALL their channels (LoadImaged
    ensure_channel_first semantics); ``sample_channels=N`` randomly keeps N
    of each key's channels when it has more (parity: SampleChannelDimd,
    utils/monai_transforms.py:2418, applied per key in the SSL/generation
    pipelines, transform_factory/transforms.py:573,678). Like the
    reference's cached pre-transforms, the random pick happens once at
    load/cache time, not per epoch.
    """
    label_keys = list(label_keys or [])

    def load_fn(entry: Dict) -> Dict:
        channels = []
        weights = []
        for key in image_keys:
            if missing_to_empty and key not in entry:
                # fabricate an empty modality + zero availability weight
                # (parity: CreateImageAndWeightsd,
                # utils/monai_transforms/generic_data_ops.py:122)
                channels.append(None)
                weights.append(0.0)
                continue
            img = reorient_to_ras(read_nifti(entry[key]))
            if resize_size is not None:
                # reference order (transforms.py:152-173): Spacingd ->
                # Resized(mode="area", SCALE not crop) -> pad/crop
                vol = resample_to_spec(
                    img, target_spacing, None, keep_channels=True
                )
                if vol.ndim == 4:
                    vol = np.stack(
                        [
                            area_resize(vol[..., c], resize_size)
                            for c in range(vol.shape[-1])
                        ],
                        axis=-1,
                    )
                else:
                    vol = area_resize(vol, resize_size)
                if target_size is not None:
                    vol = center_crop_pad(vol, target_size)
            else:
                vol = resample_to_spec(
                    img, target_spacing, target_size, keep_channels=True
                )
            if vol.ndim == 3:
                vol = vol[..., None]
            if (
                sample_channels is not None
                and vol.shape[-1] > sample_channels
            ):
                picks = np.random.choice(
                    vol.shape[-1], sample_channels, replace=False
                )
                vol = vol[..., picks]
            # intensity ops act on the key's whole (multi-channel) tensor,
            # matching the per-key MONAI dict transforms
            if key in adc_keys:
                # ADC conditional rescale (image_intensity_ops.py:77)
                if vol.max() > 1e3:
                    vol = vol * adc_factor
            elif scale_intensity:
                lo, hi = vol.min(), vol.max()
                vol = (vol - lo) / max(hi - lo, 1e-6)
            channels.append(vol)
            weights.append(1.0)
        if missing_to_empty:
            present = next(c for c in channels if c is not None)
            if present.shape[-1] != 1:
                raise ValueError(
                    "missing_to_empty (BrUNet's one-channel-per-modality "
                    "contract) does not support multi-channel (4D) inputs"
                )
            channels = [
                c if c is not None else np.zeros_like(present)
                for c in channels
            ]
        image = np.concatenate(channels, axis=-1).astype(np.float32)
        sample = {"image": image, "identifier": entry.get("identifier", "")}
        if missing_to_empty:
            sample["image_weights"] = np.asarray(weights, np.float32)

        if label_keys:
            labs = []
            for key in label_keys:
                img = reorient_to_ras(read_nifti(entry[key]))
                if resize_size is not None:
                    # labels scale with nearest (Resized mode="nearest")
                    lab = resample_to_spec(
                        img, target_spacing, None, interp_order=0
                    )
                    lab = nearest_resize(lab, resize_size)
                    if target_size is not None:
                        lab = center_crop_pad(lab, target_size)
                else:
                    lab = resample_to_spec(
                        img, target_spacing, target_size, interp_order=0
                    )
                labs.append(lab)
            lab = np.stack(labs, axis=0).max(axis=0)
            if label_mode == "binary":
                lab = np.isin(
                    np.round(lab).astype(np.int32), np.asarray(positive_labels)
                ).astype(np.float32)
            else:
                lab = np.round(lab).astype(np.float32)
            sample["label"] = lab
            fg, n_fg = precompute_fg_indices(lab, max_fg)
            sample["fg_indices"] = fg
            sample["n_fg"] = np.int32(n_fg)
        for key in extra_scalar_keys:
            if key in entry:
                sample[key] = np.asarray(entry[key], np.float32)
        return sample

    return load_fn
