"""
Per-task transform factories.

Parity target: adell_mri/transform_factory/transforms.py —
SegmentationTransforms (:67), ClassificationTransforms (:362),
SSLTransforms (:641), GenerationTransforms (:555) — and the augmentation
policies of transform_factory/augmentations.py (get_augmentations_unet :19
etc., flag set {intensity, noise, rbf, affine, shear, flip, blur, distort,
lowres, trivial}).

TPU split of labour (SURVEY.md §7): each factory exposes
- ``load_fn()``      host-side deterministic preprocessing (cached once), and
- ``augment(key, batch)`` a jit-compiled batched device function carrying ALL
  randomness; geometric ops compose into one warp, intensity ops fuse.
"""

from dataclasses import dataclass, field
from typing import Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from adell_mri_tpu.transforms import intensity as I
from adell_mri_tpu.transforms import spatial as S
from adell_mri_tpu.transforms.augment import AugmentationWorkhorse
from adell_mri_tpu.transforms.host import make_load_fn


@dataclass
class AugmentPolicy:
    """Flag set mirroring get_augmentations_* (augmentations.py:29-177)."""

    intensity: bool = True
    noise: bool = True  # Rician + Gibbs
    rbf: bool = False  # bias field
    affine: bool = True
    shear: bool = False
    flip: bool = True
    blur: bool = False
    distort: bool = False  # elastic/grid distortion (RandGridDistortiond)
    lowres: bool = False  # simulated low resolution (RandSimulateLowResolutiond)
    trivial: bool = False  # TrivialAugment OneOf with prob 1
    # per-op fire probability — the reference passes prob=0.2 to every
    # Rand*d it assembles (augmentations.py:51); each op draws its own
    # gate per sample, identity when it does not fire
    prob: float = 0.2
    # ranges (reference values from transform_factory/augmentations.py)
    rotate_range: Tuple[float, float, float] = (
        0.39269908,  # pi/8
        0.39269908,  # pi/8
        0.19634954,  # pi/16  (RandAffined rotate_range, :103)
    )
    # scale/translate accept a scalar or a per-axis tuple (reference class
    # factory: scale [0.1, 0.1, 0.05], translate [4, 4, 1] voxels — ours
    # is a fraction of shape; augmentations.py:291-299)
    scale_range: Union[float, Tuple[float, ...]] = 0.1
    shear_range: float = 0.1
    translate_range: Union[float, Tuple[float, ...]] = 0.0
    gamma_range: Tuple[float, float] = (0.5, 1.5)  # RandAdjustContrastd :71
    scale_delta: float = 0.0  # the reference has no scale-intensity op
    shift_delta: float = 0.1  # RandStdShiftIntensityd factors=0.1 (:74)
    std_shift: bool = True  # shift = factor * std(x), MONAI semantics
    noise_std: float = 0.02  # RandRicianNoised std (:85)
    distort_prob: float = 0.2  # reference prob=0.2 (augmentations.py:51)
    distort_magnitude: float = 2.0  # voxels, ~distort_limit 0.05 at 40vox
    lowres_prob: float = 0.2
    blur_prob: float = 0.1  # RandGaussianSmoothd MONAI default prob
    flip_prob: float = 0.25  # RandFlipd per-axis prob (:130)
    flip_axes: Tuple[int, ...] = (0,)

    @classmethod
    def from_flags(cls, flags: Sequence[str], **kw) -> "AugmentPolicy":
        flags = set(flags or [])
        return cls(
            intensity="intensity" in flags,
            noise="noise" in flags,
            rbf="rbf" in flags,
            affine="affine" in flags,
            shear="shear" in flags,
            flip="flip" in flags,
            blur="blur" in flags,
            distort="distort" in flags,
            lowres="lowres" in flags,
            trivial="trivial" in flags,
            **kw,
        )


def _augment_one(
    key,
    image,
    label,
    policy: AugmentPolicy,
    workhorse: Optional[AugmentationWorkhorse] = None,
    return_geometry: bool = False,
):
    """
    Single-sample augmentation: ONE fused warp for all geometry (affine +
    shear folded into one matrix; label warped with nearest) + fused
    intensity/noise ops. image [*S, C]; label [*S] or None.

    With ``return_geometry=True`` also returns the homogeneous matrix
    mapping OUTPUT voxel -> INPUT voxel for the applied geometric ops
    (None when no geometry ran), so callers can relocate host-precomputed
    coordinates (pos/neg-crop fg indices) through the warp. The elastic
    displacement field is not folded in (bounded by ~distort_magnitude
    voxels — negligible at crop scale).
    """
    ndim = image.ndim - 1
    shape = image.shape[:-1]
    keys = jax.random.split(key, 8)
    # warp/intensity internals compute in f32 for interpolation accuracy,
    # but the AUGMENT boundary must preserve the caller's dtype: a silent
    # f32 output from a bf16 input promotes every downstream matmul/conv
    # to f32 (bf16 params @ f32 activations), which measured as a ~40%
    # tax on the whole aug+forward graph (BASELINE.md round-3 session F)
    in_dtype = image.dtype
    label_dtype = None if label is None else label.dtype

    fold_flip = policy.flip and (policy.affine or policy.shear) and ndim == 3
    # elastic distortion composes into the SAME warp as a displacement field
    # (RandGridDistortiond parity, augmentations.py:51: limit 0.05, p=0.2);
    # it forces the gather warp path since the shear-decomposed separable
    # warp cannot carry a per-voxel displacement
    displacement = None
    if policy.distort:
        do_distort = jax.random.bernoulli(keys[2], policy.distort_prob)
        displacement = (
            S.random_elastic_displacement(
                keys[3], shape, magnitude=policy.distort_magnitude
            )
            * do_distort
        )
    geom = None  # output voxel -> input voxel, for return_geometry
    if policy.affine or policy.shear or policy.distort:
        # the reference's RandAffined ops fire at prob=0.2 per sample
        # (augmentations.py:101-115); gate by scaling the sampled ranges —
        # a non-firing sample warps with the exact identity matrix (the
        # warp still executes, so jit cost is shape-static)
        do_aff = jax.random.bernoulli(
            jax.random.fold_in(keys[0], 101), policy.prob
        ).astype(jnp.float32)
        do_shear = jax.random.bernoulli(
            jax.random.fold_in(keys[0], 102), policy.prob
        ).astype(jnp.float32)
        rot = jnp.asarray(policy.rotate_range, jnp.float32)
        scl = jnp.asarray(policy.scale_range, jnp.float32)
        trn = jnp.asarray(policy.translate_range, jnp.float32)
        mat = S.random_affine_matrix(
            keys[0],
            shape,
            rotate_range=(rot * do_aff) if policy.affine else 0.0,
            scale_range=(scl * do_aff) if policy.affine else 0.0,
            shear_range=(policy.shear_range * do_shear)
            if policy.shear
            else 0.0,
            translate_range=trn * do_aff,
        )
        if fold_flip:
            # flips are axis reflections — fold them into the warp matrix
            # (a negative scale through the same separable passes) instead
            # of paying a separate full-volume select+reverse
            mat = S.compose_flips(
                keys[1], mat, shape, policy.flip_axes,
                prob=policy.flip_prob,
            )
        geom = mat
        if (
            displacement is None
            and ndim == 3
            and jax.devices()[0].platform in ("tpu", "axon")
        ):
            # gather-free shear-decomposed warp: ~28x faster than the
            # XLA-gather path on TPU (spatial.py warp_affine_separable);
            # on CPU the plain gather wins, so it keeps that path
            max_shift = S.separable_max_shift(
                shape,
                policy.rotate_range if policy.affine else 0.0,
                policy.shear_range if policy.shear else 0.0,
            )  # static bound from the UNGATED ranges (gates are traced)
            image = S.warp_affine_separable(image, mat, max_shift=max_shift)
            if label is not None:
                lab = label[..., None] if label.ndim == ndim else label
                lab = S.warp_affine_separable(
                    lab, mat, max_shift=max_shift, method="nearest"
                )
                label = lab[..., 0] if label.ndim == ndim else lab
        else:
            image = S.warp_affine(image, mat, displacement=displacement)
            if label is not None:
                lab = label[..., None] if label.ndim == ndim else label
                lab = S.warp_affine(
                    lab, mat, method="nearest", displacement=displacement
                )
                label = lab[..., 0] if label.ndim == ndim else lab
    if policy.flip and not fold_flip:
        # same key as random_flip -> identical draws; the returned matrix
        # composes AFTER the warp in output space: out[o] = in[mat @ F @ o]
        image_flipped, flip_mat = S.random_flip_with_matrix(
            keys[1], image, policy.flip_axes, ndim, prob=policy.flip_prob
        )
        if label is not None:
            lab = label[..., None] if label.ndim == ndim else label
            lab = S.random_flip(
                keys[1], lab, policy.flip_axes, prob=policy.flip_prob
            )
            label = lab[..., 0] if label.ndim == ndim else lab
        image = image_flipped
        geom = flip_mat if geom is None else geom @ flip_mat
    # gamma/scale/shift/rician run batch-level AFTER the vmapped geometry
    # as ONE fused pallas pass (_batch_intensity below); only the FFT-based
    # gibbs ringing stays per-sample here
    if policy.noise:
        # gate and alpha need INDEPENDENT randomness: reusing keys[5] for
        # both made alpha perfectly correlated with the gate (truncated to
        # the bottom of alpha_range whenever the op fired)
        do_gibbs = jax.random.bernoulli(keys[5], policy.prob)
        k_gibbs = jax.random.fold_in(keys[5], 1)
        # reference: RandGibbsNoised alpha=(0.3, 0.6) in MONAI semantics
        # (0 = identity, 1 = full truncation; augmentations.py:87) —
        # our alpha is the fraction RETAINED, so the matching range is
        # (1-0.6, 1-0.3) = (0.4, 0.7); the old (0.2, 0.8) default
        # truncated far harder at its low end than the reference ever does
        image = jnp.where(
            do_gibbs,
            I.gibbs_ringing(k_gibbs, image, alpha_range=(0.4, 0.7)),
            image,
        )
    if policy.rbf:
        do_rbf = jax.random.bernoulli(
            jax.random.fold_in(keys[6], 1), policy.prob
        )
        image = jnp.where(do_rbf, I.bias_field(keys[6], image), image)
    if policy.blur:
        # reference uses RandGaussianSmoothd defaults: prob=0.1,
        # sigma (0.25, 1.5) per axis (augmentations.py:79)
        do_blur = jax.random.bernoulli(
            jax.random.fold_in(keys[7], 1), policy.blur_prob
        )
        image = jnp.where(
            do_blur,
            I.random_gaussian_smooth(
                keys[7], image, sigma_range=(0.25, 1.5)
            ),
            image,
        )
    if policy.lowres:
        k_lr = jax.random.fold_in(keys[4], 3)
        do_lr = jax.random.bernoulli(keys[4], policy.lowres_prob)
        # reference zoom_range [0.8, 1.2] (augmentations.py:120); zoom > 1
        # maps to sigma 0 = identity in our smoothing approximation
        image = jnp.where(
            do_lr,
            I.low_resolution(k_lr, image, zoom_range=(0.8, 1.2)),
            image,
        )
    if policy.trivial and workhorse is not None:
        # independent stream — keys[7] already drives blur when enabled
        image = workhorse(jax.random.fold_in(keys[7], 11), image)
    image = image.astype(in_dtype)
    if label is not None:
        label = label.astype(label_dtype)
    if return_geometry:
        return image, label, geom
    return image, label


def _batch_intensity(key, image, policy: AugmentPolicy):
    """Fused per-sample gamma+scale/shift+rician over the whole batch
    (ops/pallas/intensity.py — one HBM pass with on-chip PRNG on TPU)."""
    if not (policy.intensity or policy.noise):
        return image
    from adell_mri_tpu.ops.pallas.intensity import fused_intensity_aug_batch

    # dtype-preserving boundary (same rationale as _augment_one): the
    # fused pass may compute/emit f32 internally
    return fused_intensity_aug_batch(
        key,
        image,
        gamma_range=policy.gamma_range if policy.intensity else (1.0, 1.0),
        scale_delta=policy.scale_delta if policy.intensity else 0.0,
        shift_delta=policy.shift_delta if policy.intensity else 0.0,
        sigma=policy.noise_std if policy.noise else 0.0,
        rician=True,
        gamma_prob=policy.prob,
        shift_prob=policy.prob,
        noise_prob=policy.prob,
        std_shift=policy.std_shift,
    ).astype(image.dtype)


@dataclass
class SegmentationTransforms:
    """
    Parity: transform_factory/transforms.py:67. Canonical order preserved:
    host (load -> RAS -> spacing -> scale/ADC -> size) then device
    (augment at 1.1x crop -> pos/neg crop to final size), matching the
    reference's RandCropByPosNegLabeld-at-1.1x -> augment -> center-crop
    strategy (augmentations.py:142-176).
    """

    image_keys: Sequence[str] = ("image",)
    label_keys: Sequence[str] = ("label",)
    target_spacing: Optional[Sequence[float]] = None
    target_size: Optional[Sequence[int]] = None
    resize_size: Optional[Sequence[int]] = None  # SCALE (area/nearest)
    crop_size: Optional[Sequence[int]] = None
    adc_keys: Sequence[str] = ()
    positive_labels: Sequence[int] = (1,)
    label_mode: str = "binary"
    augmentations: AugmentPolicy = field(default_factory=AugmentPolicy)
    pos_ratio: float = 0.5
    max_fg: int = 4096
    missing_to_empty: bool = False
    # aux-image skip conditioning (UNet x_skip_layer; ref skip_keys) and
    # scalar feature conditioning (x_feature_conditioning; ref feature_keys).
    # Skip images compose with intensity augmentation only — geometric
    # augmentation does not warp them (the entrypoint rejects that combo).
    skip_keys: Sequence[str] = ()
    feature_keys: Sequence[str] = ()
    # 2D-network training on 3D volumes (parity: the reference's
    # spatial_dimensions==2 branch, entrypoints/segmentation/train.py:390:
    # RandomSlices(n=8, mask-weighted) + collate_last_slice): sample this
    # many slices per volume after augmentation and fold them into the
    # batch axis. Mutually exclusive with crop_size/skip/feature keys.
    slices_2d: Optional[int] = None

    def load_fn(self):
        base = make_load_fn(
            image_keys=self.image_keys,
            label_keys=self.label_keys,
            target_spacing=self.target_spacing,
            target_size=self.target_size,
            resize_size=self.resize_size,
            adc_keys=self.adc_keys,
            positive_labels=self.positive_labels,
            label_mode=self.label_mode,
            missing_to_empty=self.missing_to_empty,
            max_fg=self.max_fg,
        )
        skip_load = (
            make_load_fn(
                image_keys=self.skip_keys,
                label_keys=None,
                target_spacing=self.target_spacing,
                target_size=self.target_size,
            )
            if self.skip_keys
            else None
        )
        if skip_load is None and not self.feature_keys:
            return base

        import numpy as np

        def load(entry):
            sample = base(entry)
            if skip_load is not None:
                sample["skip_layer"] = skip_load(entry)["image"]
            if self.feature_keys:
                sample["features"] = np.asarray(
                    [float(entry[k]) for k in self.feature_keys], np.float32
                )
            return sample

        return load

    def augment(self, key, batch: Dict) -> Dict:
        """Batched device augmentation; jit this (or call inside the step)."""
        b = batch["image"].shape[0]
        keys = jax.random.split(key, b)
        wh = (
            AugmentationWorkhorse(ndim=batch["image"].ndim - 2)
            if self.augmentations.trivial
            else None
        )

        def one(key, image, label, fg, n_fg):
            image, label, geom = _augment_one(
                key, image, label, self.augmentations, wh,
                return_geometry=True,
            )
            if self.crop_size is not None:
                nd = image.ndim - 1
                if geom is not None:
                    # fg_indices were computed on the PRE-warp label; an
                    # input fg voxel p now sits at inv(geom) @ p in the
                    # warped output, so map the centers through the inverse
                    # (clip keeps warped-out points at the border — the
                    # crop start clip bounds them anyway)
                    inv = jnp.linalg.inv(geom)
                    pts = (
                        fg.astype(jnp.float32) @ inv[:nd, :nd].T
                        + inv[:nd, nd]
                    )
                    fg = jnp.clip(
                        jnp.round(pts).astype(jnp.int32),
                        0,
                        jnp.asarray(image.shape[:-1], jnp.int32) - 1,
                    )
                k = jax.random.fold_in(key, 17)
                image, label, _ = S.pos_neg_crop(
                    k, image, label, tuple(self.crop_size), fg, n_fg,
                    self.pos_ratio,
                )
                label = label[..., 0] if label.ndim == image.ndim else label
            return image, label

        fg = batch.get(
            "fg_indices",
            jnp.zeros((b, self.max_fg, batch["image"].ndim - 2), jnp.int32),
        )
        n_fg = batch.get("n_fg", jnp.zeros((b,), jnp.int32))
        image, label = jax.vmap(one)(
            keys, batch["image"], batch["label"], fg, n_fg
        )
        image = _batch_intensity(
            jax.random.fold_in(key, 91), image, self.augmentations
        )
        if self.slices_2d:
            if self.crop_size is not None or self.skip_keys:
                raise ValueError(
                    "slices_2d (2D-network training) composes with neither "
                    "random crops nor skip conditioning"
                )
            n = int(self.slices_2d)
            ks = jax.random.split(jax.random.fold_in(key, 53), b)
            sq = label.ndim < image.ndim  # random_slices pads a label chan

            def slc(k, img, lab):
                return S.random_slices(k, img, lab, n, axis=-2, base=0.05)

            image, label = jax.vmap(slc)(ks, image, label)
            if sq:
                label = label[..., 0]
            # fold the slice axis into the batch (collate_last_slice
            # analogue, utils/utils.py:246): [B, X, Y, n, C] -> [B*n, X, Y, C]
            image = jnp.moveaxis(image, -2, 1).reshape(
                (b * n,) + image.shape[1:-2] + (image.shape[-1],)
            )
            label = jnp.moveaxis(label, -1, 1).reshape(
                (b * n,) + label.shape[1:-1]
            )
        out = dict(batch)
        out["image"] = image
        out["label"] = label
        out.pop("fg_indices", None)
        out.pop("n_fg", None)
        return out


@dataclass
class ClassificationTransforms:
    """
    Parity: transform_factory/transforms.py:362. ``image_masking`` applies
    the convex hull of ``mask_key`` multiplicatively to the images;
    ``image_crop_from_mask`` crops them to the mask's bounding box with a
    16-voxel margin before the final size (reference :466-481).
    """

    image_keys: Sequence[str] = ("image",)
    label_key: str = "label"
    target_spacing: Optional[Sequence[float]] = None
    target_size: Optional[Sequence[int]] = None
    resize_size: Optional[Sequence[int]] = None  # SCALE (area/nearest)
    crop_size: Optional[Sequence[int]] = None
    adc_keys: Sequence[str] = ()
    augmentations: AugmentPolicy = field(default_factory=AugmentPolicy)
    clinical_feature_keys: Sequence[str] = ()
    mask_key: Optional[str] = None
    image_masking: bool = False
    image_crop_from_mask: bool = False
    # label values in this set map to 1, everything else to 0 (ref
    # positive_labels binarization)
    positive_labels: Optional[Sequence] = None
    # scalar label mapping (parity: LabelOperatord, labels.py:32):
    # label_groups maps each group's members to its index; otherwise
    # possible_labels maps values (numeric or string) to 0..n-1.
    # Precedence mirrors the reference (classification/train.py:162-174):
    # label_groups > positive_labels > possible_labels > raw float.
    possible_labels: Optional[Sequence] = None
    label_groups: Optional[Sequence[Sequence]] = None

    def load_fn(self):
        base = make_load_fn(
            image_keys=self.image_keys,
            label_keys=[self.mask_key] if self.mask_key else None,
            target_spacing=self.target_spacing,
            target_size=self.target_size,
            resize_size=self.resize_size,
            adc_keys=self.adc_keys,
            extra_scalar_keys=list(self.clinical_feature_keys),
        )
        label_key = self.label_key

        def load(entry):
            import numpy as np

            sample = base(entry)
            if self.mask_key and (self.image_masking or self.image_crop_from_mask):
                from adell_mri_tpu.transforms.labels import (
                    convex_hull,
                    crop_from_mask,
                )

                mask = sample.pop("label")  # the mask rode the label slot
                sample.pop("fg_indices", None)
                sample.pop("n_fg", None)
                if self.image_masking:
                    hull = convex_hull(mask)
                    sample["image"] = sample["image"] * hull[..., None]
                if self.image_crop_from_mask:
                    # crop with 16px margin then restore the static size
                    sample["image"] = crop_from_mask(
                        sample["image"],
                        mask,
                        output_size=self.target_size,
                        margin=16,
                    )
            # label_key=None: inference-time pipeline (predict entrypoints)
            if label_key is not None and label_key in entry:
                if self.label_groups is not None:
                    from adell_mri_tpu.transforms.labels import (
                        label_operator,
                    )

                    sample["label"] = np.float32(
                        label_operator(
                            entry[label_key],
                            self.possible_labels or (),
                            label_groups=self.label_groups,
                        )
                    )
                elif self.positive_labels is not None:
                    sample["label"] = np.float32(
                        str(entry[label_key])
                        in {str(v) for v in self.positive_labels}
                    )
                elif self.possible_labels is not None:
                    from adell_mri_tpu.transforms.labels import (
                        label_operator,
                    )

                    sample["label"] = np.float32(
                        label_operator(
                            entry[label_key], self.possible_labels
                        )
                    )
                else:
                    sample["label"] = np.float32(float(entry[label_key]))
            if self.clinical_feature_keys:
                sample["features"] = np.asarray(
                    [float(entry[k]) for k in self.clinical_feature_keys],
                    np.float32,
                )
            return sample

        return load

    def augment(self, key, batch: Dict) -> Dict:
        b = batch["image"].shape[0]
        keys = jax.random.split(key, b)
        wh = (
            AugmentationWorkhorse(ndim=batch["image"].ndim - 2)
            if self.augmentations.trivial
            else None
        )

        def one(key, image):
            image, _ = _augment_one(key, image, None, self.augmentations, wh)
            if self.crop_size is not None:
                image = S.random_crop(
                    jax.random.fold_in(key, 17), image, tuple(self.crop_size)
                )
            return image

        out = dict(batch)
        image = jax.vmap(one)(keys, batch["image"])
        out["image"] = _batch_intensity(
            jax.random.fold_in(key, 91), image, self.augmentations
        )
        return out


@dataclass
class SSLTransforms:
    """
    Two augmented views per sample (parity: transforms.py:641-754 — view
    copies via CopyEntryd + AugmentationWorkhorsed x2).
    """

    image_keys: Sequence[str] = ("image",)
    target_spacing: Optional[Sequence[float]] = None
    target_size: Optional[Sequence[int]] = None
    crop_size: Optional[Sequence[int]] = None
    adc_keys: Sequence[str] = ()
    # keep N random channels of each 4D key at load time (parity:
    # SampleChannelDimd in the SSL pre-transforms, transforms.py:678)
    sample_channels: Optional[int] = None
    # 2D SSL on 3D volumes (parity: SSLTransforms n_dim==2 —
    # SampleChannelDimd(keys, 1, 3) + SqueezeDimd in the CACHED
    # pre-transforms, transforms.py:680-688): take one random slice per
    # volume at load/cache time; target_size/crop_size are then 2D
    slice_2d: bool = False
    n_transforms: int = 3
    scaled_crop_range: Tuple[float, float] = (0.6, 1.0)
    # DINO multi-crop: n_local_crops extra small student views
    # (parity: get_augmentations_ssl crop strategies,
    # transform_factory/augmentations.py:401-526)
    n_local_crops: int = 0
    local_crop_size: Optional[Sequence[int]] = None
    local_crop_range: Tuple[float, float] = (0.3, 0.6)
    # VICRegL: emit each view's crop warp matrix ("view{i}_mat") so local
    # features can be matched by absolute position (ExposeTransformKeyMetad
    # analogue, utils/monai_transforms/generic_data_ops.py:75); restricts
    # the TrivialAugment registry to non-spatial ops so the matrix stays
    # the only geometry
    expose_boxes: bool = False

    def load_fn(self):
        if not self.slice_2d:
            return make_load_fn(
                image_keys=self.image_keys,
                label_keys=None,
                target_spacing=self.target_spacing,
                target_size=self.target_size,
                adc_keys=self.adc_keys,
                sample_channels=self.sample_channels,
            )
        import numpy as np

        from adell_mri_tpu.transforms.host import center_crop_pad

        base = make_load_fn(
            image_keys=self.image_keys,
            label_keys=None,
            target_spacing=self.target_spacing,
            target_size=None,
            adc_keys=self.adc_keys,
            sample_channels=self.sample_channels,
        )
        # cache-frozen random draw, like the reference's cached
        # SampleChannelDimd pre-transform
        rng = np.random.default_rng(4242)
        target2d = tuple(self.target_size) if self.target_size else None

        def load(entry):
            s = base(entry)
            img = s["image"]  # [X, Y, Z, C]
            if img.ndim == 4:
                z = int(rng.integers(img.shape[2]))
                img = img[:, :, z, :]
            if target2d is not None:
                img = center_crop_pad(img, target2d)
            s["image"] = np.ascontiguousarray(img)
            return s

        return load

    def augment(self, key, batch: Dict) -> Dict:
        b = batch["image"].shape[0]
        ndim = batch["image"].ndim - 2
        names = None
        if self.expose_boxes:
            from adell_mri_tpu.transforms.augment import (
                generic_augments,
                mri_specific_augments,
            )

            names = list(generic_augments) + list(mri_specific_augments)
        wh = AugmentationWorkhorse(
            augmentations=names, n_transforms=self.n_transforms, ndim=ndim
        )

        def crop_matrix(key, shape, crop_size, zoom_range):
            """Random scaled crop at a random POSITION: zoom folded into
            the warp, translation sampled so the crop stays in bounds.
            Returns the output-voxel -> input-volume matrix."""
            kz, kt = jax.random.split(key)
            zoom = jax.random.uniform(
                kz, (), minval=zoom_range[0], maxval=zoom_range[1]
            )
            scales = jnp.full((ndim,), zoom)
            mat = (
                S.center_matrix(shape, +1.0)
                @ S.scale_shear_matrix(ndim, scales)
                @ S.center_matrix(crop_size, -1.0)
            )
            half_slack = (
                jnp.asarray(shape, jnp.float32)
                - zoom * jnp.asarray(crop_size, jnp.float32)
            ) / 2.0
            t = (
                jax.random.uniform(kt, (ndim,), minval=-1.0, maxval=1.0)
                * jnp.maximum(half_slack, 0.0)
            )
            return mat.at[:ndim, ndim].add(t)

        def one_view(key, image, crop_size, zoom_range):
            k1, k2 = jax.random.split(key)
            image = wh(k1, image)
            mat = jnp.eye(ndim + 1)
            if crop_size is not None:
                mat = crop_matrix(k2, image.shape[:-1], crop_size, zoom_range)
                image = S.warp_affine(image, mat, out_shape=tuple(crop_size))
            return image, mat

        def global_view(key, image):
            return one_view(key, image, self.crop_size, self.scaled_crop_range)

        k1, k2, k3 = jax.random.split(key, 3)
        out = dict(batch)
        v1, m1 = jax.vmap(global_view)(
            jax.random.split(k1, b), batch["image"]
        )
        v2, m2 = jax.vmap(global_view)(
            jax.random.split(k2, b), batch["image"]
        )
        out["view1"], out["view2"] = v1, v2
        if self.expose_boxes:
            out["view1_mat"], out["view2_mat"] = m1, m2
        if self.n_local_crops > 0:
            lsize = tuple(
                self.local_crop_size
                or [max(1, s // 2) for s in (self.crop_size or v1.shape[1:-1])]
            )

            def local_view(key, image):
                return one_view(key, image, lsize, self.local_crop_range)[0]

            crops = []
            for i in range(self.n_local_crops):
                crops.append(
                    jax.vmap(local_view)(
                        jax.random.split(jax.random.fold_in(k3, i), b),
                        batch["image"],
                    )
                )
            out["local_crops"] = jnp.stack(crops, axis=1)
        return out


@dataclass
class GenerationTransforms:
    """Parity: transform_factory/transforms.py:555 (diffusion/GAN input).

    ``slice_2d`` mirrors the n_dim==2 branch (:570-578): one cache-frozen
    random slice per 3D volume, taken at load time; target_size is 2D."""

    image_keys: Sequence[str] = ("image",)
    target_spacing: Optional[Sequence[float]] = None
    target_size: Optional[Sequence[int]] = None
    slice_2d: bool = False

    def load_fn(self):
        if not self.slice_2d:
            return make_load_fn(
                image_keys=self.image_keys,
                label_keys=None,
                target_spacing=self.target_spacing,
                target_size=self.target_size,
            )
        import numpy as np

        from adell_mri_tpu.transforms.host import center_crop_pad

        base = make_load_fn(
            image_keys=self.image_keys,
            label_keys=None,
            target_spacing=self.target_spacing,
            target_size=None,
        )
        rng = np.random.default_rng(4242)
        target2d = tuple(self.target_size) if self.target_size else None

        def load(entry):
            s = base(entry)
            img = s["image"]
            if img.ndim == 4:
                img = img[:, :, int(rng.integers(img.shape[2])), :]
            if target2d is not None:
                img = center_crop_pad(img, target2d)
            s["image"] = np.ascontiguousarray(img)
            return s

        return load

    def augment(self, key, batch: Dict) -> Dict:
        return batch


@dataclass
class DetectionTransforms:
    """
    Parity: transform_factory/transforms.py:263 (DetectionTransforms) +
    RandAffineWithBoxesd/RandRotateWithBoxesd
    (utils/monai_transforms/bounding_boxes.py:449,537) — augmentation that
    keeps images and box targets consistent. TPU-native: boxes are already
    rasterized onto the anchor grid at load time, so the device augment
    flips image and target grids TOGETHER (mirroring the in-cell center
    offsets) and applies the fused intensity pass to the image only.
    """

    augmentations: AugmentPolicy = field(default_factory=AugmentPolicy)
    # box re-rasterization spec: when set AND the batch carries padded
    # corner boxes ("boxes" [B,M,2*ndim], "box_classes" [B,M],
    # "n_boxes" [B]), geometric augmentation warps image and boxes
    # TOGETHER (affine incl. folded flips) and re-rasterizes the anchor
    # targets on device (parity: RandAffineWithBoxesd/RandRotateWithBoxesd,
    # utils/monai_transforms/bounding_boxes.py:449,537)
    anchors: Optional[object] = None
    grid_shape: Optional[Sequence[int]] = None
    input_shape: Optional[Sequence[int]] = None
    n_classes: int = 2

    def _augment_with_boxes(self, key, batch: Dict) -> Dict:
        from adell_mri_tpu.models.detection.anchors import (
            boxes_to_anchor_targets_jax,
            transform_boxes_affine,
        )

        policy = self.augmentations
        image = batch["image"]
        ndim = image.ndim - 2
        shape = image.shape[1:-1]
        anchors = jnp.asarray(self.anchors, jnp.float32)

        def one(key, image, boxes, classes, n_boxes):
            k_mat, k_flip = jax.random.split(key)
            mat = S.random_affine_matrix(
                k_mat,
                shape,
                rotate_range=policy.rotate_range if policy.affine else 0.0,
                scale_range=policy.scale_range if policy.affine else 0.0,
                shear_range=policy.shear_range if policy.shear else 0.0,
                translate_range=policy.translate_range,
            )
            if policy.flip:
                mat = S.compose_flips(k_flip, mat, shape, policy.flip_axes)
            if ndim == 3 and jax.devices()[0].platform in ("tpu", "axon"):
                max_shift = S.separable_max_shift(
                    shape,
                    policy.rotate_range if policy.affine else 0.0,
                    policy.shear_range if policy.shear else 0.0,
                )
                image = S.warp_affine_separable(
                    image, mat, max_shift=max_shift
                )
            else:
                image = S.warp_affine(image, mat)
            valid = jnp.arange(boxes.shape[0]) < n_boxes
            boxes, valid = transform_boxes_affine(boxes, mat, valid, shape)
            obj, ctr, sz, cls = boxes_to_anchor_targets_jax(
                boxes,
                classes,
                valid,
                tuple(self.grid_shape),
                anchors,
                tuple(self.input_shape or shape),
                n_classes=self.n_classes,
            )
            return image, obj, ctr, sz, cls

        b = image.shape[0]
        in_dtype = image.dtype
        keys = jax.random.split(key, b)
        image, obj, ctr, sz, cls = jax.vmap(one)(
            keys,
            image,
            batch["boxes"],
            batch["box_classes"],
            batch["n_boxes"],
        )
        # dtype-preserving boundary (same rationale as _augment_one): the
        # warp upcasts to f32; cast back BEFORE _batch_intensity so its
        # .astype(image.dtype) restores the caller's dtype, not f32
        image = image.astype(in_dtype)
        out = dict(batch)
        out.update(
            image=_batch_intensity(jax.random.fold_in(key, 91), image, policy),
            objectness=obj,
            center_offsets=ctr,
            sizes=sz,
            classes=cls,
        )
        return out

    def augment(self, key, batch: Dict) -> Dict:
        policy = self.augmentations
        if (
            (policy.affine or policy.shear)
            and self.anchors is not None
            and self.grid_shape is not None
            and "boxes" in batch
        ):
            return self._augment_with_boxes(key, batch)
        out = dict(batch)
        image = batch["image"]
        ndim = image.ndim - 2
        k_flip, k_int = jax.random.split(key)
        if policy.flip:
            # all targets are [B, *G, channels]: objectness channels = A,
            # center/size channels = A*ndim (anchor-major: a*ndim + d),
            # classes channels = C. Only policy.flip_axes flip — the box
            # path and _augment_one honor the same restriction (anatomy is
            # not flip-symmetric along every axis).
            obj = batch["objectness"]
            ctr = batch["center_offsets"]
            sz = batch["sizes"]
            cls = batch["classes"]
            dim_idx = jnp.arange(ctr.shape[-1]) % ndim  # per-channel axis id
            for d in policy.flip_axes:
                flip = jax.random.bernoulli(
                    jax.random.fold_in(k_flip, d),
                    policy.flip_prob,
                    (image.shape[0],),
                )
                f_img = flip.reshape((-1,) + (1,) * (image.ndim - 1))
                image = jnp.where(f_img, jnp.flip(image, axis=d + 1), image)

                def gflip(t):
                    ft = flip.reshape((-1,) + (1,) * (t.ndim - 1))
                    return jnp.where(ft, jnp.flip(t, axis=d + 1), t)

                obj_f = gflip(obj)
                ctr_f = gflip(ctr)
                # mirror the in-cell offset of the flipped axis where the
                # matching anchor holds a box
                obj_per_ctr = jnp.repeat(obj_f, ndim, axis=-1)
                mirrored = jnp.where(
                    (dim_idx == d) & (obj_per_ctr > 0),
                    1.0 - ctr_f,
                    ctr_f,
                )
                fcm = flip.reshape((-1,) + (1,) * (ctr.ndim - 1))
                ctr = jnp.where(fcm, mirrored, ctr)
                obj = obj_f
                sz = gflip(sz)
                cls = gflip(cls)
            out.update(
                objectness=obj, center_offsets=ctr, sizes=sz, classes=cls
            )
        image = _batch_intensity(k_int, image, policy)
        out["image"] = image
        return out
