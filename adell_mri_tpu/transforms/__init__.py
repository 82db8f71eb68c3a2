from adell_mri_tpu.transforms.pipeline import (
    AugmentPolicy,
    ClassificationTransforms,
    GenerationTransforms,
    SegmentationTransforms,
    SSLTransforms,
)
from adell_mri_tpu.transforms.augment import (
    AugmentationWorkhorse,
    generic_augments,
    mri_specific_augments,
    spatial_augments,
)


def augment_pipeline_for_bench(shape):
    """Batched standard-unet augment policy (the REAL training path:
    vmapped geometry + the fused batch intensity pass), used by bench.py."""
    import jax

    from adell_mri_tpu.transforms.pipeline import (
        _augment_one,
        _batch_intensity,
    )

    policy = AugmentPolicy(
        intensity=True, noise=True, affine=True, flip=True
    )

    def batched(key, x):
        keys = jax.random.split(key, x.shape[0])
        out = jax.vmap(
            lambda k, img: _augment_one(k, img, None, policy)[0]
        )(keys, x)
        return _batch_intensity(jax.random.fold_in(key, 91), out, policy)

    return batched


__all__ = [
    "AugmentPolicy",
    "SegmentationTransforms",
    "ClassificationTransforms",
    "SSLTransforms",
    "GenerationTransforms",
    "AugmentationWorkhorse",
    "generic_augments",
    "mri_specific_augments",
    "spatial_augments",
    "augment_pipeline_for_bench",
]
