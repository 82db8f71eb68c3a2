from adell_mri_tpu.data.collate import (
    collate_last_slice,
    safe_collate,
    safe_collate_crops,
)
from adell_mri_tpu.data.dataset import Dataset, parse_ids, subsample_dataset
from adell_mri_tpu.data.filters import (
    fill_conditional,
    fill_missing_with_value,
    filter_dictionary,
)
from adell_mri_tpu.data.loader import CachedVolumeDataset, DataLoader
from adell_mri_tpu.data.nifti import (
    NiftiImage,
    read_nifti,
    reorient_to_ras,
    write_nifti,
)
from adell_mri_tpu.data.samplers import (
    PartiallyRandomSampler,
    RandomSampler,
    WeightedSampler,
    class_weights_from_labels,
)

__all__ = [
    "Dataset",
    "parse_ids",
    "subsample_dataset",
    "filter_dictionary",
    "fill_conditional",
    "fill_missing_with_value",
    "safe_collate",
    "safe_collate_crops",
    "collate_last_slice",
    "CachedVolumeDataset",
    "DataLoader",
    "NiftiImage",
    "read_nifti",
    "write_nifti",
    "reorient_to_ras",
    "PartiallyRandomSampler",
    "WeightedSampler",
    "RandomSampler",
    "class_weights_from_labels",
]
