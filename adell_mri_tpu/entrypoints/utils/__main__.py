"""
Utils mode dispatch (parity: adell_mri/entrypoints/utils/__main__.py:5-35 —
same subcommand names).
"""

P = "adell_mri_tpu.entrypoints.utils.tools"
supported_modes = {
    # preprocessing
    "bias_field_correction": P,
    "merge_masks": P,
    "resample_image": P,
    "resample_volumes_and_masks": P,
    # statistics
    "compare_masks": P,
    "get_label_size": P,
    "match_to_mask": P,
    # dataset
    "fill_with_condition": P,
    "flatten_dataset_json": P,
    "get_segmentation_label_composition": P,
    "generate_dataset_json": P,
    "generate_image_dataset_json": P,
    "generate_json_from_csv": P,
    "get_mask_coordinates": P,
    "get_test_set_and_folds": P,
    "merge_json_datasets": P,
    "remove_constant_masks": P,
    "describe_image": P,
    "describe_sitk": P,  # reference name (utils/dataset/describe_sitk.py)
    "bb_to_anchors": P,
    "bb_to_distances": P,
    "generate_dicom_dataset_json": P,
    "inspect_dicom_dataset": P,
    "describe_dicom_dataset": P,
    "get_image_examples": P,
    "get_temporal_test_set_and_folds": P,
    # other
    "random_image_panel": P,
    "test_exported_model": P,
    # reference name (entrypoints/utils/__main__.py:35) — same tool; the
    # reference "traces" torch models, we test exported orbax/jit bundles
    "test_traced_model": P,
    "import_torch_checkpoint": P,
}


def main(arguments):
    if len(arguments) == 0 or arguments[0] in ("help", "--help", "-h"):
        print(f"\n\tSupported modes: {sorted(supported_modes)}")
        return
    mode = arguments[0]
    if mode not in supported_modes:
        raise NotImplementedError(
            f"\n\tMode {mode} not supported\n\t"
            f"Supported modes: {sorted(supported_modes)}"
        )
    from adell_mri_tpu.entrypoints.utils import tools

    getattr(tools, mode)(arguments[1:])
