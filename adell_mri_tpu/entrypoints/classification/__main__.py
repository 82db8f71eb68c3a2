"""Classification mode dispatch (parity: entrypoints/classification)."""

from adell_mri_tpu.entrypoints.cli_utils import run_main

supported_modes = {
    "train": "adell_mri_tpu.entrypoints.classification.train",
    "test": "adell_mri_tpu.entrypoints.classification.test",
    "predict": "adell_mri_tpu.entrypoints.classification.predict",
    "model_to_export": (
        "adell_mri_tpu.entrypoints.classification.model_to_export"
    ),
    # reference spelling (entrypoints/classification/model_to_torchscript.py)
    # maps to the same exporter — here it emits StableHLO, not torchscript
    "model_to_torchscript": (
        "adell_mri_tpu.entrypoints.classification.model_to_export"
    ),
}


def main(arguments):
    run_main(
        "adell_mri_tpu.entrypoints.classification", supported_modes, arguments
    )
