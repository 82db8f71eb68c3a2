"""Segmentation mode dispatch (parity: entrypoints/segmentation/__main__)."""

from adell_mri_tpu.entrypoints.cli_utils import run_main

supported_modes = {
    "train": "adell_mri_tpu.entrypoints.segmentation.train",
    "test": "adell_mri_tpu.entrypoints.segmentation.test",
    "predict": "adell_mri_tpu.entrypoints.segmentation.predict",
    "test_from_predictions": (
        "adell_mri_tpu.entrypoints.segmentation.test_from_predictions"
    ),
}


def main(arguments):
    run_main("adell_mri_tpu.entrypoints.segmentation", supported_modes, arguments)
