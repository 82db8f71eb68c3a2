"""MIL classification dispatch (parity: entrypoints/classification_mil)."""

from adell_mri_tpu.entrypoints.cli_utils import run_main

supported_modes = {
    "train": "adell_mri_tpu.entrypoints.classification_mil.train",
    "test": "adell_mri_tpu.entrypoints.classification_mil.test",
    "predict": "adell_mri_tpu.entrypoints.classification_mil.predict",
}


def main(arguments):
    run_main(
        "adell_mri_tpu.entrypoints.classification_mil", supported_modes, arguments
    )
