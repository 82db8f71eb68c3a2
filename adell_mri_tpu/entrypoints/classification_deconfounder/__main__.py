"""Deconfounder dispatch (parity: entrypoints/classification_deconfounder)."""

from adell_mri_tpu.entrypoints.cli_utils import run_main

supported_modes = {
    "train": "adell_mri_tpu.entrypoints.classification_deconfounder.train",
    "test": "adell_mri_tpu.entrypoints.classification_deconfounder.test",
    "predict": "adell_mri_tpu.entrypoints.classification_deconfounder.predict",
}


def main(arguments):
    run_main(
        "adell_mri_tpu.entrypoints.classification_deconfounder",
        supported_modes,
        arguments,
    )
