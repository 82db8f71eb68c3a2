"""Ensemble dispatch (parity: entrypoints/classification_ensemble)."""

from adell_mri_tpu.entrypoints.cli_utils import run_main

supported_modes = {
    "train": "adell_mri_tpu.entrypoints.classification_ensemble.train",
    "predict": "adell_mri_tpu.entrypoints.classification_ensemble.predict",
    "test": "adell_mri_tpu.entrypoints.classification_ensemble.test",
}


def main(arguments):
    run_main(
        "adell_mri_tpu.entrypoints.classification_ensemble",
        supported_modes,
        arguments,
    )
