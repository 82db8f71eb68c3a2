"""Detection mode dispatch (parity: entrypoints/detection)."""

from adell_mri_tpu.entrypoints.cli_utils import run_main

supported_modes = {
    "train": "adell_mri_tpu.entrypoints.detection.train",
    "predict": "adell_mri_tpu.entrypoints.detection.predict",
}


def main(arguments):
    run_main("adell_mri_tpu.entrypoints.detection", supported_modes, arguments)
