"""2D-module segmentation dispatch (parity: entrypoints/segmentation_from_2d_module)."""

from adell_mri_tpu.entrypoints.cli_utils import run_main

supported_modes = {
    "train": "adell_mri_tpu.entrypoints.segmentation_from_2d_module.train",
}


def main(arguments):
    run_main(
        "adell_mri_tpu.entrypoints.segmentation_from_2d_module",
        supported_modes,
        arguments,
    )
