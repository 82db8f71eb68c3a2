"""Generative (diffusion) mode dispatch (parity: entrypoints/generative)."""

from adell_mri_tpu.entrypoints.cli_utils import run_main

supported_modes = {
    "train": "adell_mri_tpu.entrypoints.generative.train",
    "generate": "adell_mri_tpu.entrypoints.generative.generate",
}


def main(arguments):
    run_main("adell_mri_tpu.entrypoints.generative", supported_modes, arguments)
