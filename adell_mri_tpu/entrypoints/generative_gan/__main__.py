"""GAN mode dispatch (parity: entrypoints/generative_gan)."""

from adell_mri_tpu.entrypoints.cli_utils import run_main

supported_modes = {
    "train_2d": "adell_mri_tpu.entrypoints.generative_gan.train",
    "train": "adell_mri_tpu.entrypoints.generative_gan.train",
}


def main(arguments):
    run_main(
        "adell_mri_tpu.entrypoints.generative_gan", supported_modes, arguments
    )
