"""SSL mode dispatch (parity: entrypoints/ssl/__main__)."""

from adell_mri_tpu.entrypoints.cli_utils import run_main

supported_modes = {
    "train_3d": "adell_mri_tpu.entrypoints.ssl.train",
    "train_2d": "adell_mri_tpu.entrypoints.ssl.train_2d",
    "train": "adell_mri_tpu.entrypoints.ssl.train",
    "predict_folder": "adell_mri_tpu.entrypoints.ssl.predict_folder",
    "model_to_export": "adell_mri_tpu.entrypoints.ssl.model_to_export",
    # reference spelling (entrypoints/ssl/model_to_torchscript.py); the
    # exporter emits StableHLO rather than torchscript
    "model_to_torchscript": "adell_mri_tpu.entrypoints.ssl.model_to_export",
}


def main(arguments):
    run_main("adell_mri_tpu.entrypoints.ssl", supported_modes, arguments)
