"""
CLI dispatch.

Parity target: adell_mri/__main__.py:3-91 — same 11 mode groups, same
string dispatch to ``entrypoints.<mode>.__main__.main(argv)``.
"""

import importlib
import sys

supported_modes = [
    "classification",
    "classification_deconfounder",
    "classification_mil",
    "classification_ensemble",
    "generative",
    "generative_gan",
    "segmentation",
    "segmentation_from_2d_module",
    "ssl",
    "detection",
    "utils",
]


def main(arguments=None):
    arguments = sys.argv[1:] if arguments is None else arguments
    if len(arguments) == 0 or arguments[0] == "help":
        print(f"\n\tSupported modes: {supported_modes}")
        return
    mode = arguments[0]
    if mode not in supported_modes:
        raise NotImplementedError(
            f"\n\tMode {mode} not supported\n\tSupported modes: {supported_modes}"
        )
    module = importlib.import_module(
        f"adell_mri_tpu.entrypoints.{mode}.__main__"
    )
    module.main(arguments[1:])


if __name__ == "__main__":
    main()
