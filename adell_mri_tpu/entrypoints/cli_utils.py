"""
Entrypoint dispatch helpers (parity: adell_mri/entrypoints/cli_utils.py:4).
"""

import importlib
from typing import Dict, List


def run_main(package: str, supported_modes: Dict[str, str], arguments: List[str]):
    """Dispatches ``arguments[0]`` to ``{package}.{module}.main(rest)``."""
    if len(arguments) == 0 or arguments[0] in ("help", "--help", "-h"):
        print(f"\n\tSupported modes: {sorted(supported_modes)}")
        return
    mode = arguments[0]
    if mode not in supported_modes:
        raise NotImplementedError(
            f"\n\tMode {mode} not supported\n\t"
            f"Supported modes: {sorted(supported_modes)}"
        )
    module = importlib.import_module(supported_modes[mode], package)
    module.main(arguments[1:])
