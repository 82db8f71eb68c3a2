"""
Python logging setup (parity with adell_mri/utils/python_logging.py:7).
"""

import logging
import os
import sys

_FMT = "%(asctime)s [%(levelname)s] %(name)s: %(message)s"


def get_logger(name: str) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FMT))
        logger.addHandler(handler)
        logger.setLevel(os.environ.get("ADELL_LOG_LEVEL", "INFO"))
        logger.propagate = False
    return logger
