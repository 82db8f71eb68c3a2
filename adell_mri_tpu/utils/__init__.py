from adell_mri_tpu.utils.logging_utils import get_logger

__all__ = ["get_logger"]
