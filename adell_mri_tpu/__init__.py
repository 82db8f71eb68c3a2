"""
ADeLL-MRI-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for deep learning
with volumetric MRI.

Re-imagines the capabilities of CCIG-Champalimaud/adell-mri (PyTorch/Lightning/
MONAI, see /root/reference) as a TPU-first system:

- dataset-JSON ingestion and filtering (``adell_mri_tpu.data``)
- on-device, jit-compiled augmentation pipelines replacing CPU transform
  workers (``adell_mri_tpu.transforms``)
- a flax layer/model zoo with the same config surface
  (``adell_mri_tpu.models``)
- pjit/mesh-based parallelism replacing DDP (``adell_mri_tpu.parallel``)
- functional train loops replacing Lightning adapters
  (``adell_mri_tpu.train``)
- sliding-window inference tiled on device (``adell_mri_tpu.inference``)
- lesion-level (PI-CAI style) evaluation (``adell_mri_tpu.eval``)
- the ``adell`` CLI surface (``adell_mri_tpu.entrypoints``)
"""

__version__ = "0.1.0"
