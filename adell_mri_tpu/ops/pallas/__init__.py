"""
Pallas TPU kernels for the hot paths.

- ``intensity``: fused per-volume intensity augmentation (noise + gamma +
  scale/offset + salt&pepper) in ONE pass over HBM with the on-chip PRNG,
  replacing a chain of jax.random (threefry) ops.
- ``attention``: blockwise (flash) attention forward for the ViT/SWIN
  stacks, plus a ring variant for sequence parallelism over the mesh.

Each op has a pure-XLA reference implementation used as the CPU fallback
and as the numerical oracle in tests.
"""

from adell_mri_tpu.ops.pallas.intensity import (
    fused_intensity_aug,
    fused_intensity_aug_reference,
)
from adell_mri_tpu.ops.pallas.attention import (
    flash_attention,
    attention_reference,
    ring_attention,
)

__all__ = [
    "fused_intensity_aug",
    "fused_intensity_aug_reference",
    "flash_attention",
    "attention_reference",
    "ring_attention",
]
