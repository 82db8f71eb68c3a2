"""
Shared type aliases used across the framework.

Parity: mirrors the role of ``adell_mri/custom_types.py`` in the reference,
re-expressed for JAX (arrays are ``jax.Array``/``np.ndarray`` pytrees rather
than torch tensors).
"""

from typing import Any, Callable, Dict, List, Union

import jax
import numpy as np

DatasetDict = Dict[str, Dict[str, Any]]
DataList = List[Dict[str, Any]]
Array = Union[jax.Array, np.ndarray]
Sample = Dict[str, Array]
PyTree = Any
TransformFn = Callable[[jax.Array, Sample], Sample]  # (rng_key, sample) -> sample
SizeDict = Dict[str, List[int]]
