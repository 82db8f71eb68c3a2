"""
Model export/import — the torchscript analogue.

Parity targets: adell_mri/entrypoints/classification/model_to_torchscript.py
and adell_mri/entrypoints/ssl/model_to_torchscript.py (trace a trained
network to a standalone artifact consumable without the framework), and
utils/test_traced_model.py (load + run the artifact).

TPU-native: ``jax.export`` serializes the jitted forward (with the trained
parameters baked in as constants) to portable StableHLO bytes; a JSON
sidecar records input shape/dtype and provenance. The artifact runs on any
JAX backend via ``load_exported``.
"""

import json
import os
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from adell_mri_tpu.utils import get_logger

logger = get_logger(__name__)


def export_model(
    apply_fn: Callable,
    params: Any,
    input_shape: Sequence[int],
    output_path: str,
    input_dtype=jnp.float32,
    metadata: Optional[Dict] = None,
):
    """
    Serializes ``apply_fn(params, x)`` with ``params`` baked in. Writes
    ``{output_path}`` (StableHLO bytes) and ``{output_path}.json``.
    """

    def fwd(x):
        return apply_fn(params, x)

    spec = jax.ShapeDtypeStruct(tuple(input_shape), input_dtype)
    exported = jax_export.export(jax.jit(fwd))(spec)
    data = exported.serialize()
    with open(output_path, "wb") as f:
        f.write(data)
    side = {
        "input_shape": list(input_shape),
        "input_dtype": np.dtype(input_dtype).name,
        **(metadata or {}),
    }
    with open(output_path + ".json", "w") as f:
        json.dump(side, f, default=str, indent=1)
    logger.info("exported model to %s (%d bytes)", output_path, len(data))
    return output_path


def load_exported(path: str):
    """Returns (callable, sidecar metadata dict)."""
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return exported.call, meta
