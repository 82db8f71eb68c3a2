"""
Batch collation.

Parity targets: safe_collate (adell_mri/utils/utils.py:307), safe_collate_crops
(:363), collate_last_slice (:246). Works on numpy (host side); stacked batches
are shipped to device as one transfer.
"""

from typing import Any, Dict, List, Optional

import numpy as np


def _stack_values(values: List[Any]):
    first = values[0]
    if isinstance(first, np.ndarray):
        return np.stack(values, axis=0)
    if isinstance(first, (int, float, np.integer, np.floating)):
        return np.asarray(values)
    if isinstance(first, (list, tuple)) and first and isinstance(
        first[0], (int, float, np.integer, np.floating)
    ):
        return np.asarray(values)
    return values  # strings / identifiers stay as lists


def safe_collate(batch: List[Optional[Dict[str, Any]]]) -> Dict[str, Any]:
    """Drops None samples, then stacks each key across the batch."""
    batch = [b for b in batch if b is not None]
    if len(batch) == 0:
        return {}
    keys = batch[0].keys()
    return {k: _stack_values([b[k] for b in batch]) for k in keys}


def safe_collate_crops(
    batch: List[Optional[List[Dict[str, Any]]]]
) -> Dict[str, Any]:
    """
    Each sample is a list of n_crops dicts; flattens crops into the batch
    dimension (parity: utils/utils.py:363).
    """
    batch = [b for b in batch if b is not None]
    flat = [crop for sample in batch for crop in sample]
    return safe_collate(flat)


def collate_last_slice(batch: List[Optional[Dict[str, Any]]]) -> Dict[str, Any]:
    """
    2.5D collation: folds the slice axis into the batch axis (parity:
    utils/utils.py:246). The reference folds the LAST axis of its
    channels-first ``[C, H, W, S]`` tensors; this repo's load_fns emit
    channels-LAST ``[H, W, S, C]`` images and channel-less ``[H, W, S]``
    labels, so the slice axis is -2 for ndim >= 4 and -1 for ndim == 3
    (folding -2 of a 3D label would split along W, scrambling geometry
    and mismatching the image's batch count).
    """
    batch = [b for b in batch if b is not None]
    if len(batch) == 0:
        return {}
    out: Dict[str, Any] = {}
    for k in batch[0].keys():
        values = [b[k] for b in batch]
        if isinstance(values[0], np.ndarray) and values[0].ndim >= 3:
            slice_axis = -2 if values[0].ndim >= 4 else -1
            # [H, W, S, C] -> S entries of [H, W, C];
            # [H, W, S]    -> S entries of [H, W]
            slices = [np.moveaxis(v, slice_axis, 0) for v in values]
            out[k] = np.concatenate(slices, axis=0)
        else:
            out[k] = _stack_values(values)
    return out
