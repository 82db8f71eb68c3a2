"""
NaN-loss forensics.

Parity target: the reference's opt-in ``raise_nan_loss`` hook
(adell_mri/modules/segmentation/pl.py:226-253) which dumps the offending
batch to disk and raises instead of silently diverging. Opt-in because the
finiteness check is a host sync: it blocks dispatch pipelining, so it is
off by default and throttled by ``every`` when on.
"""

import os
import time
from typing import Dict

import numpy as np

from adell_mri_tpu.utils import get_logger

logger = get_logger(__name__)


class NaNGuard:
    """
    Checks the running loss sum for non-finite values every ``every`` steps;
    on detection, dumps the current batch + params norms to an ``.npz`` and
    raises. Because the check runs on the *running sum*, a NaN anywhere in
    the epoch is caught at the next check — the dumped batch is the batch in
    flight at detection time (set ``every=1`` to make it the offender).
    """

    def __init__(self, dump_dir: str = ".", every: int = 1):
        self.dump_dir = dump_dir
        self.every = max(1, int(every))

    def check(self, metric_sums: Dict, state, batch, epoch: int, step: int):
        loss = metric_sums.get("loss")
        if loss is None:
            return
        if np.isfinite(float(loss)):
            return
        os.makedirs(self.dump_dir, exist_ok=True)
        path = os.path.join(
            self.dump_dir, f"nan_dump_e{epoch}_s{step}_{int(time.time())}.npz"
        )
        arrays = {
            k: np.asarray(v)
            for k, v in batch.items()
            if hasattr(v, "shape")
        }
        import jax

        leaves = jax.tree.leaves(state.params)
        arrays["param_abs_max"] = np.asarray(
            [float(abs(np.asarray(p)).max()) for p in leaves[:64]]
        )
        np.savez_compressed(path, **arrays)
        logger.error("non-finite loss at epoch %d step %d; batch dumped to %s",
                     epoch, step, path)
        raise FloatingPointError(
            f"non-finite training loss at epoch {epoch} step {step}; "
            f"forensic dump written to {path}"
        )
