"""
Multi-host (pod) initialization.

The reference's distributed surface stops at single-host Lightning DDP
(SURVEY.md §2.5). On TPU pods the SPMD programs in this framework extend
across hosts once ``jax.distributed`` is initialized — the Mesh spans all
global devices and GSPMD routes collectives over ICI/DCN.

Data-feeding contract for multi-host TRAINING: every host must construct
the IDENTICAL global batch (the loaders here are deterministic given the
seed, so running the same entrypoint on each host satisfies this) —
``jax.device_put(global_numpy, sharding)`` then places each host's
addressable shards. ``shard_pids_for_host`` is for embarrassingly-parallel
INFERENCE (each host predicts a disjoint case subset), not for training
batches.

Activation is by environment (so single-host runs pay nothing):
  ADELL_DISTRIBUTED=1           turn the hook on
  JAX_COORDINATOR_ADDRESS       host:port of process 0 (or rely on the TPU
  JAX_NUM_PROCESSES / JAX_PROCESS_ID   pod metadata autodetection)
"""

import os

from adell_mri_tpu.utils import get_logger

logger = get_logger(__name__)

_initialized = False


def maybe_initialize_distributed() -> bool:
    """Initializes jax.distributed when ADELL_DISTRIBUTED=1; idempotent.

    Returns True when running multi-process after the call. On TPU pods
    ``jax.distributed.initialize()`` autodetects coordinator/process
    counts from the pod metadata; elsewhere the JAX_* env vars are used.
    """
    global _initialized
    if os.environ.get("ADELL_DISTRIBUTED", "0") != "1":
        return False
    import jax

    if not _initialized:
        kwargs = {}
        if os.environ.get("JAX_COORDINATOR_ADDRESS"):
            kwargs = dict(
                coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
                num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
                process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
            )
        jax.distributed.initialize(**kwargs)
        _initialized = True
        logger.info(
            "jax.distributed: process %d/%d, %d global / %d local devices",
            jax.process_index(),
            jax.process_count(),
            len(jax.devices()),
            len(jax.local_devices()),
        )
    return jax.process_count() > 1


def shard_pids_for_host(pids):
    """Disjoint per-host case split for INFERENCE entrypoints (host k of n
    takes every n-th case). Do NOT use for training loaders — training
    hosts must build identical global batches (see module docstring).
    Identity on a single host."""
    import jax

    n = jax.process_count()
    if n <= 1:
        return list(pids)
    k = jax.process_index()
    return list(pids)[k::n]
