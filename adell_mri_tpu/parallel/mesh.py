"""
Device mesh and sharding bootstrap — the TPU-native replacement for the
reference's DDP strategy selection (adell_mri/utils/pl_utils.py:422
``get_devices``: device-string -> Lightning DDP/NCCL).

Design (SURVEY.md §2.5, §7): one SPMD program over a
``jax.sharding.Mesh``. Data parallelism = batch-axis sharding over the
``data`` axis; optional ``fsdp`` axis shards parameters (ZeRO-style); an
optional ``model`` axis is reserved for tensor-parallel layers. Gradients and
metrics reduce via XLA collectives inserted by the partitioner (no NCCL, no
find_unused_parameters analogue — XLA is whole-program).

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh``; the
mesh then spans all processes with DCN as the outermost (data) axis.
"""

from collections import Counter
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from adell_mri_tpu.utils import get_logger

logger = get_logger(__name__)

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
MODEL_AXIS = "model"


def get_devices(dev_str: str = "tpu") -> Tuple[str, List[jax.Device]]:
    """
    Parses a device string into (platform, device list). Accepts the
    reference's CLI forms (``"cuda:0,1"`` -> here ``"tpu:0,1"``) plus
    ``"cpu"``/``"tpu"``/``"auto"``.

    Parity: utils/pl_utils.py:422 — but instead of picking a DDP strategy,
    the returned devices seed a Mesh; parallelism is expressed by shardings.
    """
    from adell_mri_tpu.parallel.distributed import (
        maybe_initialize_distributed,
    )

    maybe_initialize_distributed()
    dev_str = (dev_str or "auto").lower()
    if ":" in dev_str:
        platform, idx_str = dev_str.split(":", 1)
        indices = [int(i) for i in idx_str.split(",")]
    else:
        platform, indices = dev_str, None
    if platform in ("auto", "gpu", "cuda"):
        platform = None  # jax default backend
    if platform == "tpu":
        # TPU plugins may register under another platform name (the axon
        # tunnel registers 'axon'); --dev tpu means "the accelerator" —
        # fall back to the default backend unless it is plain CPU
        try:
            devices = jax.devices("tpu")
        except RuntimeError:
            devices = jax.devices()
            if devices[0].platform == "cpu":
                raise
    else:
        devices = jax.devices(platform) if platform else jax.devices()
    if indices is not None:
        devices = [devices[i] for i in indices]
    return (devices[0].platform, devices)


def local_device_count(dev_str: str = "auto") -> int:
    return len(get_devices(dev_str)[1])


def use_device(dev_str: str = "auto") -> jax.Device:
    """Honors ``--dev`` on inference/test entrypoints that run on the
    default backend rather than a mesh: resolves the platform and makes
    its first device the JAX default. Returns the chosen device."""
    _, devices = get_devices(dev_str)
    jax.config.update("jax_default_device", devices[0])
    return devices[0]


def mesh_for_batch(
    batch_size: int,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """
    A pure-DP mesh over ALL devices. A batch size that does not divide the
    device count is padded per step by ``shard_batch(..., pad=True)``
    (sample duplication, the DistributedSampler semantics) rather than
    stranding chips — idle devices on a TPU slice are a configuration
    error, so this warns loudly with the batch size that avoids padding.
    """
    import math

    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if batch_size % n != 0:
        target = math.ceil(batch_size / n) * n
        logger.warning(
            "batch size %d does not divide %d devices: train batches will "
            "be padded to %d by duplicating samples (duplicates carry "
            "gradient weight). Set --batch_size %d to avoid padding.",
            batch_size,
            n,
            target,
            target,
        )
    return make_mesh(devices)


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: int = -1,
    fsdp: int = 1,
    model: int = 1,
) -> Mesh:
    """
    Builds a ``Mesh`` with axes (data, fsdp, model). ``data=-1`` absorbs all
    remaining devices. Axis sizes must multiply to the device count.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data == -1:
        denom = fsdp * model
        if n % denom:
            raise ValueError(f"{n} devices not divisible by fsdp*model={denom}")
        data = n // denom
    if data * fsdp * model != n:
        raise ValueError(
            f"mesh {data}x{fsdp}x{model} != {n} devices"
        )
    dev_array = np.asarray(devices).reshape(data, fsdp, model)
    return Mesh(dev_array, (DATA_AXIS, FSDP_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shards the leading (batch) axis over data×fsdp; rest replicated."""
    return NamedSharding(mesh, P((DATA_AXIS, FSDP_AXIS)))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh, pad: bool = False) -> Dict:
    """
    Device-puts every array leaf of a host batch with the batch axis sharded
    over the mesh. Non-array leaves (identifiers) pass through. A batch
    whose size does not divide the data axes is either padded by repeating
    samples from the batch start (``pad=True`` — training: every chip
    works, duplicates carry gradient weight, shapes stay constant so no
    recompiles) or replicated (``pad=False`` — validation: exact metrics at
    the cost of redundant compute on the tail batch).
    """
    sharding = batch_sharding(mesh)
    divisor = mesh.shape[DATA_AXIS] * mesh.shape[FSDP_AXIS]
    # the batch size comes from the canonical "image" leaf when present,
    # else the MODAL leading dim across array leaves — the first leaf's
    # dim is dict-order-dependent and an auxiliary array (class-weight
    # vector, anchor table) appearing first would corrupt padding and
    # silently replicate the real batch leaves
    dims = [
        x.shape[0]
        for x in batch.values()
        if isinstance(x, (np.ndarray, jax.Array))
        and getattr(x, "ndim", 0) >= 1
    ]
    if isinstance(batch.get("image"), (np.ndarray, jax.Array)):
        batch_dim = batch["image"].shape[0]
    elif dims:
        batch_dim = Counter(dims).most_common(1)[0][0]
    else:
        batch_dim = 0
    if batch_dim % divisor != 0 and pad and batch_dim > 0:
        pad_n = -batch_dim % divisor
        idx = np.arange(pad_n) % batch_dim

        def pad_leaf(x):
            if (
                isinstance(x, (np.ndarray, jax.Array))
                and getattr(x, "ndim", 0) >= 1
                and x.shape[0] == batch_dim
            ):
                x = np.asarray(x)
                return np.concatenate([x, x[idx]], axis=0)
            return x

        batch = jax.tree.map(
            pad_leaf, batch, is_leaf=lambda x: isinstance(x, list)
        )
    elif batch_dim % divisor != 0:
        sharding = replicated_sharding(mesh)

    repl = replicated_sharding(mesh)
    final_dim = batch_dim + (
        (-batch_dim % divisor)
        if (pad and batch_dim % divisor != 0 and batch_dim > 0)
        else 0
    )

    def put(x):
        if isinstance(x, (np.ndarray, jax.Array)) and getattr(x, "ndim", 0) >= 1:
            # only batch-leading leaves shard on axis 0; auxiliary arrays
            # (class-weight vectors, variable-length sidecars) replicate —
            # batch-sharding them would hit a divisibility error mid-epoch
            if x.shape[0] == final_dim:
                return jax.device_put(x, sharding)
            return jax.device_put(x, repl)
        return x

    return jax.tree.map(put, batch, is_leaf=lambda x: isinstance(x, list))


def shard_params(params, mesh: Mesh, fsdp_min_size: int = 2**18):
    """
    FSDP-style parameter layout: leaves bigger than ``fsdp_min_size`` shard
    their largest divisible axis over the fsdp mesh axis; everything else is
    replicated. With fsdp=1 this is plain replication (pure DP).
    """
    fsdp_size = mesh.shape[FSDP_AXIS]

    def spec_for(x) -> NamedSharding:
        if fsdp_size > 1 and x.size >= fsdp_min_size:
            shape = x.shape
            for axis in sorted(
                range(len(shape)), key=lambda a: -shape[a]
            ):
                if shape[axis] % fsdp_size == 0:
                    spec = [None] * len(shape)
                    spec[axis] = FSDP_AXIS
                    return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(
        lambda x: jax.device_put(x, spec_for(x)), params
    )


# default tensor-parallel rules: attention projections and MLP expansions
# shard their OUTPUT feature axis; attention output / MLP contraction
# kernels shard their INPUT axis so the pair needs only one all-reduce
# (the Megatron column->row split)
TP_COLUMN_NAMES = ("q", "k", "v", "query", "key", "value")
TP_ROW_NAMES = ("proj", "out", "output")


def shard_params_tp(params, mesh: Mesh, fsdp_min_size: int = 2**18):
    """
    Tensor-parallel parameter layout over the ``model`` axis, composed with
    the FSDP layout for everything else: kernels of modules whose path
    contains a TP_COLUMN_NAMES segment shard their last (output) axis;
    TP_ROW_NAMES kernels shard their first (input) axis. XLA/GSPMD inserts
    the matching all-gathers/reduce-scatters. With model=1 this degrades to
    plain shard_params.
    """
    tp = mesh.shape[MODEL_AXIS]
    fsdp_size = mesh.shape[FSDP_AXIS]
    if tp <= 1:
        return shard_params(params, mesh, fsdp_min_size)

    def spec_for(path, x) -> NamedSharding:
        names = [
            str(p.key) if hasattr(p, "key") else str(p) for p in path
        ]
        is_kernel = names and names[-1] == "kernel" and x.ndim >= 2
        if is_kernel:
            in_col = any(
                any(seg == n or seg.startswith(n + "_") for n in TP_COLUMN_NAMES)
                for seg in names
            )
            in_row = any(
                any(seg == n or seg.startswith(n + "_") for n in TP_ROW_NAMES)
                for seg in names
            )
            if in_col and x.shape[-1] % tp == 0:
                spec = [None] * x.ndim
                spec[-1] = MODEL_AXIS
                return NamedSharding(mesh, P(*spec))
            if in_row and x.shape[0] % tp == 0:
                spec = [None] * x.ndim
                spec[0] = MODEL_AXIS
                return NamedSharding(mesh, P(*spec))
        if fsdp_size > 1 and x.size >= fsdp_min_size:
            for axis in sorted(range(x.ndim), key=lambda a: -x.shape[a]):
                if x.shape[axis] % fsdp_size == 0:
                    spec = [None] * x.ndim
                    spec[axis] = FSDP_AXIS
                    return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(
        lambda path, x: jax.device_put(x, spec_for(path, x)), params
    )
