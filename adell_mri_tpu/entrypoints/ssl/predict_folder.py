"""
``adell ssl predict_folder`` — run a trained SSL encoder over a folder of
volumes and write per-file representation vectors to JSON.

Parity target: adell_mri/entrypoints/ssl/predict_folder.py (:57-137 —
features JSON with rounded vectors).
"""

import glob
import json
import os

import jax
import numpy as np

from adell_mri_tpu.config.factories import get_ssl_network
from adell_mri_tpu.data import read_nifti, reorient_to_ras
from adell_mri_tpu.entrypoints.assemble_args import Parser
from adell_mri_tpu.train.checkpoints import CheckpointManager
from adell_mri_tpu.transforms.host import resample_to_spec
from adell_mri_tpu.utils import get_logger

logger = get_logger(__name__)

ARG_KEYS = [
    "checkpoint_dir",
    "checkpoint_name",
    "output_path",
    "dev",
    "seed",
    "ssl_method",
]


def main(arguments):
    parser = Parser(prog="adell ssl predict_folder")
    parser.add_argument_by_key(ARG_KEYS)
    parser.add_argument(
        "--input_folder", required=True, help="Folder with .nii/.nii.gz"
    )
    args = parser.parse_args(arguments)

    from adell_mri_tpu.parallel.mesh import use_device

    use_device(args.dev)

    mngr = CheckpointManager(
        args.checkpoint_dir,
        name=args.checkpoint_name or f"ssl_{args.ssl_method}",
        fold=0,
    )
    metadata = mngr.load_metadata()
    net_cfg = metadata.get("network_config", {})
    t_args = metadata.get("transform_arguments", {})
    method = metadata.get("ssl_method", args.ssl_method)
    size = tuple(t_args.get("target_size") or (64, 64, 32))
    spacing = t_args.get("target_spacing")
    # channel count must match training (4D inputs / --sample_channels);
    # inference keeps the FIRST n channels deterministically
    n_channels = len(t_args.get("image_keys") or [1]) * (
        t_args.get("sample_channels") or 1
    )

    model = get_ssl_network(method, net_cfg)
    x0 = np.zeros((1,) + size + (n_channels,), np.float32)
    init_vars = model.init({"params": jax.random.PRNGKey(0)}, x0)
    target = {"params": init_vars["params"]}
    extra = {k: v for k, v in init_vars.items() if k != "params"}
    if extra:
        target["variables"] = extra
    restored = mngr.restore(mngr.best_step(), target=target)
    tree = {"params": restored["params"], **restored.get("variables", {})}

    @jax.jit
    def encode(x):
        out = model.apply(tree, x, train=False, ret="representation")
        rep = out[0] if isinstance(out, (tuple, list)) else out
        if rep.ndim > 2:  # spatial map -> global average
            rep = rep.mean(axis=tuple(range(1, rep.ndim - 1)))
        return rep

    paths = sorted(
        glob.glob(os.path.join(args.input_folder, "*.nii.gz"))
        + glob.glob(os.path.join(args.input_folder, "*.nii"))
    )
    out = {}
    for path in paths:
        img = reorient_to_ras(read_nifti(path))
        vol = resample_to_spec(img, spacing, size, keep_channels=True)
        if vol.ndim == 3:
            vol = vol[..., None]
        if vol.shape[-1] < n_channels:
            raise ValueError(
                f"{path} has {vol.shape[-1]} channels; the checkpoint "
                f"was trained with {n_channels}"
            )
        vol = vol[..., :n_channels]
        lo, hi = vol.min(), vol.max()
        vol = (vol - lo) / max(hi - lo, 1e-6)
        x = vol[None].astype(np.float32)
        f = np.asarray(encode(x))[0]
        out[os.path.basename(path)] = {
            "features": [round(float(v), 4) for v in f.ravel()]
        }
        logger.info("encoded %s -> %d dims", path, f.size)
    with open(args.output_path, "w") as fjson:
        json.dump(out, fjson, indent=1)
    logger.info("wrote %d feature vectors to %s", len(out), args.output_path)
