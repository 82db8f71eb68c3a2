"""
``adell generative generate`` — sample volumes from a trained DDPM
(parity: entrypoints/generative/generate.py:26-50 — network and transform
config reconstructed from checkpoint metadata).
"""

import os

import jax
import numpy as np

from adell_mri_tpu.data.writer import AsyncNiftiWriter
from adell_mri_tpu.entrypoints.assemble_args import Parser
from adell_mri_tpu.models.diffusion import DiffusionProcess, DiffusionUNet
from adell_mri_tpu.train.checkpoints import CheckpointManager
from adell_mri_tpu.utils import get_logger

logger = get_logger(__name__)

ARG_KEYS = [
    "checkpoint_dir",
    "checkpoint_name",
    "output_path",
    "dev",
    "seed",
    ("batch_size", "n_samples", dict(default=1, help="Number of samples")),
]


def main(arguments):
    parser = Parser(prog="adell generative generate")
    parser.add_argument_by_key(ARG_KEYS)
    parser.add_argument("--ddim_steps", type=int, default=None)
    args = parser.parse_args(arguments)

    mngr = CheckpointManager(
        args.checkpoint_dir, name=args.checkpoint_name or "diffusion", fold=0
    )
    meta = mngr.load_metadata()
    net_cfg = meta["network_config"]
    t_args = meta["transform_arguments"]
    size = tuple(t_args["target_size"])
    depth = tuple(net_cfg["depth"])
    model = DiffusionUNet(
        spatial_dimensions=net_cfg["spatial_dimensions"],
        depth=depth,
        attention_levels=tuple([False] * (len(depth) - 1) + [True]),
        in_channels=net_cfg["in_channels"],
        temb_dim=net_cfg.get("temb_dim", 128),
    )
    process = DiffusionProcess(n_timesteps=net_cfg["n_timesteps"])
    x0 = np.zeros((1,) + size + (net_cfg["in_channels"],), np.float32)
    params0 = model.init(
        {"params": jax.random.PRNGKey(0)}, x0, np.zeros((1,), np.int32)
    )["params"]
    params = mngr.restore(mngr.best_step(), target={"params": params0})["params"]

    import jax.numpy as jnp

    def model_fn(xt, t):
        return model.apply(
            {"params": params}, xt, jnp.full((xt.shape[0],), t)
        )

    shape = (args.n_samples,) + size + (net_cfg["in_channels"],)
    key = jax.random.PRNGKey(args.seed)
    if args.ddim_steps:
        samples = process.ddim_sample(key, model_fn, shape, n_steps=args.ddim_steps)
    else:
        samples = jax.jit(
            lambda k: process.sample(k, model_fn, shape)
        )(key)
    samples = np.asarray(samples)
    os.makedirs(args.output_path, exist_ok=True)
    writer = AsyncNiftiWriter()
    for i in range(args.n_samples):
        path = os.path.join(args.output_path, f"sample_{i}.nii.gz")
        writer.put(path, samples[i, ..., 0])
        logger.info("wrote %s", path)
    writer.close()
