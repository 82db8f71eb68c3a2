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
    "guidance_strength",
    "cat_condition",
    "num_condition",
    "skip_steps",
]


def main(arguments):
    parser = Parser(prog="adell generative generate")
    parser.add_argument_by_key(ARG_KEYS)
    parser.add_argument("--ddim_steps", type=int, default=None)
    parser.add_argument(
        "--input_image", default=None,
        help="Source NIfTI for partial denoise (used with --skip_steps)",
    )
    args = parser.parse_args(arguments)

    from adell_mri_tpu.parallel.mesh import use_device

    use_device(args.dev)

    mngr = CheckpointManager(
        args.checkpoint_dir, name=args.checkpoint_name or "diffusion", fold=0
    )
    meta = mngr.load_metadata()
    net_cfg = meta["network_config"]
    t_args = meta["transform_arguments"]
    size = tuple(t_args["target_size"])
    depth = tuple(net_cfg["depth"])
    cat_maps = net_cfg.get("cat_maps") or []
    num_keys = net_cfg.get("num_condition_keys") or []
    conditional = bool(cat_maps or num_keys)
    model = DiffusionUNet(
        spatial_dimensions=net_cfg["spatial_dimensions"],
        depth=depth,
        attention_levels=tuple(
            net_cfg.get(
                "attention_levels", [False] * (len(depth) - 1) + [True]
            )
        ),
        in_channels=net_cfg["in_channels"],
        temb_dim=net_cfg.get("temb_dim", 128),
    )
    process = DiffusionProcess(
        n_timesteps=net_cfg["n_timesteps"],
        schedule=net_cfg.get("beta_schedule", "linear"),
    )
    x0 = np.zeros((1,) + size + (net_cfg["in_channels"],), np.float32)

    import jax.numpy as jnp

    n = args.n_samples
    if conditional:
        from adell_mri_tpu.models.diffusion import Embedder

        emb_size = net_cfg.get("embedding_size", 128)
        embedder = Embedder(
            cat_feat=tuple(len(m) for m in cat_maps),
            n_num_feat=len(num_keys),
            embedding_size=emb_size,
        )
        cat0 = [np.zeros((1,), np.int32)] * len(cat_maps) or None
        num0 = np.zeros((1, len(num_keys)), np.float32) if num_keys else None
        emb_params0 = embedder.init(
            {"params": jax.random.PRNGKey(0)}, cat0, num0, batch_size=1
        )["params"]
        cond0 = np.zeros((1, emb_size), np.float32)
        unet_params0 = model.init(
            {"params": jax.random.PRNGKey(0)}, x0, np.zeros((1,), np.int32),
            cond_embedding=cond0,
        )["params"]
        restored = mngr.restore(
            mngr.best_step(),
            target={"params": {"unet": unet_params0, "embedder": emb_params0}},
        )["params"]
        unet_params, emb_params = restored["unet"], restored["embedder"]
        # condition values -> embeddings (classifier-free guidance uses the
        # null embedding for the unconditional branch)
        x_cat = None
        if cat_maps:
            vals = args.cat_condition or []
            if len(vals) != len(cat_maps):
                raise ValueError(
                    f"--cat_condition needs {len(cat_maps)} value(s)"
                )
            x_cat = [
                jnp.full((n,), m[str(v)], jnp.int32)
                for v, m in zip(vals, cat_maps)
            ]
        x_num = None
        if num_keys:
            vals = args.num_condition or []
            if len(vals) != len(num_keys):
                raise ValueError(
                    f"--num_condition needs {len(num_keys)} value(s)"
                )
            x_num = jnp.tile(
                jnp.asarray(vals, jnp.float32)[None], (n, 1)
            )
        cond_emb = embedder.apply({"params": emb_params}, x_cat, x_num)
        null_emb = embedder.apply(
            {"params": emb_params}, None, None, batch_size=n
        )
        w = args.guidance_strength

        def model_fn(xt, t):
            tvec = jnp.full((xt.shape[0],), t)
            eps_c = model.apply(
                {"params": unet_params}, xt, tvec, cond_embedding=cond_emb
            )
            if w == 0.0:
                return eps_c
            eps_u = model.apply(
                {"params": unet_params}, xt, tvec, cond_embedding=null_emb
            )
            return (1.0 + w) * eps_c - w * eps_u

    else:
        params0 = model.init(
            {"params": jax.random.PRNGKey(0)}, x0, np.zeros((1,), np.int32)
        )["params"]
        params = mngr.restore(mngr.best_step(), target={"params": params0})[
            "params"
        ]

        def model_fn(xt, t):
            return model.apply(
                {"params": params}, xt, jnp.full((xt.shape[0],), t)
            )

    shape = (args.n_samples,) + size + (net_cfg["in_channels"],)
    key = jax.random.PRNGKey(args.seed)
    if args.skip_steps and not args.input_image:
        raise ValueError(
            "--skip_steps needs --input_image (a source volume to "
            "partially denoise from)"
        )
    if args.skip_steps and args.ddim_steps:
        raise ValueError(
            "--skip_steps (partial denoise) is a DDPM-path feature; "
            "drop --ddim_steps to use it"
        )
    x_start = None
    if args.skip_steps and args.input_image:
        # partial denoise from a source volume (parity: skip_steps in the
        # reference's DiffusionUNetPL sampling)
        from adell_mri_tpu.transforms.pipeline import make_load_fn

        load = make_load_fn(
            image_keys=["image"], label_keys=None,
            target_spacing=t_args.get("target_spacing"),
            target_size=size,
        )
        vol = load({"image": args.input_image, "identifier": "src"})["image"]
        x_start = jnp.tile(
            jnp.asarray(vol)[None], (args.n_samples,) + (1,) * vol.ndim
        )
    if args.ddim_steps:
        samples = process.ddim_sample(key, model_fn, shape, n_steps=args.ddim_steps)
    else:
        samples = jax.jit(
            lambda k: process.sample(
                k, model_fn, shape, skip_steps=args.skip_steps,
                x_start=x_start,
            )
        )(key)
    samples = np.asarray(samples)
    os.makedirs(args.output_path, exist_ok=True)
    writer = AsyncNiftiWriter()
    for i in range(args.n_samples):
        path = os.path.join(args.output_path, f"sample_{i}.nii.gz")
        writer.put(path, samples[i, ..., 0])
        logger.info("wrote %s", path)
    writer.close()
