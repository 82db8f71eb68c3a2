"""
``adell generative train`` — DDPM training.

Parity target: adell_mri/entrypoints/generative/train.py (DiffusionUNetPL:
ε-prediction MSE at random timesteps; conditioning with classifier-free
dropout via Embedder).
"""

import json
import os

import jax
import numpy as np

from adell_mri_tpu.config.parsing import load_yaml
from adell_mri_tpu.data import CachedVolumeDataset, DataLoader, Dataset, RandomSampler
from adell_mri_tpu.entrypoints.assemble_args import Parser
from adell_mri_tpu.models.diffusion import DiffusionProcess, DiffusionUNet
from adell_mri_tpu.parallel.mesh import get_devices, mesh_for_batch
from adell_mri_tpu.train import TrainState, cosine_annealing_with_warmup, get_optimizer
from adell_mri_tpu.train.checkpoints import CheckpointManager
from adell_mri_tpu.train.gan_steps import make_diffusion_step
from adell_mri_tpu.train.logging_utils import MetricLogger
from adell_mri_tpu.train.loop import TrainLoop
from adell_mri_tpu.train.steps import make_train_step
from adell_mri_tpu.transforms import GenerationTransforms
from adell_mri_tpu.utils import get_logger

logger = get_logger(__name__)

ARG_KEYS = [
    "dataset_json",
    "image_keys",
    "filter_on_keys",
    "cache_rate",
    "cache_dir",
    "subsample_size",
    "target_spacing",
    "pad_size",
    "config_file",
    "dev",
    "precision",
    "seed",
    "max_epochs",
    "warmup_steps",
    "batch_size",
    "learning_rate",
    "optimizer",
    "checkpoint_dir",
    "checkpoint_name",
    "monitor",
    "metric_path",
    "sample_panel_every",
    "cat_condition_keys",
    "num_condition_keys",
    "uncondition_proba",
]


def main(arguments):
    parser = Parser(prog="adell generative train")
    parser.add_argument_by_key(ARG_KEYS)
    args = parser.parse_args(arguments)

    cat_keys = args.cat_condition_keys or []
    num_keys = args.num_condition_keys or []
    data = Dataset(args.dataset_json, seed=args.seed)
    data.apply_filters(
        presence_keys=list(args.image_keys) + cat_keys + num_keys,
        filter_on_keys=args.filter_on_keys,
    )
    if args.subsample_size:
        data.subsample_dataset(subsample_size=args.subsample_size)
    cfg = load_yaml(args.config_file) if args.config_file else {}
    batch_size = args.batch_size or cfg.get("batch_size", 2)
    learning_rate = args.learning_rate or cfg.get("learning_rate", 1e-4)
    base_size = tuple(args.pad_size)
    sd = cfg.get("spatial_dimensions", len(base_size))

    transforms = GenerationTransforms(
        image_keys=args.image_keys,
        target_spacing=args.target_spacing,
        target_size=base_size,
        # 2D diffusion on 3D volumes: one cache-frozen random slice per
        # volume (GenerationTransforms n_dim==2, transforms.py:570-578)
        slice_2d=sd == 2,
    )
    datalist = data.to_datalist()

    # categorical condition value -> integer maps (parity:
    # CategoricalConversion inside the reference's Embedder factory)
    cat_maps = []
    for key in cat_keys:
        values = sorted({str(e[key]) for e in datalist})
        cat_maps.append({v: i for i, v in enumerate(values)})
    base_load = transforms.load_fn()

    def load_fn(entry):
        s = base_load(entry)
        if cat_keys:
            s["cond_cat"] = np.asarray(
                [m[str(entry[k])] for k, m in zip(cat_keys, cat_maps)],
                np.int32,
            )
        if num_keys:
            s["cond_num"] = np.asarray(
                [float(entry[k]) for k in num_keys], np.float32
            )
        return s

    ds = CachedVolumeDataset(
        datalist, load_fn,
        cache_rate=args.cache_rate, cache_dir=args.cache_dir,
        cache_fingerprint=repr(transforms),
    )
    loader = DataLoader(
        ds, sampler=RandomSampler(len(ds), seed=args.seed),
        batch_size=batch_size, drop_last=True,
    )

    depth = tuple(cfg.get("depth", (32, 64, 128)))
    model = DiffusionUNet(
        spatial_dimensions=sd,
        depth=depth,
        attention_levels=tuple(
            cfg.get("attention_levels", [False] * (len(depth) - 1) + [True])
        ),
        in_channels=len(args.image_keys),
        temb_dim=cfg.get("temb_dim", 128),
    )
    process = DiffusionProcess(
        n_timesteps=cfg.get("n_timesteps", 1000),
        schedule=cfg.get("beta_schedule", "linear"),
    )
    x0 = np.zeros((1,) + base_size + (len(args.image_keys),), np.float32)
    embedder = None
    if cat_keys or num_keys:
        from adell_mri_tpu.models.diffusion import Embedder

        embedder = Embedder(
            cat_feat=tuple(len(m) for m in cat_maps),
            n_num_feat=len(num_keys),
            embedding_size=cfg.get("embedding_size", 128),
            uncondition_proba=args.uncondition_proba,
        )
        cat0 = [np.zeros((1,), np.int32)] * len(cat_keys) or None
        num0 = np.zeros((1, len(num_keys)), np.float32) if num_keys else None
        emb_params = embedder.init(
            {"params": jax.random.PRNGKey(args.seed + 1)}, cat0, num0,
            batch_size=1,
        )["params"]
        cond0 = np.zeros((1, cfg.get("embedding_size", 128)), np.float32)
        unet_params = model.init(
            {"params": jax.random.PRNGKey(args.seed)}, x0,
            np.zeros((1,), np.int32), cond_embedding=cond0,
        )["params"]
        params = {"unet": unet_params, "embedder": emb_params}
    else:
        params = model.init(
            {"params": jax.random.PRNGKey(args.seed)}, x0,
            np.zeros((1,), np.int32),
        )["params"]
    schedule = cosine_annealing_with_warmup(
        learning_rate,
        t_max=args.max_epochs * max(len(loader), 1),
        n_warmup_steps=args.warmup_steps,
    )
    tx = get_optimizer(
        "adamw" if args.optimizer == "sgd" else args.optimizer,
        learning_rate=schedule, params=params,
    )
    platform, devices = get_devices(args.dev)
    mesh = mesh_for_batch(batch_size, devices)
    with mesh:
        state = TrainState.create(model.apply, params, tx)
    ckpt = CheckpointManager(
        args.checkpoint_dir,
        name=args.checkpoint_name or "diffusion",
        fold=0,
        metadata={
            "network_config": {
                "depth": list(depth),
                "spatial_dimensions": sd,
                "n_timesteps": process.n_timesteps,
                # generate must rebuild the EXACT training process/module:
                # a different beta schedule silently degrades sampling and
                # different attention_levels break the restore
                "beta_schedule": cfg.get("beta_schedule", "linear"),
                "attention_levels": list(
                    cfg.get(
                        "attention_levels",
                        [False] * (len(depth) - 1) + [True],
                    )
                ),
                "temb_dim": cfg.get("temb_dim", 128),
                "in_channels": len(args.image_keys),
                "embedding_size": cfg.get("embedding_size", 128),
                "cat_maps": cat_maps,
                "num_condition_keys": list(num_keys),
                "cat_condition_keys": list(cat_keys),
            },
            "transform_arguments": {
                "image_keys": list(args.image_keys),
                "target_size": list(base_size),
                "target_spacing": (
                    list(args.target_spacing)
                    if args.target_spacing
                    else None
                ),
            },
        },
        monitor=args.monitor,
    )
    # fresh runs drop any stale best.json from a prior run
    ckpt.begin_run(resume=False)
    callbacks = []
    if args.sample_panel_every:
        from adell_mri_tpu.train.logging_utils import ImagePanelCallback

        def sample_fn(state, rng):
            def model_fn(x, t):
                p = (
                    state.params["unet"]
                    if embedder is not None
                    else state.params
                )
                return model.apply({"params": p}, x, t)

            # fast epoch panel: DDIM with a 50-step ladder (passing
            # skip_steps without x_start used to be silently IGNORED,
            # running all n_timesteps forwards per panel)
            return process.ddim_sample(
                rng,
                model_fn,
                (4,) + base_size + (len(args.image_keys),),
                n_steps=min(50, process.n_timesteps),
            )

        callbacks.append(
            ImagePanelCallback(
                sample_fn,
                os.path.join(args.checkpoint_dir, "panels"),
                every_n_epochs=args.sample_panel_every,
            )
        )
    loop = TrainLoop(
        train_step=make_train_step(
            make_diffusion_step(
                model,
                process,
                embedder=embedder,
                precision=getattr(args, "precision", None),
            )
        ),
        mesh=mesh,
        max_epochs=args.max_epochs,
        ckpt_manager=ckpt,
        metric_logger=MetricLogger(csv_path=args.metric_path),
        monitor=args.monitor,
        seed=args.seed,
        callbacks=callbacks,
    )
    state, history = loop.fit(state, loader)
    logger.info("done: %s", json.dumps(history[-1] if history else {}, default=float))
