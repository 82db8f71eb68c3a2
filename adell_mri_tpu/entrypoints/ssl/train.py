"""
``adell ssl train_3d`` / ``train_2d``.

Parity target: adell_mri/entrypoints/ssl/train_3d.py:41 (SURVEY.md §3.3):
Dataset -> SSLTransforms two views -> cached dataset -> steps/warmup math ->
optional EMA teacher -> get_ssl_network -> fit. The EMA teacher is the train
state's shadow tree, updated inside the jit step (pl.py:466 equivalent).
"""

import json

import jax
import numpy as np

from adell_mri_tpu.config.factories import get_ssl_network
from adell_mri_tpu.config.parsing import parse_config_ssl
from adell_mri_tpu.data import CachedVolumeDataset, DataLoader, Dataset, RandomSampler
from adell_mri_tpu.entrypoints.assemble_args import Parser
from adell_mri_tpu.parallel.mesh import get_devices, mesh_for_batch, shard_params
from adell_mri_tpu.train import (
    TrainState,
    cosine_annealing_with_warmup,
    get_optimizer,
)
from adell_mri_tpu.train.checkpoints import CheckpointManager
from adell_mri_tpu.train.logging_utils import MetricLogger
from adell_mri_tpu.train.loop import TrainLoop
from adell_mri_tpu.train.ssl_steps import (
    make_dino_step,
    make_ibot_step,
    make_ijepa_step,
    make_mae_step,
    make_ssl_train_step,
    make_two_view_step,
    make_vicregl_step,
)
from adell_mri_tpu.transforms import SSLTransforms
from adell_mri_tpu.utils import get_logger

logger = get_logger(__name__)

ARG_KEYS = [
    "dataset_json",
    "image_keys",
    "adc_keys",
    "filter_on_keys",
    "cache_rate",
    "cache_dir",
    "subsample_size",
    "target_spacing",
    "pad_size",
    "crop_size",
    "random_crop_size",
    "config_file",
    "dev",
    "precision",
    "n_workers",
    "seed",
    "max_epochs",
    "warmup_steps",
    "dropout_param",
    "batch_size",
    "learning_rate",
    "optimizer",
    "gradient_clip_val",
    "checkpoint_dir",
    "checkpoint_name",
    "resume_from_last",
    "monitor",
    "logger_type",
    "project_name",
    "summary_name",
    "metric_path",
    "ssl_method",
    "ema",
    "ema_decay",
    "stop_gradient",
    "n_local_crops",
    "sample_channels",
]


def main(arguments):
    parser = Parser(prog="adell ssl train")
    parser.add_argument_by_key(ARG_KEYS)
    args = parser.parse_args(arguments)

    data = Dataset(args.dataset_json, seed=args.seed)
    data.apply_filters(
        presence_keys=list(args.image_keys),
        filter_on_keys=args.filter_on_keys,
    )
    if args.subsample_size:
        data.subsample_dataset(subsample_size=args.subsample_size)

    config = parse_config_ssl(
        args.config_file,
        dropout_param=args.dropout_param,
        n_keys=len(args.image_keys) * (args.sample_channels or 1),
        is_ijepa=args.ssl_method == "ijepa",
    )
    net_cfg = config["network"]
    train_cfg = config["training"]
    batch_size = args.batch_size or train_cfg.get("batch_size", 4)
    learning_rate = args.learning_rate or train_cfg.get("learning_rate", 1e-3)
    weight_decay = train_cfg.get("weight_decay", 0.0)

    base_size = args.pad_size or args.crop_size
    crop_size = args.random_crop_size
    if base_size is None:
        raise ValueError("--pad_size or --crop_size required")
    # 2D backbones train on one cache-frozen random slice per volume
    # (parity: SSLTransforms n_dim==2, transform_factory/transforms.py:680)
    sd = int(
        (net_cfg.get("backbone_args") or {}).get(
            "spatial_dim", net_cfg.get("spatial_dim", 3)
        )
    )
    if sd == 2 and len(base_size) != 2:
        raise ValueError(
            "a 2D SSL backbone takes 2D --pad_size/--crop_size (the 3D "
            "volume is sliced at load time)"
        )

    platform, devices = get_devices(args.dev)
    mesh = mesh_for_batch(batch_size, devices)
    logger.info("platform=%s mesh=%s", platform, dict(mesh.shape))

    transforms = SSLTransforms(
        image_keys=args.image_keys,
        target_spacing=args.target_spacing,
        target_size=base_size,
        crop_size=crop_size,
        adc_keys=args.adc_keys or (),
        sample_channels=args.sample_channels,
        slice_2d=sd == 2,
        # VICRegL matches local features by absolute position, so views
        # must expose their crop warp matrices
        expose_boxes=args.ssl_method == "vicregl",
        n_local_crops=args.n_local_crops
        if args.ssl_method == "dino"
        else 0,
    )
    datalist = data.to_datalist()
    ds = CachedVolumeDataset(
        datalist,
        transforms.load_fn(),
        cache_rate=args.cache_rate,
        cache_dir=args.cache_dir,
        cache_fingerprint=repr(transforms),
    )
    loader = DataLoader(
        ds,
        sampler=RandomSampler(len(ds), seed=args.seed),
        batch_size=batch_size,
        drop_last=True,
        prefetch=max(args.n_workers, 2),
    )

    model = get_ssl_network(args.ssl_method, net_cfg)
    shape = tuple(crop_size or base_size)
    n_channels = len(args.image_keys) * (args.sample_channels or 1)
    x0 = np.zeros((1,) + shape + (n_channels,), np.float32)
    rngs = {"params": jax.random.PRNGKey(args.seed)}
    if args.ssl_method in ("mae", "ijepa"):
        rngs["masking"] = jax.random.PRNGKey(args.seed + 1)
        init_vars = model.init(rngs, x0, rng=jax.random.PRNGKey(0))
    elif args.ssl_method == "ibot":
        rngs["masking"] = jax.random.PRNGKey(args.seed + 1)
        init_vars = model.init(rngs, x0, mask=True)
    elif args.ssl_method == "vicregl":
        init_vars = model.init(rngs, x0, ret="local")
    else:
        init_vars = model.init(rngs, x0)
    params = init_vars["params"]
    # mutable collections (batch-norm running stats) travel in the state
    variables = {k: v for k, v in init_vars.items() if k != "params"} or None
    # DINO/iBOT prototype centers ride in the state's variables and are
    # updated inside the jit step (the reference's async all_reduce
    # centering, losses/dino.py:121)
    import jax.numpy as jnp

    out_dim = net_cfg.get("out_dim", 4096)
    if args.ssl_method == "dino":
        variables = {**(variables or {}), "dino_center": jnp.zeros(out_dim)}
    elif args.ssl_method == "ibot":
        variables = {
            **(variables or {}),
            "ibot_center_global": jnp.zeros(out_dim),
            "ibot_center_mask": jnp.zeros(out_dim),
        }

    steps_per_epoch = max(len(loader), 1)
    schedule = cosine_annealing_with_warmup(
        learning_rate,
        t_max=args.max_epochs * steps_per_epoch,
        n_warmup_steps=args.warmup_steps,
    )
    # SSL default: AdamW with norm-params-no-decay (pl.py:213-248)
    tx = get_optimizer(
        args.optimizer if args.optimizer != "sgd" else "adamw",
        learning_rate=schedule,
        weight_decay=weight_decay or 1e-6,
        clip_norm=args.gradient_clip_val,
        params=params,
        # the reference's SSL optimizer excludes norm params from decay
        # (self_supervised/pl.py:220-228); its other tasks decay all
        exclude_norms_from_decay=True,
    )
    use_ema = args.ema or args.ssl_method in ("byol", "ijepa", "dino", "ibot")
    with mesh:
        params = shard_params(params, mesh)
        state = TrainState.create(
            model.apply, params, tx,
            with_ema=use_ema,
            ema_decay=args.ema_decay if args.ema_decay is not None else 0.996,
            ema_final_decay=1.0,
            ema_n_steps=args.max_epochs * steps_per_epoch,
            variables=variables,
        )

    prec = getattr(args, "precision", None)
    if args.ssl_method == "mae":
        lm = make_mae_step(model, precision=prec)
    elif args.ssl_method == "ijepa":
        lm = make_ijepa_step(model, precision=prec)
    elif args.ssl_method == "dino":
        lm = make_dino_step(model, precision=prec)
    elif args.ssl_method == "ibot":
        lm = make_ibot_step(model, precision=prec)
    elif args.ssl_method == "vicregl":
        lm = make_vicregl_step(model, precision=prec)
    else:
        lm = make_two_view_step(
            model,
            method=args.ssl_method,
            ema_teacher=use_ema,
            stop_gradient=bool(args.stop_gradient),
            precision=prec,
        )
    ckpt = CheckpointManager(
        args.checkpoint_dir,
        name=args.checkpoint_name or f"ssl_{args.ssl_method}",
        fold=0,
        metadata={
            "network_config": net_cfg,
            "ssl_method": args.ssl_method,
            "transform_arguments": {
                "image_keys": list(args.image_keys),
                "sample_channels": args.sample_channels,
                "target_size": list(base_size),
                "crop_size": list(crop_size) if crop_size else None,
                "target_spacing": (
                    list(args.target_spacing)
                    if getattr(args, "target_spacing", None)
                    else None
                ),
            },
        },
        monitor=args.monitor,
    )
    # fresh runs drop any stale best.json from a prior run
    ckpt.begin_run(resume=bool(args.resume_from_last))
    if args.resume_from_last and ckpt.status(args.max_epochs) == "finished":
        logger.info("checkpoint already finished; nothing to do")
        return
    loop = TrainLoop(
        train_step=make_ssl_train_step(lm),
        augment_fn=transforms.augment,
        mesh=mesh,
        max_epochs=args.max_epochs,
        ckpt_manager=ckpt,
        metric_logger=MetricLogger(
            logger_type=args.logger_type,
            project_name=args.project_name,
            run_name=args.summary_name,
            csv_path=args.metric_path,
        ),
        monitor=args.monitor,
        seed=args.seed,
    )
    start_epoch = 0
    if args.resume_from_last:
        state, start_epoch = ckpt.resume(state)
        if start_epoch:
            logger.info("resuming from epoch %d", start_epoch)
    state, history = loop.fit(state, loader, start_epoch=start_epoch)
    logger.info("done: %s", json.dumps(history[-1] if history else {}, default=float))
