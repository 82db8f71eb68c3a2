"""
``adell ssl train_2d`` — 2D self-supervised training from DICOM slices.

Parity target: adell_mri/entrypoints/ssl/train_2d.py + utils/dicom_loader.py
(:66 DICOMDataset, :145 SliceSampler): the dataset JSON is the nested
``{pid: {series_key: [{"image": dcm_path}, ...]}}`` DICOM dict; each epoch
draws one random slice per (study, series) per iteration, resizes to the
static 2D shape on host, and the two-view augmentation engine runs on device
exactly as in the 3D path (SSLTransforms with ndim=2).
"""

import json

import jax
import numpy as np

from adell_mri_tpu.config.factories import get_ssl_network
from adell_mri_tpu.config.parsing import parse_config_ssl
from adell_mri_tpu.data import DataLoader
from adell_mri_tpu.data.dicom import (
    DICOMDataset,
    SliceSampler,
    filter_dicom_dict_on_presence,
)
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
    make_mae_step,
    make_ssl_train_step,
    make_two_view_step,
)
from adell_mri_tpu.transforms import SSLTransforms
from adell_mri_tpu.utils import get_logger

logger = get_logger(__name__)

ARG_KEYS = [
    "dataset_json",
    "image_keys",
    "subsample_size",
    "crop_size",
    "pad_size",
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
    "monitor",
    "logger_type",
    "project_name",
    "summary_name",
    "metric_path",
    "ssl_method",
    "ema",
    "ema_decay",
    "n_local_crops",
    "n_series_iterations",
    "max_slices",
]


def main(arguments):
    parser = Parser(prog="adell ssl train_2d")
    parser.add_argument_by_key(ARG_KEYS)
    args = parser.parse_args(arguments)

    data_dict = {}
    paths = (
        args.dataset_json
        if isinstance(args.dataset_json, (list, tuple))
        else [args.dataset_json]
    )
    for path in paths:
        with open(path) as f:
            data_dict.update(json.load(f))
    # nested {pid: {series: [entries]}} -> list-of-study form + presence
    # filtering (parity: filter_dicom_dict_on_presence, train_2d.py:125)
    studies = [data_dict[k] for k in sorted(data_dict)]
    studies = filter_dicom_dict_on_presence(studies, ["image"])
    if args.image_keys:
        keep = set(args.image_keys)
        studies = [
            {k: v for k, v in st.items() if k in keep or not keep}
            for st in studies
        ]
        studies = [st for st in studies if st]
    if args.max_slices:
        studies = [
            {k: v[: args.max_slices] for k, v in st.items()}
            for st in studies
        ]
    if args.subsample_size:
        studies = studies[: args.subsample_size]
    if not studies:
        raise ValueError("no DICOM studies left after filtering")

    size2d = tuple(args.crop_size or args.pad_size or (128, 128))[:2]

    def slice_transform(entry):
        img = np.asarray(entry["image"], np.float32)
        # static 2D shape: center crop/pad then min-max scale
        out = np.zeros(size2d, np.float32)
        h = min(img.shape[0], size2d[0])
        w = min(img.shape[1], size2d[1])
        oy, ox = (size2d[0] - h) // 2, (size2d[1] - w) // 2
        iy, ix = (img.shape[0] - h) // 2, (img.shape[1] - w) // 2
        out[oy : oy + h, ox : ox + w] = img[iy : iy + h, ix : ix + w]
        lo, hi = out.min(), out.max()
        return {"image": ((out - lo) / max(hi - lo, 1e-6))[..., None]}

    ds = DICOMDataset(studies, transform=slice_transform)
    sampler = SliceSampler(
        studies,
        n_iterations=args.n_series_iterations,
        shuffle=True,
        seed=args.seed,
    )

    config = parse_config_ssl(
        args.config_file,
        dropout_param=args.dropout_param,
        n_keys=1,
        is_ijepa=args.ssl_method == "ijepa",
    )
    net_cfg = dict(config["network"])
    net_cfg["spatial_dimensions"] = 2
    net_cfg.setdefault("patch_size", (8, 8))
    train_cfg = config["training"]
    batch_size = args.batch_size or train_cfg.get("batch_size", 16)
    learning_rate = args.learning_rate or train_cfg.get("learning_rate", 1e-3)

    loader = DataLoader(
        ds, sampler=sampler, batch_size=batch_size, drop_last=True,
        prefetch=max(args.n_workers, 2),
    )

    platform, devices = get_devices(args.dev)
    mesh = mesh_for_batch(batch_size, devices)
    logger.info(
        "platform=%s mesh=%s studies=%d slices=%d",
        platform, dict(mesh.shape), len(studies), len(ds),
    )

    crop2d = tuple(args.random_crop_size)[:2] if args.random_crop_size else None
    transforms = SSLTransforms(
        image_keys=("image",),
        target_size=size2d,
        crop_size=crop2d,
        n_local_crops=args.n_local_crops if args.ssl_method == "dino" else 0,
    )

    model = get_ssl_network(args.ssl_method, net_cfg)
    shape = crop2d or size2d
    x0 = np.zeros((1,) + tuple(shape) + (1,), np.float32)
    rngs = {"params": jax.random.PRNGKey(args.seed)}
    if args.ssl_method in ("mae", "ijepa"):
        rngs["masking"] = jax.random.PRNGKey(args.seed + 1)
        init_vars = model.init(rngs, x0, rng=jax.random.PRNGKey(0))
    elif args.ssl_method == "ibot":
        rngs["masking"] = jax.random.PRNGKey(args.seed + 1)
        init_vars = model.init(rngs, x0, mask=True)
    else:
        init_vars = model.init(rngs, x0)
    params = init_vars["params"]
    variables = {k: v for k, v in init_vars.items() if k != "params"} or None
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
    tx = get_optimizer(
        args.optimizer if args.optimizer != "sgd" else "adamw",
        learning_rate=schedule,
        weight_decay=1e-6,
        clip_norm=args.gradient_clip_val,
        params=params,
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
    elif args.ssl_method == "dino":
        lm = make_dino_step(model, precision=prec)
    elif args.ssl_method == "ibot":
        lm = make_ibot_step(model, precision=prec)
    else:
        lm = make_two_view_step(
            model, method=args.ssl_method, ema_teacher=use_ema, precision=prec
        )

    ckpt = CheckpointManager(
        args.checkpoint_dir,
        name=args.checkpoint_name or f"ssl2d_{args.ssl_method}",
        fold=0,
        metadata={
            "network_config": net_cfg,
            "ssl_method": args.ssl_method,
            "transform_arguments": {"target_size": list(size2d)},
        },
        monitor=args.monitor,
    )
    # fresh runs drop any stale best.json from a prior run
    ckpt.begin_run(resume=False)
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
    state, history = loop.fit(state, loader)
    logger.info(
        "done: %s", json.dumps(history[-1] if history else {}, default=float)
    )
