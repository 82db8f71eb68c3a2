"""
``adell segmentation_from_2d_module train``.

Parity target: adell_mri/entrypoints/segmentation_from_2d_module/train.py —
MIMUNet: a 2D U-Net applied slice-wise over the volume (mimunet.py:51).
"""

import json

import jax
import numpy as np

from adell_mri_tpu.config.parsing import parse_config_unet
from adell_mri_tpu.data import CachedVolumeDataset, DataLoader, Dataset, RandomSampler
from adell_mri_tpu.entrypoints.assemble_args import Parser
from adell_mri_tpu.entrypoints.segmentation.train import get_folds
from adell_mri_tpu.models.segmentation.ahnet import MIMUNet
from adell_mri_tpu.models.segmentation.unet import UNet
from adell_mri_tpu.parallel.mesh import get_devices, mesh_for_batch
from adell_mri_tpu.train import (
    TrainState,
    cosine_annealing_with_warmup,
    get_optimizer,
    make_eval_step,
    make_segmentation_step,
    make_train_step,
)
from adell_mri_tpu.train.checkpoints import CheckpointManager
from adell_mri_tpu.train.logging_utils import MetricLogger
from adell_mri_tpu.train.loop import TrainLoop
from adell_mri_tpu.transforms import SegmentationTransforms
from adell_mri_tpu.utils import get_logger

logger = get_logger(__name__)

ARG_KEYS = [
    "dataset_json",
    "image_keys",
    "mask_keys",
    "cache_rate",
    "cache_dir",
    "n_folds",
    "target_spacing",
    "pad_size",
    "config_file",
    "dev",
    "seed",
    "max_epochs",
    "warmup_steps",
    "n_classes",
    "batch_size",
    "learning_rate",
    "optimizer",
    "checkpoint_dir",
    "checkpoint_name",
    "monitor",
    "metric_path",
]


def main(arguments):
    parser = Parser(prog="adell segmentation_from_2d_module train")
    parser.add_argument_by_key(ARG_KEYS)
    args = parser.parse_args(arguments)

    data = Dataset(args.dataset_json, seed=args.seed)
    data.apply_filters(
        presence_keys=list(args.image_keys) + list(args.mask_keys or [])
    )
    config, loss_fn = parse_config_unet(
        args.config_file, n_keys=len(args.image_keys), n_classes=args.n_classes
    )
    net_cfg, train_cfg = config["network"], config["training"]
    batch_size = args.batch_size or train_cfg.get("batch_size", 2)
    lr = args.learning_rate or train_cfg.get("learning_rate", 1e-3)
    base_size = tuple(args.pad_size)

    import flax.linen as nn

    n_classes = args.n_classes

    class Slice2D(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            unet2d = UNet(
                spatial_dimensions=2,
                conv_type=net_cfg.get("conv_type", "regular"),
                norm_type=net_cfg.get("norm_type", "instance"),
                activation_fn=net_cfg.get("activation_fn", "swish"),
                dropout_param=net_cfg.get("dropout_param", 0.0),
                n_classes=n_classes,
                depth=tuple(net_cfg.get("depth", (16, 32, 64))),
                kernel_sizes=tuple(net_cfg.get("kernel_sizes", (3, 3, 3))),
                strides=tuple(net_cfg.get("strides", (2, 2, 2))),
            )
            return unet2d(x, train=train)[0]

    model = MIMUNet(module_2d=Slice2D(), n_classes=args.n_classes)

    transforms = SegmentationTransforms(
        image_keys=args.image_keys,
        label_keys=args.mask_keys,
        target_spacing=args.target_spacing,
        target_size=base_size,
    )
    folds = get_folds(list(data.keys()), args.n_folds, args.seed)
    train_pids, val_pids = folds[0]
    load_fn = transforms.load_fn()
    train_ds = CachedVolumeDataset(
        data.to_datalist(train_pids), load_fn, cache_rate=args.cache_rate,
        cache_dir=args.cache_dir,
        cache_fingerprint=repr(transforms),
    )
    val_ds = CachedVolumeDataset(
        data.to_datalist(val_pids), load_fn, cache_rate=args.cache_rate,
        cache_dir=args.cache_dir,
        cache_fingerprint=repr(transforms),
    )
    train_loader = DataLoader(
        train_ds, sampler=RandomSampler(len(train_ds), seed=args.seed),
        batch_size=batch_size, drop_last=True,
    )
    val_loader = DataLoader(
        val_ds, batch_size=max(1, min(batch_size, len(val_ds))), drop_last=True
    )

    x0 = np.zeros((1,) + base_size + (len(args.image_keys),), np.float32)
    params = model.init({"params": jax.random.PRNGKey(args.seed)}, x0)["params"]
    schedule = cosine_annealing_with_warmup(
        lr, t_max=args.max_epochs * max(len(train_loader), 1),
        n_warmup_steps=args.warmup_steps,
    )
    tx = get_optimizer(args.optimizer, learning_rate=schedule, params=params)
    platform, devices = get_devices(args.dev)
    mesh = mesh_for_batch(batch_size, devices)
    with mesh:
        state = TrainState.create(model.apply, params, tx)
    ckpt = CheckpointManager(
        args.checkpoint_dir, name=args.checkpoint_name or "mimunet", fold=0,
        metadata={
            "network_config": net_cfg,
            "transform_arguments": {
                "image_keys": list(args.image_keys),
                "label_keys": list(args.mask_keys or []),
                "target_size": list(base_size),
            },
            "n_classes": args.n_classes,
        },
        monitor=args.monitor,
    )
    # fresh runs drop any stale best.json from a prior run
    ckpt.begin_run(resume=False)
    loop = TrainLoop(
        train_step=make_train_step(
            make_segmentation_step(model, loss_fn, n_classes=args.n_classes, train=True)
        ),
        eval_step=make_eval_step(
            make_segmentation_step(model, loss_fn, n_classes=args.n_classes, train=False)
        ),
        mesh=mesh,
        max_epochs=args.max_epochs,
        ckpt_manager=ckpt,
        metric_logger=MetricLogger(csv_path=args.metric_path),
        monitor=args.monitor,
        seed=args.seed,
    )
    state, history = loop.fit(state, train_loader, val_loader)
    logger.info("done: %s", json.dumps(history[-1] if history else {}, default=float))
