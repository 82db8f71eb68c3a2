"""
``adell classification_ensemble train``.

Parity target: adell_mri/entrypoints/classification_ensemble/train.py —
GenericEnsemble over several member configs (ensemble_config_file), shared
head over fused features (ensemble.py:15).
"""

import json

import jax
import numpy as np

from adell_mri_tpu.config.factories import get_classification_network
from adell_mri_tpu.config.parsing import parse_config_cat
from adell_mri_tpu.data import CachedVolumeDataset, DataLoader, Dataset, RandomSampler
from adell_mri_tpu.entrypoints.assemble_args import Parser
from adell_mri_tpu.entrypoints.segmentation.train import get_folds
from adell_mri_tpu.models.classification import GenericEnsemble
from adell_mri_tpu.models.classification.losses import binary_logistic_loss, cross_entropy_loss
from adell_mri_tpu.parallel.mesh import get_devices, mesh_for_batch
from adell_mri_tpu.train import (
    TrainState,
    cosine_annealing_with_warmup,
    get_optimizer,
    make_classification_step,
    make_eval_step,
    make_train_step,
)
from adell_mri_tpu.train.checkpoints import CheckpointManager
from adell_mri_tpu.train.logging_utils import MetricLogger
from adell_mri_tpu.train.loop import TrainLoop
from adell_mri_tpu.transforms import ClassificationTransforms
from adell_mri_tpu.utils import get_logger

logger = get_logger(__name__)

ARG_KEYS = [
    "dataset_json",
    "image_keys",
    ("label_keys", "label_keys", dict(nargs=None, default="label")),
    "possible_labels",
    "positive_labels",
    "label_groups",
    "config_files",
    "cache_rate",
    "cache_dir",
    "n_folds",
    "target_spacing",
    "pad_size",
    "dev",
    "seed",
    "max_epochs",
    "warmup_steps",
    "n_classes",
    "batch_size",
    "learning_rate",
    "checkpoint_dir",
    "checkpoint_name",
    "monitor",
    "metric_path",
    "classification_net_type",
]


def main(arguments):
    parser = Parser(prog="adell classification_ensemble train")
    parser.add_argument_by_key(ARG_KEYS)
    args = parser.parse_args(arguments)
    label_key = args.label_keys
    from adell_mri_tpu.entrypoints.cli_utils import (
        derive_n_classes,
        parse_label_groups,
    )

    # n_classes follows the label flags like the reference entrypoints
    n_classes = derive_n_classes(args)
    label_groups = parse_label_groups(args.label_groups)

    data = Dataset(args.dataset_json, seed=args.seed)
    data.apply_filters(presence_keys=list(args.image_keys) + [label_key])
    members = []
    member_cfgs = []
    batch_size, lr = 4, 1e-3
    for cf in args.config_files or []:
        config = parse_config_cat(cf)
        member_cfgs.append(config["network"])
        members.append(
            get_classification_network(
                args.classification_net_type,
                {**config["network"], "feature_extraction": True},
                n_classes=n_classes,
            )
        )
        batch_size = args.batch_size or config["training"].get("batch_size", 4)
        lr = args.learning_rate or config["training"].get("learning_rate", 1e-3)
    if not members:
        raise ValueError("--config_files required (one per ensemble member)")
    model = GenericEnsemble(networks=members, n_classes=n_classes)

    base_size = tuple(args.pad_size)
    transforms = ClassificationTransforms(
        image_keys=args.image_keys,
        label_key=label_key,
        target_spacing=args.target_spacing,
        target_size=base_size,
        positive_labels=(
            args.positive_labels
            if (args.positive_labels and n_classes == 2
                and args.possible_labels)
            else None
        ),
        possible_labels=(
            args.possible_labels
            if args.possible_labels and not args.positive_labels
            else None
        ),
        label_groups=label_groups,
    )
    from adell_mri_tpu.entrypoints.cli_utils import stratification_labels

    _pids = list(data.keys())
    folds = get_folds(
        _pids, args.n_folds, args.seed,
        labels=stratification_labels(
            data, _pids, label_key, args.n_folds, None
        ),
    )
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
    tx = get_optimizer("adamw", learning_rate=schedule, params=params)
    platform, devices = get_devices(args.dev)
    mesh = mesh_for_batch(batch_size, devices)
    with mesh:
        state = TrainState.create(model.apply, params, tx)
    loss_fn = (
        (lambda lg, y: cross_entropy_loss(lg, y))
        if n_classes > 2
        else binary_logistic_loss
    )
    ckpt = CheckpointManager(
        args.checkpoint_dir, name=args.checkpoint_name or "ensemble", fold=0,
        metadata={
            "n_members": len(members),
            "n_classes": n_classes,
            "net_type": args.classification_net_type,
            "member_configs": member_cfgs,
            "transform_arguments": {
                "image_keys": list(args.image_keys),
                "label_key": label_key,
                "target_spacing": args.target_spacing,
                "target_size": list(base_size),
                "positive_labels": (
                    list(transforms.positive_labels)
                    if transforms.positive_labels else None
                ),
                "possible_labels": (
                    list(transforms.possible_labels)
                    if transforms.possible_labels else None
                ),
                "label_groups": label_groups,
            },
        },
        monitor=args.monitor,
    )
    # fresh runs drop any stale best.json from a prior run
    ckpt.begin_run(resume=False)
    loop = TrainLoop(
        train_step=make_train_step(
            make_classification_step(model, loss_fn, n_classes, True)
        ),
        eval_step=make_eval_step(
            make_classification_step(model, loss_fn, n_classes, False)
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
