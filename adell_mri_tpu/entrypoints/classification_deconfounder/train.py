"""
``adell classification_deconfounder train``.

Parity target: adell_mri/entrypoints/classification_deconfounder/train.py —
DeconfoundedNet: classification + categorical/continuous confound surrogate
heads + feature-decorrelation penalty
(deconfounded_classification.py:141).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import optax

from adell_mri_tpu.config.parsing import parse_config_cat
from adell_mri_tpu.data import CachedVolumeDataset, DataLoader, Dataset, RandomSampler
from adell_mri_tpu.entrypoints.assemble_args import Parser
from adell_mri_tpu.entrypoints.segmentation.train import get_folds
from adell_mri_tpu.models.classification import CatNet, DeconfoundedNet
from adell_mri_tpu.models.classification.losses import binary_logistic_loss
from adell_mri_tpu.parallel.mesh import get_devices, mesh_for_batch
from adell_mri_tpu.train import (
    TrainState,
    cosine_annealing_with_warmup,
    get_optimizer,
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
    "checkpoint_dir",
    "checkpoint_name",
    "monitor",
    "metric_path",
]


def build_deconfounder_model(
    net_cfg, cat_cards, n_cont, n_classes, n_features=32
):
    """Rebuilds the DeconfoundedNet from checkpoint metadata (shared by
    train / test / predict so the parameter tree is identical)."""
    backbone = CatNet(
        spatial_dimensions=net_cfg.get("spatial_dimensions", 3),
        resnet_structure=[
            tuple(s) for s in net_cfg.get("resnet_structure", [(16, 16, 3, 1)])
        ],
        norm_type=net_cfg.get("norm_type", "instance"),
        feature_extraction=True,
    )
    return DeconfoundedNet(
        backbone=backbone,
        n_classes=n_classes,
        n_features_deconfounder=n_features,
        n_cat_deconfounder=list(cat_cards),
        n_cont_deconfounder=n_cont,
    )


def main(arguments):
    parser = Parser(prog="adell classification_deconfounder train")
    parser.add_argument_by_key(ARG_KEYS)
    parser.add_argument("--cat_confounder_keys", nargs="+", default=[])
    parser.add_argument("--cont_confounder_keys", nargs="+", default=[])
    parser.add_argument("--deconfounder_weight", type=float, default=1.0)
    # parity: assemble_args.py:797 n_features_deconfounder (same default)
    parser.add_argument("--n_features_deconfounder", type=int, default=64,
                        help="width of the confound surrogate projection")
    args = parser.parse_args(arguments)
    label_key = args.label_keys

    data = Dataset(args.dataset_json, seed=args.seed)
    presence = (
        list(args.image_keys)
        + [label_key]
        + list(args.cat_confounder_keys)
        + list(args.cont_confounder_keys)
    )
    data.apply_filters(presence_keys=presence)

    config = parse_config_cat(args.config_file)
    net_cfg, train_cfg = config["network"], config["training"]
    batch_size = args.batch_size or train_cfg.get("batch_size", 4)
    lr = args.learning_rate or train_cfg.get("learning_rate", 1e-3)
    base_size = tuple(args.pad_size)

    # categorical confounder cardinalities from the data
    cat_cards = []
    cat_maps = []
    for key in args.cat_confounder_keys:
        values = sorted({str(data[k][key]) for k in data})
        cat_maps.append({v: i for i, v in enumerate(values)})
        cat_cards.append(len(values))

    from adell_mri_tpu.entrypoints.cli_utils import (
        derive_n_classes,
        parse_label_groups,
    )

    # n_classes follows the label flags like the reference
    # (classification_deconfounder/train.py:181-191)
    n_classes = derive_n_classes(args)
    label_groups = parse_label_groups(args.label_groups)
    model = build_deconfounder_model(
        net_cfg,
        cat_cards,
        len(args.cont_confounder_keys),
        n_classes,
        n_features=args.n_features_deconfounder,
    )

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
    base_load = transforms.load_fn()

    def load_fn(entry):
        s = base_load(entry)
        for i, key in enumerate(args.cat_confounder_keys):
            s[f"cat_conf_{i}"] = np.int32(cat_maps[i][str(entry[key])])
        if args.cont_confounder_keys:
            s["cont_conf"] = np.asarray(
                [float(entry[k]) for k in args.cont_confounder_keys],
                np.float32,
            )
        return s

    from adell_mri_tpu.entrypoints.cli_utils import stratification_labels

    _pids = list(data.keys())
    folds = get_folds(
        _pids, args.n_folds, args.seed,
        labels=stratification_labels(
            data, _pids, label_key, args.n_folds, None
        ),
    )
    train_pids, val_pids = folds[0]
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

    def make_lm(train):
        def lm(params, batch, rng):
            rngs = {"dropout": rng} if train else None
            logits, cat_preds, cont_pred, penalty = model.apply(
                {"params": params}, batch["image"], train=train, rngs=rngs
            )
            if n_classes > 2:
                # softmax CE — binary_logistic_loss only trains the
                # class-0 logit and test.py softmaxes all n_classes
                from adell_mri_tpu.models.classification.losses import (
                    cross_entropy_loss,
                )

                loss = cross_entropy_loss(logits, batch["label"])
            else:
                loss = binary_logistic_loss(logits, batch["label"])
            for i in range(len(cat_cards)):
                oh = jax.nn.one_hot(batch[f"cat_conf_{i}"], cat_cards[i])
                loss = loss + jnp.mean(
                    optax.softmax_cross_entropy(cat_preds[i], oh)
                )
            if cont_pred is not None:
                loss = loss + jnp.mean(
                    (cont_pred - batch["cont_conf"]) ** 2
                )
            loss = loss + args.deconfounder_weight * penalty
            return loss, {"loss": loss, "decorrelation": penalty}

        return lm

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
    ckpt = CheckpointManager(
        args.checkpoint_dir, name=args.checkpoint_name or "deconfounder",
        fold=0,
        metadata={
            "network_config": net_cfg,
            "cat_confounder_keys": list(args.cat_confounder_keys),
            "cont_confounder_keys": list(args.cont_confounder_keys),
            # cardinalities rebuild the surrogate heads at test/predict
            # without re-scanning the training dataset
            "cat_confounder_cards": list(cat_cards),
            "n_classes": n_classes,
            "n_features_deconfounder": args.n_features_deconfounder,
            "transform_arguments": {
                "image_keys": list(args.image_keys),
                "label_key": label_key,
                "target_size": list(base_size),
                "target_spacing": (
                    list(args.target_spacing) if args.target_spacing else None
                ),
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
        train_step=make_train_step(make_lm(True)),
        eval_step=make_eval_step(make_lm(False)),
        mesh=mesh,
        max_epochs=args.max_epochs,
        ckpt_manager=ckpt,
        metric_logger=MetricLogger(csv_path=args.metric_path),
        monitor=args.monitor,
        seed=args.seed,
    )
    state, history = loop.fit(state, train_loader, val_loader)
    logger.info("done: %s", json.dumps(history[-1] if history else {}, default=float))
