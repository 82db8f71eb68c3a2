"""
``adell classification_mil train``.

Parity target: adell_mri/entrypoints/classification_mil/train.py — 2D slice
encoders + MIL attention / transformer heads over the slice axis
(transformable-transformer.yaml surface). The reference loads frozen
torchscript slice modules; here the slice encoder is a VGG/CatNet feature
extractor trained jointly (module_paths accepted for checkpoint warm-start).
"""

import json

import flax.linen as nn
import jax
import numpy as np

from adell_mri_tpu.config.parsing import parse_config_2d_classifier_3d
from adell_mri_tpu.data import (
    CachedVolumeDataset,
    DataLoader,
    Dataset,
    RandomSampler,
)
from adell_mri_tpu.entrypoints.assemble_args import Parser
from adell_mri_tpu.entrypoints.segmentation.train import get_folds
from adell_mri_tpu.models.classification import (
    MultipleInstanceClassifier,
    TransformableTransformer,
    VGG,
)
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


class _SliceEncoder(nn.Module):
    first_depth: int = 16
    n_blocks: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        return VGG(
            first_depth=self.first_depth,
            n_blocks=self.n_blocks,
            norm_type="instance",
        )(x, train=train, return_features=True)


def build_mil_model(net_cfg, mil_method: str, n_classes: int):
    """Rebuilds the MIL model from checkpoint metadata (shared by train /
    test / predict so the parameter tree is identical)."""
    encoder = _SliceEncoder(
        first_depth=net_cfg.get("first_depth", 16),
        n_blocks=net_cfg.get("n_blocks", 3),
    )
    if mil_method == "transformer":
        return TransformableTransformer(
            module=encoder,
            n_classes=n_classes,
            embed_dim=net_cfg.get("embed_dim", 64),
            n_blocks=net_cfg.get("transformer_blocks", 2),
            n_heads=net_cfg.get("n_heads", 4),
        )
    return MultipleInstanceClassifier(
        module=encoder,
        n_classes=n_classes,
        attention_dim=net_cfg.get("attention_dim", 64),
    )


def main(arguments):
    parser = Parser(prog="adell classification_mil train")
    parser.add_argument_by_key(ARG_KEYS)
    parser.add_argument("--mil_method", default="standard",
                        choices=["standard", "transformer"])
    # reference workflow: MIL heads over FROZEN pre-trained 2D slice
    # encoders (ref entrypoints/classification_mil/train.py torchscript
    # module_paths) — here module_paths warm-starts the encoder subtree
    # and --freeze_module masks its gradients
    parser.add_argument("--module_paths", nargs="+", default=None,
                        help="checkpoint dir(s) to warm-start the slice "
                        "encoder ('module' subtree) from")
    parser.add_argument("--freeze_module", action="store_true",
                        help="freeze the slice encoder (train only the MIL "
                        "head — the reference's frozen-torchscript workflow)")
    args = parser.parse_args(arguments)

    data = Dataset(args.dataset_json, seed=args.seed)
    label_key = args.label_keys
    data.apply_filters(
        presence_keys=list(args.image_keys) + [label_key],
        possible_labels=args.possible_labels,
        label_keys=label_key if args.possible_labels else None,
    )
    config = parse_config_2d_classifier_3d(
        args.config_file, mil_method=args.mil_method
    ) if args.config_file else {"network": {}, "training": {}}
    net_cfg, train_cfg = config["network"], config["training"]
    batch_size = args.batch_size or train_cfg.get("batch_size", 4)
    lr = args.learning_rate or train_cfg.get("learning_rate", 1e-3)
    base_size = tuple(args.pad_size)

    from adell_mri_tpu.entrypoints.cli_utils import (
        derive_n_classes,
        parse_label_groups,
    )

    # n_classes follows the label flags like the reference
    # (classification_mil/train.py:150-159)
    n_classes = derive_n_classes(args)
    label_groups = parse_label_groups(args.label_groups)
    model = build_mil_model(net_cfg, args.mil_method, n_classes)

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
    if args.module_paths:
        import os

        from adell_mri_tpu.train.checkpoints import load_params_into

        for ck_path in args.module_paths:
            src = CheckpointManager(
                os.path.dirname(ck_path) or ".",
                name=os.path.basename(ck_path).replace("_fold0", ""),
                fold=0,
            )
            loaded = src.restore(src.best_step())
            if loaded is None:
                logger.warning("no checkpoint at %s", ck_path)
                continue
            src_params = loaded.get("params", loaded)
            # graft into the encoder subtree; matching leaves only
            params["module"], skipped = load_params_into(
                params["module"],
                src_params.get("module", src_params),
                exclude_patterns=[],
            )
            logger.info(
                "module warm-start from %s (%d leaves skipped)",
                ck_path, len(skipped),
            )
    schedule = cosine_annealing_with_warmup(
        lr, t_max=args.max_epochs * max(len(train_loader), 1),
        n_warmup_steps=args.warmup_steps,
    )
    tx = get_optimizer(args.optimizer, learning_rate=schedule, params=params)
    if args.freeze_module:
        from adell_mri_tpu.train.checkpoints import freeze_mask_by_regex
        from adell_mri_tpu.train.optim import freeze_wrap

        tx = freeze_wrap(
            tx, freeze_mask_by_regex(params, freeze_patterns=[r"^module"])
        )
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
        args.checkpoint_dir, name=args.checkpoint_name or "mil", fold=0,
        metadata={
            "network_config": net_cfg,
            "mil_method": args.mil_method,
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
            "n_classes": n_classes,
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
