"""
``adell segmentation train`` — the canonical train loop.

Parity target: adell_mri/entrypoints/segmentation/train.py:67 (call stack in
SURVEY.md §3.1): dataset JSON -> filters -> parse_config_unet -> K-fold ->
per-fold [spacing inference -> transforms -> cached dataset -> sampler ->
loaders -> network factory -> fit -> test] -> CSV metrics.

TPU differences: CacheDataset/DataLoader workers -> CachedVolumeDataset +
thread prefetch with ON-DEVICE augmentation inside the jit step; Lightning
DDP -> Mesh + sharded batches; ModelCheckpointWithMetadata -> orbax + JSON
metadata.
"""

import json
import os
from typing import List

import jax
import numpy as np

from adell_mri_tpu.config.factories import get_segmentation_network
from adell_mri_tpu.config.parsing import parse_config_unet
from adell_mri_tpu.data import (
    CachedVolumeDataset,
    DataLoader,
    Dataset,
    PartiallyRandomSampler,
    RandomSampler,
)
from adell_mri_tpu.entrypoints.assemble_args import Parser
from adell_mri_tpu.entrypoints.cli_utils import filter_training_pids
from adell_mri_tpu.parallel.mesh import get_devices, mesh_for_batch, shard_params
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
from adell_mri_tpu.transforms import AugmentPolicy, SegmentationTransforms
from adell_mri_tpu.transforms.host import (
    get_spacing_quantile,
    spacing_values_from_dataset_json,
)
from adell_mri_tpu.utils import get_logger

logger = get_logger(__name__)

ARG_KEYS = [
    "dataset_json",
    "image_keys",
    "mask_keys",
    "adc_keys",
    "skip_keys",
    "feature_keys",
    "filter_on_keys",
    "filter_is_optional",
    "possible_labels",
    "positive_labels",
    "excluded_ids",
    "excluded_ids_from_training_data",
    "cache_rate",
    "cache_dir",
    "subsample_size",
    "subsample_training_data",
    "val_from_train",
    "n_folds",
    "folds",
    "target_spacing",
    "pad_size",
    "crop_size",
    "resize_size",
    "random_crop_size",
    "config_file",
    "dev",
    "n_workers",
    "seed",
    "max_epochs",
    "warmup_steps",
    "start_decay",
    "n_classes",
    "augment",
    "dropout_param",
    "batch_size",
    "learning_rate",
    "lr_encoder",
    "loss_gamma",
    "loss_comb",
    "steps_per_epoch",
    "dataset_iterations_per_epoch",
    "samples_per_epoch",
    "validation_samples_per_epoch",
    "sliding_window_val",
    "optimizer",
    "precision",
    "accumulate_grad_batches",
    "check_nan_loss",
    "gradient_clip_val",
    "check_val_every_n_epoch",
    "early_stopping",
    "constant_ratio",
    "checkpoint_dir",
    "checkpoint_name",
    "resume_from_last",
    "monitor",
    "logger_type",
    "project_name",
    "summary_name",
    "summary_dir",
    "tracking_uri",
    "log_model",
    "delete_checkpoints",
    "metric_path",
    "segmentation_net_type",
    "bottleneck_classification",
    "deep_supervision",
    "picai_eval",
    "swa",
    "profile_dir",
    "semi_supervised",
    "semi_sl_weight",
    "missing_to_empty",
    "remat",
    "remat_policy",
    "checkpoint",
    "res_config_file",
    "encoder_checkpoint",
    "exclude_from_state_dict",
    "freeze_regex",
    "not_freeze_regex",
]


def get_folds(
    pids: List[str], n_folds: int, seed: int, explicit=None,
    val_fraction=None, labels=None,
):
    """K-fold split (parity: train.py:259-282). ``val_fraction`` sets the
    validation share for the single-fold path (ref --val_from_train).
    ``labels`` (one per pid) switches to StratifiedKFold — the reference's
    classification folds keep class balance per fold
    (classification/train.py:247)."""
    if explicit:
        from adell_mri_tpu.data import parse_ids

        nested = parse_ids(explicit, "nested_list")
        folds = []
        for val_ids in nested:
            val = [p for p in pids if p in set(val_ids)]
            train = [p for p in pids if p not in set(val_ids)]
            folds.append((train, val))
        return folds
    from sklearn.model_selection import KFold

    if n_folds <= 1:
        rng = np.random.default_rng(seed)
        pids_arr = np.asarray(pids)
        idx = rng.permutation(len(pids_arr))
        frac = 0.2 if val_fraction is None else val_fraction
        n_val = max(1, int(frac * len(pids_arr)))
        return [
            (
                pids_arr[idx[n_val:]].tolist(),
                pids_arr[idx[:n_val]].tolist(),
            )
        ]
    if val_fraction is not None:
        logger.warning(
            "--val_from_train only applies with --n_folds <= 1; "
            "k-fold validation splits are 1/n_folds"
        )
    pids_arr = np.asarray(pids)
    if labels is not None:
        from sklearn.model_selection import StratifiedKFold

        skf = StratifiedKFold(
            n_splits=n_folds, shuffle=True, random_state=seed
        )
        return [
            (pids_arr[tr].tolist(), pids_arr[va].tolist())
            for tr, va in skf.split(pids_arr, np.asarray(labels))
        ]
    kf = KFold(n_splits=n_folds, shuffle=True, random_state=seed)
    return [
        (pids_arr[tr].tolist(), pids_arr[va].tolist())
        for tr, va in kf.split(pids_arr)
    ]


def main(arguments):
    parser = Parser(prog="adell segmentation train")
    parser.add_argument_by_key(ARG_KEYS)
    args = parser.parse_args(arguments)

    data = Dataset(args.dataset_json, seed=args.seed)
    label_keys = args.mask_keys or []
    # with --missing_to_empty, absent modalities become zero tensors with
    # zero availability weights instead of dropping the case
    required_images = (
        list(args.image_keys)[:1] if args.missing_to_empty
        else list(args.image_keys)
    )
    presence = (
        required_images
        + list(label_keys)
        + list(args.skip_keys or [])
        + list(args.feature_keys or [])
    )
    data.apply_filters(
        presence_keys=presence,
        filter_on_keys=args.filter_on_keys,
        filter_is_optional=args.filter_is_optional,
    )
    if args.excluded_ids:
        data.subsample_dataset(excluded_key_list=args.excluded_ids)
    if args.subsample_size:
        data.subsample_dataset(subsample_size=args.subsample_size)
    if len(data) == 0:
        raise ValueError("no samples left after filtering")

    # possible_labels derives n_classes (parity: ref train.py:153-156)
    n_classes = args.n_classes
    if args.possible_labels:
        n = len(args.possible_labels)
        n_classes = 2 if n <= 2 else n
    config, loss_fn = parse_config_unet(
        args.config_file, n_keys=len(args.image_keys), n_classes=n_classes,
        loss_param_overrides={"gamma": args.loss_gamma, "lam": args.loss_comb},
    )
    net_cfg = config["network"]
    train_cfg = config["training"]
    batch_size = args.batch_size or train_cfg.get("batch_size", 2)
    learning_rate = args.learning_rate or train_cfg.get("learning_rate", 1e-3)
    weight_decay = train_cfg.get("weight_decay", 0.0)
    if args.dropout_param:
        net_cfg["dropout_param"] = args.dropout_param
    net_cfg["bottleneck_classification"] = args.bottleneck_classification
    net_cfg["deep_supervision"] = args.deep_supervision
    if args.res_config_file:
        # ResNet-encoder U-Net from an SSL backbone config (parity: ref
        # segmentation/train.py:659-719 — depth/kernels/strides derived
        # from the backbone structure; encoder lives under
        # encoder_backbone for drop-in SSL warm starts)
        if args.segmentation_net_type not in (None, "unet"):
            raise NotImplementedError(
                "--res_config_file applies to the unet net type "
                "(the reference rejects unetr/swin too)"
            )
        from adell_mri_tpu.config.parsing import load_yaml

        ssl_cfg = load_yaml(args.res_config_file)
        ba = ssl_cfg.get("backbone_args", ssl_cfg)
        structure = [tuple(s_) for s_ in ba["structure"]]
        mpl = ba.get("maxpool_structure", [2] * len(structure))
        net_cfg["encoder_structure"] = structure
        net_cfg["depth"] = [structure[0][0]] + [s_[0] for s_ in structure]
        net_cfg["kernel_sizes"] = [3] * len(net_cfg["depth"])
        net_cfg["strides"] = [2] + [
            tuple(m) if isinstance(m, (list, tuple)) else m for m in mpl
        ]
        net_cfg["res_type"] = ba.get("res_type", "resnet")
    skip_keys = list(args.skip_keys or [])
    feature_keys = list(args.feature_keys or [])
    if skip_keys:
        # skip images are not warped by the device augment: geometric
        # flags or random crops would desynchronize them from the image
        geo = {"affine", "shear", "flip", "distort", "trivial"}
        if geo & set(args.augment or []):
            raise ValueError(
                "--skip_keys composes with intensity-only augmentation; "
                "drop the geometric --augment flags"
            )
        if crop_tuple := (args.random_crop_size or args.crop_size):
            if tuple(crop_tuple) != tuple(
                args.pad_size or args.resize_size or crop_tuple
            ):
                raise ValueError(
                    "--skip_keys does not support device-side cropping "
                    "(the crop would not be applied to the skip image); "
                    "drop --random_crop_size/--crop_size"
                )
        net_cfg["skip_conditioning"] = len(skip_keys)
    if feature_keys:
        net_cfg["feature_conditioning"] = len(feature_keys)
        mat = np.asarray(
            [
                [float(data[k][fk]) for fk in feature_keys]
                for k in data.keys()
            ],
            np.float32,
        )
        net_cfg["feature_conditioning_params"] = {
            "mean": mat.mean(0).tolist(),
            "std": np.maximum(mat.std(0), 1e-6).tolist(),
        }

    # unlabeled stream for semi-supervised training: cases with images but
    # no masks (parity: CombinedLoader wiring, train.py:603-621)
    unlabeled_pids: List[str] = []
    if args.semi_supervised:
        net_cfg["semi_supervised"] = True
        all_data = Dataset(args.dataset_json, seed=args.seed)
        all_data.apply_filters(presence_keys=list(args.image_keys))
        labeled = set(data.keys())
        unlabeled_pids = [p for p in all_data.keys() if p not in labeled]
        logger.info(
            "semi-supervised: %d unlabeled cases", len(unlabeled_pids)
        )

    # target spacing: explicit, or inferred from headers (sitk_utils parity)
    target_spacing = args.target_spacing
    if target_spacing is None:
        spacings = spacing_values_from_dataset_json(
            data.dataset, args.image_keys[0], n=32
        )
        if spacings:
            target_spacing = get_spacing_quantile(spacings)
            logger.info("inferred target spacing: %s", target_spacing)

    base_size = args.pad_size or args.resize_size or args.crop_size
    crop_size = args.random_crop_size or args.crop_size
    if base_size is None:
        raise ValueError(
            "one of --pad_size/--resize_size/--crop_size is required "
            "(static shapes on TPU)"
        )
    # 2D networks train on mask-weighted random slices of the 3D volumes,
    # folded into the batch (parity: the reference's spatial_dimensions==2
    # branch — RandomSlices(n=8, base=0.05) + collate_last_slice,
    # entrypoints/segmentation/train.py:390-398; its crop branch is an
    # elif, so crops do not compose with 2D there either)
    spatial_dims = int(net_cfg.get("spatial_dimensions", 3))
    slices_2d = 8 if spatial_dims == 2 else None
    if spatial_dims == 2:
        if len(base_size) != 3:
            raise ValueError(
                "2D networks sample slices from 3D volumes: pass a 3D "
                "--pad_size/--resize_size (X Y Z)"
            )
        if skip_keys or feature_keys or args.semi_supervised:
            raise ValueError(
                "spatial_dimensions=2 does not compose with skip/feature "
                "conditioning or --semi_supervised"
            )
        if args.picai_eval:
            raise ValueError(
                "--picai_eval is a 3D lesion metric; drop it for "
                "spatial_dimensions=2 training"
            )
        if crop_size and tuple(crop_size) != tuple(base_size):
            logger.warning(
                "spatial_dimensions=2 ignores random crops (the reference "
                "does too); training on full-size slices"
            )
        crop_size = None

    platform, devices = get_devices(args.dev)
    mesh = mesh_for_batch(batch_size, devices)
    logger.info("platform=%s mesh=%s", platform, dict(mesh.shape))

    all_pids = list(data.keys())
    folds = get_folds(
        all_pids, args.n_folds, args.seed, args.folds,
        val_fraction=args.val_from_train,
    )
    csv_logger = MetricLogger(
        logger_type=args.logger_type,
        project_name=args.project_name,
        run_name=args.summary_name,
        csv_path=args.metric_path,
        summary_dir=args.summary_dir,
        tracking_uri=args.tracking_uri,
        log_model=args.log_model,
    )

    for fold_idx, (train_pids, val_pids) in enumerate(folds):
        train_pids = filter_training_pids(
            train_pids,
            excluded=args.excluded_ids_from_training_data,
            subsample_fraction=args.subsample_training_data,
            seed=args.seed,
            fold_idx=fold_idx,
        )
        logger.info(
            "fold %d: %d train / %d val", fold_idx, len(train_pids), len(val_pids)
        )
        transforms = SegmentationTransforms(
            image_keys=args.image_keys,
            label_keys=label_keys,
            target_spacing=target_spacing,
            target_size=base_size,
            resize_size=args.resize_size,
            crop_size=crop_size if crop_size != base_size else None,
            adc_keys=args.adc_keys or (),
            positive_labels=[int(x) for x in (args.positive_labels or [1])],
            # reference seg training: RandAffined is rotate-only (no
            # scale; transform_factory/augmentations.py:100-107 — the
            # [0.1, 0.1, 0.05] scale_range belongs to the CLASS factory,
            # :295) and flips run over all three axes
            # (entrypoints/segmentation/train.py:354 flip_axis=[0,1,2])
            augmentations=AugmentPolicy.from_flags(
                args.augment, scale_range=0.0, flip_axes=(0, 1, 2)
            ),
            missing_to_empty=bool(args.missing_to_empty),
            skip_keys=skip_keys,
            feature_keys=feature_keys,
            slices_2d=slices_2d,
        )
        load_fn = transforms.load_fn()
        train_list = data.to_datalist(train_pids)
        val_list = data.to_datalist(val_pids)
        train_ds = CachedVolumeDataset(
            train_list, load_fn, cache_rate=args.cache_rate,
            cache_dir=args.cache_dir,
            cache_fingerprint=repr(transforms),
        )
        val_ds = CachedVolumeDataset(
            val_list, load_fn, cache_rate=args.cache_rate,
            cache_dir=args.cache_dir,
            cache_fingerprint=repr(transforms),
        )
        if args.constant_ratio is not None:
            labels = [
                int(any(np.asarray(e.get(k, 0)).max() > 0 for k in label_keys))
                if not isinstance(e.get(label_keys[0], None), str)
                else 1
                for e in train_list
            ]
            sampler = PartiallyRandomSampler(
                labels, non_keep_ratio=args.constant_ratio, seed=args.seed
            )
        else:
            sampler = RandomSampler(len(train_ds), seed=args.seed)
        # epoch sizing (parity: ref train.py:487-505 —
        # samples_per_epoch wins over dataset_iterations_per_epoch)
        if args.samples_per_epoch is not None:
            sampler.set_n_samples(args.samples_per_epoch)
        elif (args.dataset_iterations_per_epoch or 1.0) != 1.0:
            sampler.set_n_samples(
                max(1, int(len(train_ds) * args.dataset_iterations_per_epoch))
            )
        train_loader = DataLoader(
            train_ds, sampler=sampler, batch_size=batch_size, drop_last=True,
            prefetch=max(args.n_workers, 2),
        )
        if args.semi_supervised and unlabeled_pids:
            from adell_mri_tpu.train.semi_sl_steps import CombinedLoader
            from adell_mri_tpu.transforms.pipeline import make_load_fn

            un_load_fn = make_load_fn(
                image_keys=args.image_keys,
                label_keys=None,
                target_spacing=target_spacing,
                target_size=crop_size or base_size,
            )
            un_ds = CachedVolumeDataset(
                all_data.to_datalist(unlabeled_pids),
                un_load_fn,
                cache_rate=args.cache_rate,
                cache_dir=args.cache_dir,
                cache_fingerprint=repr(
                    (sorted(args.image_keys), target_spacing,
                     crop_size or base_size)
                ),
            )
            un_loader = DataLoader(
                un_ds,
                sampler=RandomSampler(len(un_ds), seed=args.seed + 1),
                batch_size=batch_size,
                drop_last=True,
                prefetch=1,
            )
            train_loader = CombinedLoader(train_loader, un_loader)
        val_sampler = None
        val_epoch_len = len(val_ds)
        if args.validation_samples_per_epoch is not None:
            val_sampler = RandomSampler(
                len(val_ds), seed=args.seed + 7,
                n_samples=args.validation_samples_per_epoch,
            )
            # cap the batch by the SAMPLER length too — drop_last with a
            # sampler shorter than the batch would yield zero val batches
            val_epoch_len = args.validation_samples_per_epoch
        val_loader = DataLoader(
            val_ds,
            sampler=val_sampler,
            batch_size=max(1, min(batch_size, val_epoch_len)),
            drop_last=True,
            prefetch=1,
        )

        model = get_segmentation_network(
            args.segmentation_net_type,
            net_cfg,
            n_classes=n_classes,
            # brunet: one branch per input modality
            n_input_branches=len(args.image_keys),
        )
        example_shape = tuple(crop_size or base_size)
        if spatial_dims == 2:
            example_shape = example_shape[:2]
        x0 = np.zeros(
            (1,) + example_shape + (len(args.image_keys),), np.float32
        )
        init_kwargs = {}
        if skip_keys:
            init_kwargs["x_skip_layer"] = np.zeros(
                (1,) + example_shape + (len(skip_keys),), np.float32
            )
        if feature_keys:
            init_kwargs["x_feature_conditioning"] = np.zeros(
                (1, len(feature_keys)), np.float32
            )
        init_vars = model.init(
            {"params": jax.random.PRNGKey(args.seed)}, x0, **init_kwargs
        )
        params = init_vars["params"]
        # mutable collections (batch_stats for norm_type="batch"): carried
        # in the train state, updated every step, checkpointed, and
        # restored by test/predict (torch BatchNorm inference parity,
        # adn_fn.py:205)
        model_vars = {
            k: v for k, v in init_vars.items() if k == "batch_stats"
        } or None
        # warm start: load matching leaves from stored checkpoints (incl.
        # SSL-encoder grafting via path-rename regexes; parity:
        # load_checkpoint_to_model torch_utils.py:16 + train.py:659-719)
        if args.checkpoint:
            from adell_mri_tpu.train.checkpoints import load_params_into

            for ck_path in args.checkpoint:
                src = CheckpointManager(
                    os.path.dirname(ck_path) or ".",
                    name=os.path.basename(ck_path).replace("_fold0", ""),
                    fold=0,
                )
                loaded = src.restore(src.best_step())
                if loaded is None:
                    logger.warning("no checkpoint at %s", ck_path)
                    continue
                params, skipped = load_params_into(
                    params,
                    loaded.get("params", loaded),
                    exclude_patterns=args.exclude_from_state_dict or (),
                )
                logger.info(
                    "warm start from %s (%d paths skipped)",
                    ck_path,
                    len(skipped),
                )
        if args.encoder_checkpoint:
            from adell_mri_tpu.train.checkpoints import load_params_into

            if "encoder_structure" not in net_cfg:
                raise ValueError(
                    "--encoder_checkpoint needs a ResNet encoder: pass "
                    "--res_config_file (or encoder_structure in the "
                    "network YAML)"
                )
            for ck_path in args.encoder_checkpoint:
                if ck_path.endswith((".pt", ".pth", ".ckpt")):
                    # reference torch/Lightning SSL checkpoint -> mapped
                    # straight onto the encoder_backbone subtree; the
                    # backbone may be nested under any module path
                    # (backbone. / res_net.backbone. / ...)
                    from adell_mri_tpu.interop import (
                        detect_backbone_prefix,
                        import_reference_resnet_backbone,
                        load_reference_state_dict,
                    )

                    sd = load_reference_state_dict(ck_path)
                    enc = import_reference_resnet_backbone(
                        sd,
                        structure=net_cfg["encoder_structure"],
                        norm_type=net_cfg.get("norm_type", "instance"),
                        activation_fn=net_cfg.get(
                            "activation_fn", "swish"
                        ),
                        torch_prefix=detect_backbone_prefix(sd),
                        strict=False,
                    )
                    src_params = {"encoder_backbone": enc["params"]}
                else:
                    src = CheckpointManager(
                        os.path.dirname(ck_path) or ".",
                        name=os.path.basename(ck_path).replace(
                            "_fold0", ""
                        ),
                        fold=0,
                    )
                    loaded = src.restore(src.best_step())
                    if loaded is None:
                        logger.warning(
                            "no encoder checkpoint at %s", ck_path
                        )
                        continue
                    lp = loaded.get("params", loaded)
                    # ENCODER-only warm start: never touch decoder/head
                    # paths even when the source is a full UNet run
                    src_params = {
                        "encoder_backbone": lp.get(
                            "encoder_backbone",
                            lp.get("ResNetBackbone_0", lp),
                        )
                    }
                params, skipped = load_params_into(params, src_params)
                n_loaded = len(jax.tree.leaves(src_params)) - len(skipped)
                if n_loaded == 0:
                    raise ValueError(
                        f"encoder warm start from {ck_path} matched NO "
                        "parameters — wrong structure for this encoder?"
                    )
                logger.info(
                    "encoder warm start from %s (%d loaded, %d skipped)",
                    ck_path,
                    n_loaded,
                    len(skipped),
                )
        steps_per_epoch = max(len(train_loader), 1)
        if args.steps_per_epoch:
            steps_per_epoch = min(steps_per_epoch, args.steps_per_epoch)
        # optax.MultiSteps advances the schedule once per OPTIMIZER step,
        # not per micro-batch — scale t_max/warmup accordingly
        sched_steps = max(
            1, steps_per_epoch // max(1, args.accumulate_grad_batches)
        )
        schedule = cosine_annealing_with_warmup(
            learning_rate,
            t_max=args.max_epochs * sched_steps,
            n_warmup_steps=args.warmup_steps * sched_steps
            if args.warmup_steps >= 1
            else args.warmup_steps,
            start_decay=args.start_decay,
        )
        tx = get_optimizer(
            args.optimizer,
            learning_rate=schedule,
            weight_decay=weight_decay,
            clip_norm=args.gradient_clip_val,
            params=params,
        )
        if args.lr_encoder is not None and learning_rate > 0:
            # encoder-LR split (parity: segmentation/pl.py:526-564 —
            # encoder params matched by name get their own learning rate)
            import optax

            from adell_mri_tpu.train.optim import lr_scale_by_regex

            tx = optax.chain(
                tx,
                lr_scale_by_regex(
                    params, {r"^(enc_|encoder_backbone)": args.lr_encoder / learning_rate}
                ),
            )
        if args.freeze_regex or args.not_freeze_regex:
            from adell_mri_tpu.train.checkpoints import freeze_mask_by_regex
            from adell_mri_tpu.train.optim import freeze_wrap

            mask = freeze_mask_by_regex(
                params,
                freeze_patterns=args.freeze_regex or (),
                not_freeze_patterns=args.not_freeze_regex or (),
            )
            tx = freeze_wrap(tx, mask)
        if args.accumulate_grad_batches > 1:
            from adell_mri_tpu.train.optim import accumulate_gradients

            tx = accumulate_gradients(tx, args.accumulate_grad_batches)
        with mesh:
            params = shard_params(params, mesh)
            if model_vars is not None:
                model_vars = shard_params(model_vars, mesh)
            state = TrainState.create(
                model.apply,
                params,
                tx,
                variables=model_vars,
                with_ema=args.swa or args.semi_supervised,
                ema_mode="swa" if args.swa else "ema",
                # SWA averages over the last quarter of training; uses the
                # --steps_per_epoch-capped count (state.step counts every
                # micro-batch, so this stays in micro-steps)
                swa_start_step=int(
                    0.75 * args.max_epochs * steps_per_epoch
                ),
            )

        ckpt = CheckpointManager(
            args.checkpoint_dir,
            name=args.checkpoint_name or "segmentation",
            fold=fold_idx,
            metadata={
                "network_config": net_cfg,
                "transform_arguments": {
                    "image_keys": list(args.image_keys),
                    "skip_keys": skip_keys,
                    "feature_keys": feature_keys,
                    "label_keys": list(label_keys),
                    "target_spacing": target_spacing,
                    "target_size": list(base_size),
                    "resize_size": (
                        list(args.resize_size) if args.resize_size else None
                    ),
                    "crop_size": list(crop_size) if crop_size else None,
                    # serve-time rebuilds need the SAME intensity and
                    # label semantics: ADC keys rescale by the ADC
                    # factor at load, positive_labels binarize the mask
                    # (an unrescaled ADC input / default-binarized label
                    # silently shifted test metrics)
                    "adc_keys": list(args.adc_keys or ()),
                    "positive_labels": [
                        int(x) for x in (args.positive_labels or [1])
                    ],
                },
                "train_pids": train_pids,
                "val_pids": val_pids,
                "n_classes": n_classes,
                "net_type": args.segmentation_net_type,
            },
            monitor=args.monitor,
            mode="min" if "loss" in args.monitor else "max",
        )
        # fresh runs drop any stale best.json from a prior run
        ckpt.begin_run(resume=bool(args.resume_from_last))
        if args.resume_from_last and ckpt.status(args.max_epochs) == "finished":
            logger.info("fold %d already finished; skipping", fold_idx)
            continue

        deep_supervision = args.deep_supervision
        train_lm = make_segmentation_step(
            model,
            loss_fn,
            deep_supervision=deep_supervision,
            bottleneck_classification=args.bottleneck_classification,
            n_classes=n_classes,
            train=True,
            remat=args.remat,
            precision=args.precision,
            remat_policy=getattr(args, "remat_policy", None),
        )
        eval_lm = make_segmentation_step(
            model,
            loss_fn,
            deep_supervision=deep_supervision,
            bottleneck_classification=args.bottleneck_classification,
            n_classes=n_classes,
            train=False,
            precision=args.precision,
        )
        if args.semi_supervised and unlabeled_pids:
            from adell_mri_tpu.train.semi_sl_steps import (
                make_semi_sl_train_step,
                make_semi_supervised_step,
            )

            semi_lm = make_semi_supervised_step(
                model, train_lm, ssl_weight=args.semi_sl_weight
            )
            train_step = make_semi_sl_train_step(semi_lm)
        else:
            train_step = make_train_step(train_lm)
        eval_step = make_eval_step(eval_lm)
        if spatial_dims == 2:
            import jax.numpy as jnp

            # validation volumes are 3D: fold EVERY slice into the batch
            # (SlicesToFirst + collate_last_slice at val, reference
            # train.py:394-398) and run the 2D net on all of them
            base_eval = eval_step

            def _eval_2d(params, batch, rng):
                b2 = dict(batch)
                img, lab = batch["image"], batch["label"]
                if lab.ndim == img.ndim:  # trailing singleton label chan
                    lab = lab[..., 0]
                b2["image"] = jnp.moveaxis(img, -2, 1).reshape(
                    (-1,) + img.shape[1:-2] + (img.shape[-1],)
                )
                b2["label"] = jnp.moveaxis(lab, -1, 1).reshape(
                    (-1,) + lab.shape[1:-1]
                )
                return base_eval(params, b2, rng)

            eval_step = jax.jit(_eval_2d)
        if (
            args.sliding_window_val
            and crop_size
            and tuple(crop_size) != tuple(base_size)
        ):
            # validate whole volumes stitched from overlap-averaged
            # crop-size windows — the geometry the model trained on
            # (parity: ref --sliding_window_val, seg train.py:373)
            import jax.numpy as jnp

            from adell_mri_tpu.inference.sliding_window import (
                sliding_window_inference,
            )

            def _sw_eval_step(params, batch, rng):
                feats = batch.get("features")

                def stitch(vol, feat=None):
                    def fwd(tiles):
                        kw = {}
                        if feat is not None:
                            # the conditioned network must also condition
                            # at validation (FiLM over every window)
                            kw["x_feature_conditioning"] = jnp.tile(
                                feat[None], (tiles.shape[0], 1)
                            )
                        out = model.apply(
                            {"params": params}, tiles, train=False, **kw
                        )
                        return out[0]

                    return sliding_window_inference(
                        fwd, vol, tuple(crop_size)
                    )

                if feats is None:
                    pred = jax.vmap(stitch)(batch["image"])
                else:
                    pred = jax.vmap(stitch)(batch["image"], feats)
                y = jnp.round(batch["label"].astype(jnp.float32))
                loss, individual = loss_fn(pred, y)
                p = pred[..., 0] if pred.shape[-1] == 1 else pred
                yb = y[..., 0] if y.ndim == p.ndim + 1 else y
                if n_classes <= 2:
                    inter = jnp.sum(p * yb)
                    denom = jnp.sum(p) + jnp.sum(yb)
                    dice = (2 * inter + 1e-5) / (denom + 1e-5)
                else:
                    oh = jax.nn.one_hot(yb.astype(jnp.int32), n_classes)
                    ax = tuple(range(p.ndim - 1))
                    inter = jnp.sum(p * oh, axis=ax)
                    denom = jnp.sum(p, axis=ax) + jnp.sum(oh, axis=ax)
                    dice = jnp.mean((2 * inter + 1e-5) / (denom + 1e-5))
                return {
                    "loss": loss,
                    "dice": dice,
                    **{f"loss_{k}": v for k, v in individual.items()},
                }

            eval_step = jax.jit(_sw_eval_step)
        nan_guard = None
        if args.check_nan_loss:
            from adell_mri_tpu.train.nan_guard import NaNGuard

            nan_guard = NaNGuard(dump_dir=args.checkpoint_dir or ".")
        callbacks = []
        if args.picai_eval:
            from adell_mri_tpu.eval.callbacks import LesionEvalCallback

            # lesion-level V_AP/V_AUC/V_score every validation epoch
            # (parity: segmentation/pl.py:604-626)
            callbacks.append(
                # the DERIVED n_classes (from --possible_labels), like
                # every other consumer in this function
                LesionEvalCallback(model, n_classes=n_classes)
            )
        loop = TrainLoop(
            train_step=train_step,
            eval_step=eval_step,
            augment_fn=transforms.augment,
            mesh=mesh,
            max_epochs=args.max_epochs,
            check_val_every_n_epoch=args.check_val_every_n_epoch,
            early_stopping=args.early_stopping,
            monitor=args.monitor,
            mode="min" if "loss" in args.monitor else "max",
            ckpt_manager=ckpt,
            metric_logger=csv_logger,
            seed=args.seed + fold_idx,
            eval_on_ema=args.swa,
            nan_guard=nan_guard,
            callbacks=callbacks,
            profile_dir=args.profile_dir,
            steps_per_epoch=args.steps_per_epoch,
        )
        start_epoch = 0
        if args.resume_from_last:
            # status()=='finished' was handled above; anything saved here
            # is an interrupted run — restore and continue (previously the
            # flag only skipped finished folds and silently RESTARTED
            # interrupted ones from scratch)
            state, start_epoch = ckpt.resume(state)
            if start_epoch:
                logger.info(
                    "fold %d: resuming from epoch %d", fold_idx, start_epoch
                )
        state, history = loop.fit(
            state, train_loader, val_loader, start_epoch=start_epoch
        )
        final = history[-1] if history else {}
        csv_logger.log_metrics(
            {k: v for k, v in final.items()}, step=args.max_epochs,
            fold=fold_idx, phase="final",
        )
        if args.log_model:
            csv_logger.log_artifact(ckpt.dir)
        if args.delete_checkpoints:
            # keep metrics + metadata, drop the weight payloads
            # (parity: ref --delete_checkpoints)
            ckpt.delete_steps()
        logger.info("fold %d done: %s", fold_idx, json.dumps(final, default=float))
