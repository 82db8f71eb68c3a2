"""
``adell classification train``.

Parity target: adell_mri/entrypoints/classification/train.py:43 (SURVEY.md
§3.2): Dataset -> ClassificationTransforms + augmentations -> cached dataset
-> class-weighted sampling -> parse_config_cat -> get_classification_network
(HybridClassifier wrap when clinical features present) -> fit with on-device
mixup/label smoothing -> CSV metrics.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from adell_mri_tpu.config.factories import get_classification_network
from adell_mri_tpu.config.parsing import parse_config_cat, parse_config_unet
from adell_mri_tpu.data import (
    CachedVolumeDataset,
    DataLoader,
    Dataset,
    RandomSampler,
    WeightedSampler,
    class_weights_from_labels,
)
from adell_mri_tpu.entrypoints.assemble_args import Parser
from adell_mri_tpu.entrypoints.cli_utils import filter_training_pids
from adell_mri_tpu.entrypoints.segmentation.train import get_folds
from adell_mri_tpu.models.classification.losses import (
    binary_logistic_loss,
    cross_entropy_loss,
    ordinal_sigmoidal_loss,
)
from adell_mri_tpu.parallel.mesh import get_devices, mesh_for_batch, shard_params
from adell_mri_tpu.train import (
    TrainState,
    cosine_annealing_with_warmup,
    get_optimizer,
    make_classification_step,
    make_eval_step,
    make_train_step,
)
from adell_mri_tpu.train.batch_preprocessing import BatchPreprocessing
from adell_mri_tpu.train.checkpoints import CheckpointManager
from adell_mri_tpu.train.logging_utils import MetricLogger
from adell_mri_tpu.train.loop import TrainLoop
from adell_mri_tpu.transforms import AugmentPolicy, ClassificationTransforms
from adell_mri_tpu.utils import get_logger

logger = get_logger(__name__)

ARG_KEYS = [
    "dataset_json",
    "image_keys",
    ("label_keys", "label_keys", dict(nargs=None, default="label")),
    "clinical_feature_keys",
    "adc_keys",
    "mask_keys",
    "image_masking",
    "image_crop_from_mask",
    "filter_on_keys",
    "possible_labels",
    "positive_labels",
    "label_groups",
    "cache_rate",
    "cache_dir",
    "subsample_size",
    "subsample_training_data",
    "excluded_ids_from_training_data",
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
    "n_classes",
    "augment",
    "label_smoothing",
    "mixup_alpha",
    "partial_mixup",
    "dropout_param",
    "batch_size",
    "learning_rate",
    "optimizer",
    "precision",
    "accumulate_grad_batches",
    "gradient_clip_val",
    "check_val_every_n_epoch",
    "early_stopping",
    "class_weights",
    "weighted_sampling",
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
    "metric_path",
    "correct_classification_bias",
    "checkpoint",
    "exclude_from_state_dict",
    "freeze_regex",
    "not_freeze_regex",
    "classification_net_type",
    "swa",
    "steps_per_epoch",
    "calibration_ids",
    "conformal_alpha",
]


def main(arguments):
    parser = Parser(prog="adell classification train")
    parser.add_argument_by_key(ARG_KEYS)
    args = parser.parse_args(arguments)
    label_key = args.label_keys

    data = Dataset(args.dataset_json, seed=args.seed)
    data.apply_filters(
        presence_keys=list(args.image_keys) + [label_key],
        filter_on_keys=args.filter_on_keys,
        possible_labels=args.possible_labels,
        label_keys=label_key if args.possible_labels else None,
    )
    if args.subsample_size:
        data.subsample_dataset(
            subsample_size=args.subsample_size, strata_key=label_key
        )
    if len(data) == 0:
        raise ValueError("no samples left after filtering")

    try:
        config = parse_config_cat(args.config_file)
    except Exception:
        config, _ = parse_config_unet(args.config_file)
    net_cfg = config["network"]
    train_cfg = config["training"]
    batch_size = args.batch_size or train_cfg.get("batch_size", 4)
    learning_rate = args.learning_rate or train_cfg.get("learning_rate", 1e-3)
    weight_decay = train_cfg.get("weight_decay", 0.0)
    if args.dropout_param:
        net_cfg["dropout_param"] = args.dropout_param

    base_size = args.pad_size or args.resize_size or args.crop_size
    crop_size = args.random_crop_size
    if base_size is None:
        raise ValueError("one of --pad_size/--resize_size/--crop_size required")

    platform, devices = get_devices(args.dev)
    mesh = mesh_for_batch(batch_size, devices)
    logger.info("platform=%s mesh=%s", platform, dict(mesh.shape))

    # clinical feature normalization stats (HybridClassifier wrap)
    feat_keys = args.clinical_feature_keys or []
    feat_means = feat_stds = None
    if feat_keys:
        mat = np.asarray(
            [
                [float(data[k][fk]) for fk in feat_keys]
                for k in data
                if all(fk in data[k] for fk in feat_keys)
            ]
        )
        feat_means, feat_stds = mat.mean(0).tolist(), mat.std(0).tolist()

    fold_pids = list(data.keys())
    if args.calibration_ids:
        from adell_mri_tpu.data import parse_ids

        calib_set = set(parse_ids(args.calibration_ids, "list"))
        fold_pids = [p for p in fold_pids if p not in calib_set]
    # stratified on the class label like the reference
    # (StratifiedKFold, classification/train.py:247)
    from adell_mri_tpu.entrypoints.cli_utils import stratification_labels

    folds = get_folds(
        fold_pids, args.n_folds, args.seed, args.folds,
        labels=stratification_labels(
            data, fold_pids, label_key, args.n_folds, args.folds
        ),
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

    from adell_mri_tpu.entrypoints.cli_utils import (
        derive_n_classes,
        parse_label_groups,
    )

    # n_classes follows the label flags like the reference
    # (classification/train.py:162-174): --possible_labels a b c used to
    # train a BINARY model unless --n_classes 3 was also passed
    n_classes = derive_n_classes(args)
    label_groups = parse_label_groups(getattr(args, "label_groups", None))
    net_type = args.classification_net_type
    if net_type == "ord":
        loss_fn = lambda logits, y: ordinal_sigmoidal_loss(
            logits, y, n_classes
        )
    elif n_classes > 2:
        weights = (
            np.asarray(args.class_weights, np.float32)
            if args.class_weights
            else None
        )
        loss_fn = lambda logits, y: cross_entropy_loss(
            logits, y, weight=weights
        )
    else:
        w = args.class_weights[0] if args.class_weights else None
        loss_fn = lambda logits, y: binary_logistic_loss(logits, y, weight=w)

    batch_prep = None
    if args.mixup_alpha or args.label_smoothing:
        batch_prep = BatchPreprocessing(
            label_smoothing_param=args.label_smoothing,
            mixup_alpha=args.mixup_alpha,
            partial_mixup_fraction=args.partial_mixup,
            n_classes=args.n_classes,
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
        transforms = ClassificationTransforms(
            image_keys=args.image_keys,
            label_key=label_key,
            target_spacing=args.target_spacing,
            target_size=base_size,
            resize_size=args.resize_size,
            crop_size=crop_size,
            adc_keys=args.adc_keys or (),
            # reference class factory (transform_factory/augmentations.py
            # :181-299): prob=0.1, flips over axes [0,1], RandAffined
            # rotate [pi/16] (first axis only), scale [0.1, 0.1, 0.05],
            # translate [4, 4, 1] VOXELS (our translate_range is a
            # fraction of the augmented shape)
            augmentations=AugmentPolicy.from_flags(
                args.augment,
                prob=0.1,
                flip_axes=(0, 1),
                rotate_range=(np.pi / 16, 0.0, 0.0),
                scale_range=(0.1, 0.1, 0.05),
                translate_range=tuple(
                    v / s
                    for v, s in zip(
                        (4.0, 4.0, 1.0), crop_size or base_size
                    )
                ),
            ),
            clinical_feature_keys=feat_keys,
            mask_key=(args.mask_keys or [None])[0],
            image_masking=args.image_masking,
            image_crop_from_mask=args.image_crop_from_mask,
            # binarize against positive_labels whenever labels are
            # enumerable and the task is binary (handles non-numeric and
            # multi-valued label sets alike)
            positive_labels=(
                args.positive_labels
                if (args.positive_labels and n_classes == 2
                    and args.possible_labels)
                else None
            ),
            # multiclass value->index mapping / group mapping (parity:
            # LabelOperatord via the reference's transform factory)
            possible_labels=(
                args.possible_labels
                if args.possible_labels and not args.positive_labels
                else None
            ),
            label_groups=label_groups,
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
        if args.weighted_sampling:
            labels = [e[label_key] for e in train_list]
            sampler = WeightedSampler(
                class_weights_from_labels(labels), seed=args.seed
            )
        else:
            sampler = RandomSampler(len(train_ds), seed=args.seed)
        train_loader = DataLoader(
            train_ds, sampler=sampler, batch_size=batch_size, drop_last=True,
            prefetch=max(args.n_workers, 2),
        )
        val_loader = DataLoader(
            val_ds,
            batch_size=max(1, min(batch_size, len(val_ds))),
            drop_last=True,
        )

        model = get_classification_network(
            net_type,
            net_cfg,
            n_classes=n_classes,
            clinical_feature_means=feat_means,
            clinical_feature_stds=feat_stds,
        )
        shape = tuple(crop_size or base_size)
        x0 = np.zeros((1,) + shape + (len(args.image_keys),), np.float32)
        init_args = (x0, np.zeros((1, len(feat_keys)), np.float32)) if feat_keys else (x0,)
        init_vars = model.init(
            {"params": jax.random.PRNGKey(args.seed)}, *init_args
        )
        params = init_vars["params"]
        # mutable collections (batch_stats for norm "batch", the reference
        # CatNet default): updated per step, checkpointed, restored by
        # test/predict (torch BatchNorm inference parity)
        model_vars = {
            k: v for k, v in init_vars.items() if k == "batch_stats"
        } or None
        if args.correct_classification_bias and n_classes <= 2:
            from adell_mri_tpu.train.checkpoints import (
                correct_classification_bias,
            )

            params = correct_classification_bias(
                params, [float(e[label_key]) for e in train_list]
            )
        if args.checkpoint:
            import os as _os

            from adell_mri_tpu.train.checkpoints import load_params_into

            for ck_path in args.checkpoint:
                src = CheckpointManager(
                    _os.path.dirname(ck_path) or ".",
                    name=_os.path.basename(ck_path).replace("_fold0", ""),
                    fold=0,
                )
                loaded = src.restore(src.best_step())
                if loaded is None:
                    continue
                params, skipped = load_params_into(
                    params,
                    loaded.get("params", loaded),
                    exclude_patterns=args.exclude_from_state_dict or (),
                )
                logger.info(
                    "warm start from %s (%d skipped)", ck_path, len(skipped)
                )
        steps_per_epoch = max(len(train_loader), 1)
        if args.steps_per_epoch:
            steps_per_epoch = min(steps_per_epoch, args.steps_per_epoch)
        sched_steps = max(
            1, steps_per_epoch // max(1, args.accumulate_grad_batches)
        )
        schedule = cosine_annealing_with_warmup(
            learning_rate,
            t_max=args.max_epochs * sched_steps,
            n_warmup_steps=args.warmup_steps,
        )
        tx = get_optimizer(
            args.optimizer,
            learning_rate=schedule,
            weight_decay=weight_decay,
            clip_norm=args.gradient_clip_val,
            params=params,
        )
        if args.freeze_regex or args.not_freeze_regex:
            from adell_mri_tpu.train.checkpoints import freeze_mask_by_regex
            from adell_mri_tpu.train.optim import freeze_wrap

            tx = freeze_wrap(
                tx,
                freeze_mask_by_regex(
                    params,
                    freeze_patterns=args.freeze_regex or (),
                    not_freeze_patterns=args.not_freeze_regex or (),
                ),
            )
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
                with_ema=args.swa,
                ema_mode="swa" if args.swa else "ema",
                swa_start_step=int(0.75 * args.max_epochs * steps_per_epoch),
            )

        ckpt = CheckpointManager(
            args.checkpoint_dir,
            name=args.checkpoint_name or "classification",
            fold=fold_idx,
            metadata={
                "network_config": net_cfg,
                "transform_arguments": {
                    "image_keys": list(args.image_keys),
                    "label_key": label_key,
                    "target_spacing": args.target_spacing,
                    "target_size": list(base_size),
                    "resize_size": (
                        list(args.resize_size) if args.resize_size else None
                    ),
                    "clinical_feature_keys": list(feat_keys),
                    # label mapping flags, so test/predict rebuild the
                    # SAME label semantics (raw labels used to leak into
                    # test metrics for binarized/mapped training runs)
                    "positive_labels": (
                        list(args.positive_labels)
                        if (args.positive_labels and n_classes == 2
                            and args.possible_labels)
                        else None
                    ),
                    "possible_labels": (
                        list(args.possible_labels)
                        if args.possible_labels and not args.positive_labels
                        else None
                    ),
                    "label_groups": label_groups,
                    # intensity/masking semantics for serve-time rebuilds
                    # (an unrescaled ADC / unmasked image at test time
                    # silently shifted the input distribution)
                    "adc_keys": list(args.adc_keys or ()),
                    "mask_key": (args.mask_keys or [None])[0],
                    "image_masking": bool(args.image_masking),
                    "image_crop_from_mask": bool(args.image_crop_from_mask),
                },
                "train_pids": train_pids,
                "val_pids": val_pids,
                "n_classes": n_classes,
                "net_type": net_type,
                "clinical_feature_means": feat_means,
                "clinical_feature_stds": feat_stds,
            },
            monitor=args.monitor,
            mode="min" if "loss" in args.monitor else "max",
        )
        # fresh runs drop any stale best.json from a prior run
        ckpt.begin_run(resume=bool(args.resume_from_last))
        if args.resume_from_last and ckpt.status(args.max_epochs) == "finished":
            continue

        if feat_keys:
            from adell_mri_tpu.train.precision import wrap_apply

            # --precision applies here too (the no-features branch routes
            # through make_classification_step which already does this)
            hybrid_apply = wrap_apply(
                lambda params, x, feats, **kw: model.apply(
                    {"params": params}, x, feats, **kw
                ),
                args.precision,
            )

            def make_lm(train):
                def lm(params, batch, rng):
                    x, y = batch["image"], batch["label"]
                    feats = batch["features"]
                    if batch_prep is not None and train:
                        rng, k = jax.random.split(rng)
                        x, y = batch_prep(k, x, y)
                    rngs = {"dropout": rng} if train else None
                    logits = hybrid_apply(
                        params, x, feats, train=train, rngs=rngs
                    )
                    loss = loss_fn(logits, y)
                    import jax.numpy as jnp

                    prob = jax.nn.sigmoid(logits[..., 0]) if n_classes == 2 else None
                    if prob is not None:
                        acc = jnp.mean(
                            ((prob > 0.5) == (y > 0.5)).astype(jnp.float32)
                        )
                    else:
                        # y may be soft [B, C] after multiclass mixup
                        y_idx = (
                            jnp.argmax(y, -1)
                            if y.ndim == logits.ndim
                            else y.astype(jnp.int32)
                        )
                        acc = jnp.mean(
                            (jnp.argmax(logits, -1) == y_idx).astype(
                                jnp.float32
                            )
                        )
                    return loss, {"loss": loss, "acc": acc}

                return lm

            train_lm, eval_lm = make_lm(True), make_lm(False)
        else:
            train_lm = make_classification_step(
                model, loss_fn, n_classes=n_classes, train=True,
                batch_preprocessing=batch_prep, precision=args.precision,
            )
            eval_lm = make_classification_step(
                model, loss_fn, n_classes=n_classes, train=False,
                precision=args.precision,
            )
        # per-epoch validation metric dictionary (parity: the torchmetrics
        # dicts updated in validation_step, classification/pl.py:99-160)
        from adell_mri_tpu.eval.callbacks import ClassificationMetricsCallback

        metrics_cb = ClassificationMetricsCallback(
            model,
            n_classes=n_classes,
            feature_key="features" if feat_keys else None,
            # OrdNet emits cumulative threshold logits, not class logits
            ordinal=net_type == "ord",
        )
        loop = TrainLoop(
            train_step=make_train_step(train_lm),
            eval_step=make_eval_step(eval_lm),
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
            callbacks=(metrics_cb,),
            steps_per_epoch=args.steps_per_epoch,
        )
        start_epoch = 0
        if args.resume_from_last:
            state, start_epoch = ckpt.resume(state)
            if start_epoch:
                logger.info(
                    "fold %d: resuming from epoch %d", fold_idx, start_epoch
                )
        state, history = loop.fit(
            state, train_loader, val_loader, start_epoch=start_epoch
        )
        final = history[-1] if history else {}
        if args.log_model:
            csv_logger.log_artifact(ckpt.dir)
        logger.info("fold %d done: %s", fold_idx, json.dumps(final, default=float))

        # calibrate against the weights predict/test will actually SERVE:
        # with early stopping the best checkpoint predates the final
        # epoch, and a covariance/q_hat fitted on final-epoch params would
        # void the conformal coverage guarantee for the served model
        best = ckpt.best_step()
        if best is not None and (
            net_cfg.get("gaussian_process") or args.calibration_ids
        ):
            restored = ckpt.restore(best, target={"params": state.params})
            state = state.replace(params=restored["params"])

        # GP-head covariance fit over the train set (parity: on_fit_end,
        # classification/pl.py:381-392); saved next to the checkpoint so
        # predict applies the mean-field-corrected logits
        if net_cfg.get("gaussian_process") and not feat_keys:
            phis = []
            for batch in train_loader:
                x = jnp.asarray(batch["image"])
                _, inter = model.apply(
                    {"params": state.params},
                    x,
                    train=False,
                    mutable=["intermediates"],
                )
                phis.append(
                    np.asarray(jax.tree.leaves(inter["intermediates"])[0])
                )
            if phis:
                from adell_mri_tpu.models.layers.gaussian_process import (
                    fit_covariance,
                )

                cov = fit_covariance(jnp.concatenate(phis))
                np.save(
                    os.path.join(ckpt.dir, "gp_covariance.npy"),
                    np.asarray(cov),
                )
                logger.info("GP covariance fitted over %d batches", len(phis))

        # conformal calibration on held-out ids (parity: ClassPLABC.calibrate
        # via AdaptivePredictionSets, classification/pl.py:394-459)
        if args.calibration_ids:
            from adell_mri_tpu.data import parse_ids
            from adell_mri_tpu.models.layers.conformal import (
                AdaptivePredictionSets,
            )

            calib_pids = [
                p
                for p in parse_ids(args.calibration_ids, "list")
                if p in data.dataset
            ]
            calib_ds = CachedVolumeDataset(
                data.to_datalist(calib_pids), load_fn, cache_rate=0.0
            )
            probs_all, labels_all = [], []
            for i in range(len(calib_ds)):
                sample = calib_ds[i]
                x = jnp.asarray(sample["image"])[None]
                if feat_keys:
                    logits = model.apply(
                        {"params": state.params},
                        x,
                        jnp.asarray(sample["features"])[None],
                        train=False,
                    )
                else:
                    logits = model.apply(
                        {"params": state.params}, x, train=False
                    )
                logits = np.asarray(logits)[0]
                if n_classes == 2:
                    p1 = float(jax.nn.sigmoid(logits[0]))
                    probs_all.append([1.0 - p1, p1])
                else:
                    probs_all.append(
                        np.asarray(jax.nn.softmax(logits)).tolist()
                    )
                labels_all.append(int(sample["label"]))
            if probs_all:
                aps = AdaptivePredictionSets(
                    alpha=args.conformal_alpha
                ).calibrate(np.asarray(probs_all), np.asarray(labels_all))
                with open(os.path.join(ckpt.dir, "conformal.json"), "w") as f:
                    json.dump(
                        {"q_hat": aps.q_hat, "alpha": aps.alpha,
                         "n_calibration": len(probs_all)},
                        f,
                    )
                logger.info(
                    "conformal calibrated on %d cases (q_hat=%.4f)",
                    len(probs_all),
                    aps.q_hat,
                )
