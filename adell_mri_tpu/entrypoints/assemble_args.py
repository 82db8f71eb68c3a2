"""
Declarative CLI argument registry.

Parity target: adell_mri/entrypoints/assemble_args.py:7-847 — one shared
``argument_factory`` of arg specs keyed by name; entrypoints pick keys (with
optional (key, rename) pairs or (key, rename, overrides) triples) via
``Parser.add_argument_by_key``. Flag names match the reference CLI so
existing invocations port unchanged.
"""

import argparse
from typing import Any, Dict, List, Tuple, Union


def _flag(key: str) -> str:
    return "--" + key


argument_factory: Dict[str, Dict[str, Any]] = {
    # data
    "dataset_json": dict(required=True, help="Path to dataset JSON/YAML file(s)", nargs="+"),
    "image_keys": dict(required=True, nargs="+", help="Image keys in dataset JSON"),
    "label_keys": dict(default=None, nargs="+", help="Label keys in dataset JSON"),
    "mask_keys": dict(default=None, nargs="+", help="Mask keys in dataset JSON"),
    "mask_image_keys": dict(default=None, nargs="+", help="Keys of images which are masks"),
    "skip_keys": dict(default=None, nargs="+", help="Skip-conditioning image keys"),
    "skip_mask_keys": dict(default=None, nargs="+", help="Skip-conditioning mask keys"),
    "feature_keys": dict(default=None, nargs="+", help="Tabular feature keys"),
    "clinical_feature_keys": dict(default=None, nargs="+", help="Clinical feature keys"),
    "adc_keys": dict(default=None, nargs="+", help="Keys of ADC maps (conditionally rescaled)"),
    "t2_keys": dict(default=None, nargs="+", help="Keys of T2 maps"),
    "filter_on_keys": dict(default=[], nargs="+", help="Filter expressions key=value etc."),
    "filter_is_optional": dict(action="store_true", help="Filters are optional"),
    "possible_labels": dict(default=None, nargs="+", help="All possible labels"),
    # default None like the reference (assemble_args.py:93-98): an eager
    # [1] default made every run look explicitly binarized, so n_classes
    # could never follow --possible_labels (classification/train.py:171-174)
    "positive_labels": dict(default=None, nargs="+", help="Labels considered positive"),
    "label_groups": dict(default=None, nargs="+", help="Label groups for classification"),
    "cache_rate": dict(default=1.0, type=float, help="Fraction of dataset cached in RAM"),
    "cache_dir": dict(default=None, help="Disk cache directory for preprocessed volumes"),
    "subsample_size": dict(default=None, type=int, help="Subsample dataset size"),
    "sequence_paths": dict(
        default=None, nargs="+",
        help="Explicit file paths (one per image key) to predict on a "
        "single case without a dataset JSON",
    ),
    "exclude_surrogate_variables": dict(
        action="store_true",
        help="Excludes deconfounder surrogate predictions from the output",
    ),
    "subsample_training_data": dict(
        default=None, type=float,
        help="Subsamples TRAINING data by this fraction (learning curves)",
    ),
    "excluded_ids": dict(default=None, nargs="+", help="IDs excluded from the dataset"),
    "excluded_ids_from_training_data": dict(
        default=None, nargs="+",
        help="IDs excluded from the training split only (still usable "
        "for validation/test)",
    ),
    "val_from_train": dict(default=None, type=float, help="Fraction of train used for val"),
    "n_folds": dict(default=5, type=int, help="Number of validation folds"),
    "folds": dict(default=None, nargs="+", help="Explicit fold specifications"),
    "target_spacing": dict(default=None, nargs="+", type=float, help="Target spacing (or 'infer')"),
    "pad_size": dict(default=None, nargs="+", type=int, help="Pad size"),
    "crop_size": dict(default=None, nargs="+", type=int, help="Crop size"),
    "resize_size": dict(default=None, nargs="+", type=int, help="Resize size"),
    "random_crop_size": dict(default=None, nargs="+", type=int, help="Random crop size"),
    "n_crops": dict(default=1, type=int, help="Number of random crops"),
    "missing_to_empty": dict(default=None, nargs="+", help="Fabricate empty tensors for missing keys"),
    # config / training
    "config_file": dict(required=True, help="Network YAML config"),
    "config_files": dict(default=None, nargs="+", help="Network YAML configs"),
    "params_from": dict(default=None, help="YAML file with stored parameters"),
    "dev": dict(default="tpu", type=str, help="Device (tpu/cpu[:ids])"),
    "n_workers": dict(default=0, type=int, help="No. of workers (prefetch depth here)"),
    "seed": dict(default=42, type=int, help="Random seed"),
    "max_epochs": dict(default=100, type=int, help="Maximum epochs"),
    "warmup_steps": dict(default=0.0, type=float, help="Warmup steps/epochs"),
    "start_decay": dict(default=None, type=float, help="When decay starts"),
    "n_classes": dict(type=int, default=2, help="Number of classes"),
    "augment": dict(default=[], nargs="+", help="Augmentation flags (intensity noise rbf affine shear flip blur distort lowres trivial)"),
    "label_smoothing": dict(default=None, type=float, help="Label smoothing"),
    "mixup_alpha": dict(default=None, type=float, help="Alpha for mixup"),
    "partial_mixup": dict(default=None, type=float, help="Fraction for partial mixup"),
    "dropout_param": dict(default=0.0, type=float, help="Dropout parameter"),
    "batch_size": dict(type=int, default=None, help="Batch size"),
    "learning_rate": dict(type=float, default=None, help="Learning rate"),
    "optimizer": dict(default="sgd", type=str, help="Optimizer name"),
    "precision": dict(type=str, default="32", help="Precision: 32|bf16"),
    "gradient_clip_val": dict(default=None, type=float, help="Gradient clipping value"),
    "accumulate_grad_batches": dict(default=1, type=int, help="Gradient accumulation steps"),
    "profile_dir": dict(
        default=None,
        help="Capture a jax.profiler trace of a few train steps into this "
        "directory (view with xprof/tensorboard)",
    ),
    "check_val_every_n_epoch": dict(default=1, type=int, help="Val frequency"),
    "early_stopping": dict(default=None, type=int, help="Early stopping patience"),
    "swa": dict(
        action="store_true",
        help="Stochastic weight averaging (equal-weight running average of "
        "params over the last quarter of training; validated/checkpointed)",
    ),
    "check_nan_loss": dict(
        action="store_true",
        help="NaN-loss forensics: check loss finiteness each step and dump "
        "the in-flight batch to .npz before raising (costs a host sync)",
    ),
    "semi_supervised": dict(
        action="store_true",
        help="Adds a contrastive loss on unlabeled cases (those in the "
        "dataset JSON with images but no masks) with an EMA teacher",
    ),
    "semi_sl_weight": dict(
        type=float, default=0.01, help="Weight of the semi-supervised loss"
    ),
    "remat": dict(
        action="store_true",
        help="Rematerialize the forward during backward (jax.checkpoint) — "
        "trades ~1/3 more FLOPs for fitting full-volume activations in HBM",
    ),
    "remat_policy": dict(
        type=str, default=None,
        help="jax.checkpoint_policies name for --remat (e.g. "
        "dots_with_no_batch_dims_saveable saves the MXU dot outputs — "
        "faster backward, more memory); default: full remat",
    ),
    "sample_panel_every": dict(
        type=int, default=0,
        help="Writes a PNG panel of model samples every N epochs (0=off)",
    ),
    # conditional generation (parity: cat_condition_keys /
    # num_condition_keys / uncondition_proba / guidance_strength in the
    # reference's generative entrypoints)
    "cat_condition_keys": dict(
        default=None, nargs="+",
        help="Dataset keys used as categorical generation conditions",
    ),
    "num_condition_keys": dict(
        default=None, nargs="+",
        help="Dataset keys used as numerical generation conditions",
    ),
    "uncondition_proba": dict(
        default=0.1, type=float,
        help="Classifier-free-guidance dropout: probability of replacing "
        "the condition with the null embedding during training",
    ),
    "guidance_strength": dict(
        default=0.0, type=float,
        help="Classifier-free guidance weight w at sampling: "
        "(1+w)*eps_cond - w*eps_uncond",
    ),
    "cat_condition": dict(
        default=None, nargs="+",
        help="Categorical condition values to sample with (one per "
        "cat_condition_key)",
    ),
    "num_condition": dict(
        default=None, nargs="+", type=float,
        help="Numerical condition values to sample with",
    ),
    "skip_steps": dict(
        default=0, type=int,
        help="Partial denoise: skip the first N reverse steps starting "
        "from a provided input image",
    ),
    "lr_encoder": dict(
        default=None, type=float,
        help="Separate learning rate for encoder parameters (enc_* path "
        "regex; parity: encoder-LR split)",
    ),
    "loss_gamma": dict(
        default=None, type=float,
        help="Focal gamma routed into compatible losses",
    ),
    "loss_comb": dict(
        default=None, type=float,
        help="Hybrid/unified focal combination weight (lam)",
    ),
    "steps_per_epoch": dict(
        default=None, type=int,
        help="Cap the number of train batches per epoch "
        "(Lightning limit_train_batches analogue)",
    ),
    "dataset_iterations_per_epoch": dict(
        default=1.0, type=float,
        help="Number of dataset iterations per training epoch",
    ),
    "samples_per_epoch": dict(
        default=None, type=int,
        help="Number of training samples per epoch (drawn with "
        "replacement; overrides dataset_iterations_per_epoch)",
    ),
    "validation_samples_per_epoch": dict(
        default=None, type=int,
        help="Number of validation samples per epoch",
    ),
    "sliding_window_val": dict(
        action="store_true",
        help="Validate whole volumes with overlap-averaged sliding-window "
        "inference at the training crop size",
    ),
    "delete_checkpoints": dict(
        action="store_true",
        help="Deletes checkpoints after training (keeps metrics/metadata)",
    ),
    "ema_decay": dict(
        default=None, type=float,
        help="EMA decay for teacher/shadow params (default: per-method)",
    ),
    "class_weights": dict(default=None, nargs="+", type=float, help="Class weights"),
    "weighted_sampling": dict(action="store_true", help="Class-weighted sampling"),
    "constant_ratio": dict(default=None, type=float, help="PartiallyRandomSampler keep ratio"),
    # checkpoints / logging
    "checkpoint_dir": dict(default="ckpt", help="Checkpoint directory"),
    "checkpoint_name": dict(type=str, default=None, help="Checkpoint ID"),
    "checkpoint": dict(default=None, nargs="+", help="Checkpoint path(s)"),
    "res_config_file": dict(
        default=None,
        help="SSL YAML whose backbone_args define a ResNet encoder for "
             "the U-Net (ref --res_config_file: depth/strides derived "
             "from the backbone structure)"),
    "encoder_checkpoint": dict(
        default=None, nargs="+",
        help="SSL-pretrained ResNet checkpoint(s) warm-starting the "
             "encoder_backbone subtree; torch .pt/.ckpt files route "
             "through the reference-state-dict importer"),
    "resume_from_last": dict(action="store_true", help="Resume from last checkpoint"),
    "monitor": dict(default="val_loss", help="Metric to monitor"),
    "logger_type": dict(default=None, help="wandb | mlflow | None"),
    "project_name": dict(default=None, help="Experiment tracker project"),
    "summary_name": dict(default=None, help="Run name"),
    "summary_dir": dict(
        default="summaries", help="Summary directory (wandb dir)"
    ),
    "tracking_uri": dict(default=None, help="MLflow tracking URI"),
    "log_model": dict(
        action="store_true",
        help="Stores the best checkpoint with the logger as an artifact",
    ),
    "metric_path": dict(default="metrics.csv", help="CSV metrics output path"),
    "freeze_regex": dict(default=None, nargs="+", help="Freeze params matching regex"),
    "not_freeze_regex": dict(default=None, nargs="+", help="Never freeze params matching regex"),
    "exclude_from_state_dict": dict(default=None, nargs="+", help="Exclude regexes on ckpt load"),
    # segmentation specifics
    "segmentation_net_type": dict(default="unet", choices=["unet", "unetpp", "brunet", "unetr", "swin", "monai_unetr", "monai_swin"], help="Segmentation architecture"),
    "bottleneck_classification": dict(action="store_true", help="Bottleneck classification head"),
    "deep_supervision": dict(action="store_true", help="Deep supervision"),
    "picai_eval": dict(action="store_true", help="Lesion-level PI-CAI eval"),
    "sliding_window_size": dict(default=None, nargs="+", type=int, help="Sliding window size"),
    "sliding_window_stride": dict(default=0.5, type=float, help="Sliding window stride: <= 1 is a window fraction (1.0 = no overlap), > 1 is absolute voxels"),
    "flip_tta": dict(action="store_true", help="Flip test-time augmentation"),
    "mc_iterations": dict(default=None, type=int, help="MC dropout iterations"),
    # classification specifics
    "classification_net_type": dict(default="cat", choices=["cat", "ord", "vgg", "vit", "factorized_vit", "unet", "resnet", "convnext", "convnext_backbone", "convnext_v2"], help="Classification architecture"),
    "image_masking": dict(action="store_true", help="Mask image with mask key"),
    "image_crop_from_mask": dict(action="store_true", help="Crop image from mask bounding box"),
    "correct_classification_bias": dict(action="store_true", help="Set output bias to log-odds"),
    # ssl specifics
    "ssl_method": dict(default="vicreg", choices=["simsiam", "byol", "vicreg", "vicregl", "barlow_twins", "simclr", "dino", "ibot", "mae", "ijepa"], help="SSL method"),
    "ema": dict(action="store_true", help="EMA teacher"),
    "stop_gradient": dict(action="store_true", help="Stop gradient on target branch"),
    "n_local_crops": dict(default=0, type=int, help="DINO multi-crop: number of extra small student views"),
    "sample_channels": dict(default=None, type=int, help="Randomly keep this many channels of each 4D (multi-channel) image key at load time (parity: SampleChannelDimd)"),
    "n_series_iterations": dict(default=2, type=int, help="Random slices drawn per DICOM series per epoch"),
    "max_slices": dict(default=None, type=int, help="Maximum slices kept per DICOM series"),
    # prediction
    "output_path": dict(default="output", help="Output path"),
    "prediction_ids": dict(default=None, nargs="+", help="IDs to predict"),
    "prediction_type": dict(default="probability", help="probability|logit|features|pre_bias (ord nets)|set (conformal prediction sets; needs a calibrated checkpoint)"),
    "ensemble": dict(default=None, choices=["mean", "median"], help="Ensembles predictions from different checkpoints (ref assemble_args.py:815; median per utils/prediction_utils.py)"),
    "calibration_ids": dict(default=None, nargs="+", help="Held-out IDs for conformal calibration (AdaptivePredictionSets) after training"),
    "conformal_alpha": dict(default=0.2, type=float, help="Conformal miscoverage level alpha (reference default 0.2)"),
    "test_ids": dict(default=None, nargs="+", help="Test IDs"),
    "one_to_one": dict(action="store_true", help="One checkpoint per fold"),
    # detection
    "box_key": dict(type=str, default="boxes", help="Box key in dataset JSON"),
    "box_class_key": dict(type=str, default="box_classes", help="Box class key"),
    "shape_key": dict(type=str, default="shape", help="Shape key"),
    "anchor_csv": dict(default=None, help="Anchor CSV path"),
    "iou_threshold": dict(default=0.5, type=float, help="IoU threshold for NMS"),
    "detection_net_type": dict(default="yolo", help="Detection architecture"),
}

ArgKey = Union[str, Tuple[str, str], Tuple[str, str, Dict[str, Any]]]


def _read_params(path: str) -> Dict[str, Any]:
    """Reads ``--params_from`` sources (parity: utils/parser.py:20-115):
    ``file.yaml`` / ``file.yaml:nested:key`` subfield selection, and
    ``dvc[:key...]`` via ``dvc.api.params_show`` when dvc is installed."""
    import yaml

    parts = path.split(":")
    if parts[0] == "dvc":
        import importlib.util

        if importlib.util.find_spec("dvc") is None:
            raise ImportError(
                "--params_from dvc:... requires the dvc package "
                "(pip install dvc)"
            )
        import dvc.api

        params = dvc.api.params_show()
        keys = parts[1:]
    else:
        with open(parts[0]) as f:
            params = yaml.safe_load(f) or {}
        keys = parts[1:]
    for k in keys:
        params = params[k]
    return params


def _apply_overrides(params: Dict[str, Any], overrides: List[str]):
    """Hydra-style ``a.b=value`` assignments into a nested dict (parity:
    utils/parser.py:137-166). Values parse as YAML scalars/lists."""
    import yaml

    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override '{ov}' is not key=value")
        key, raw = ov.split("=", 1)
        try:
            value = yaml.safe_load(raw)
        except Exception:
            value = raw
        node = params
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
            if not isinstance(node, dict):
                raise ValueError(f"override '{ov}' descends into non-dict")
        node[parts[-1]] = value


class Parser(argparse.ArgumentParser):
    """argparse with registry lookups (parity: assemble_args.py:831-847)."""

    def add_argument_by_key(self, keys: List[ArgKey]):
        for key in keys:
            overrides: Dict[str, Any] = {}
            if isinstance(key, (tuple, list)):
                if len(key) == 3:
                    key, rename, overrides = key
                else:
                    key, rename = key
            else:
                rename = key
            spec = dict(argument_factory[key])
            spec.update(overrides)
            self.add_argument(_flag(rename), dest=rename, **spec)
        return self

    def parse_args(self, args=None, namespace=None):
        """
        Supports ``--params_from file.yaml``: stored values fill in any
        argument NOT given on the command line — CLI always wins (parity:
        utils/parser.py:51-135). ``--overrides a.b=1 c=[2,3]`` applies
        hydra-style dotted-key overrides onto the stored params before the
        fill (parity: utils/parser.py:137-166 ``compose``).
        """
        import sys as _sys

        argv = list(_sys.argv[1:] if args is None else args)
        overrides = []
        if "--overrides" in argv:
            idx = argv.index("--overrides")
            j = idx + 1
            while j < len(argv) and not argv[j].startswith("--"):
                overrides.append(argv[j])
                j += 1
            del argv[idx:j]
        if "--params_from" in argv:
            idx = argv.index("--params_from")
            path = argv[idx + 1]
            del argv[idx : idx + 2]
            stored = _read_params(path)
            _apply_overrides(stored, overrides)
            given = {
                a.split("=", 1)[0].lstrip("-")
                for a in argv
                if a.startswith("--")
            }
            for key, value in stored.items():
                if key in given or key == "params_from":
                    continue
                flag = _flag(key)
                if isinstance(value, bool):
                    if value:
                        argv.append(flag)
                elif isinstance(value, (list, tuple)):
                    argv.append(flag)
                    argv.extend(str(v) for v in value)
                elif value is not None:
                    argv.extend([flag, str(value)])
        elif overrides:
            # no stored params: overrides become plain --key value args.
            # Explicitly typed CLI flags still win (same precedence as the
            # params_from branch) — skip overrides already present in argv
            stored = {}
            _apply_overrides(stored, overrides)
            given = {
                a.split("=", 1)[0].lstrip("-")
                for a in argv
                if a.startswith("--")
            }
            stored = {k: v for k, v in stored.items() if k not in given}
            for key, value in stored.items():
                flag = _flag(key)
                if isinstance(value, bool):
                    if value:
                        argv.append(flag)
                elif isinstance(value, (list, tuple)):
                    argv.append(flag)
                    argv.extend(str(v) for v in value)
                elif value is not None:
                    argv.extend([flag, str(value)])
        return super().parse_args(argv, namespace)
