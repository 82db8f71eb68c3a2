"""
``adell classification test`` — AUC/F1/calibration on a test set
(parity: entrypoints/classification/test.py).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from adell_mri_tpu.config.factories import get_classification_network
from adell_mri_tpu.data import Dataset
from adell_mri_tpu.entrypoints.assemble_args import Parser
from adell_mri_tpu.eval.metrics import binary_metrics
from adell_mri_tpu.train.checkpoints import CheckpointManager
from adell_mri_tpu.train.logging_utils import MetricLogger
from adell_mri_tpu.transforms import ClassificationTransforms
from adell_mri_tpu.utils import get_logger

logger = get_logger(__name__)

ARG_KEYS = [
    "dataset_json",
    ("image_keys", "image_keys", dict(required=False, default=None)),
    "test_ids",
    "checkpoint_dir",
    "checkpoint_name",
    "checkpoint",
    "one_to_one",
    "n_classes",
    "metric_path",
    "dev",
    "seed",
    "classification_net_type",
    "precision",
]


def main(arguments):
    parser = Parser(prog="adell classification test")
    parser.add_argument_by_key(ARG_KEYS)
    args = parser.parse_args(arguments)

    from adell_mri_tpu.parallel.mesh import use_device

    use_device(args.dev)

    mngr = CheckpointManager(
        args.checkpoint_dir,
        name=args.checkpoint_name or "classification",
        fold=0,
    )
    metadata = mngr.load_metadata()
    net_cfg = metadata.get("network_config", {})
    t_args = metadata.get("transform_arguments", {})
    n_classes = metadata.get("n_classes", args.n_classes)
    net_type = metadata.get("net_type", args.classification_net_type)
    image_keys = args.image_keys or t_args.get("image_keys", ["image"])
    label_key = t_args.get("label_key", "label")
    feat_keys = t_args.get("clinical_feature_keys", [])

    model = get_classification_network(
        net_type, net_cfg, n_classes=n_classes,
        clinical_feature_means=metadata.get("clinical_feature_means"),
        clinical_feature_stds=metadata.get("clinical_feature_stds"),
    )
    size = tuple(t_args.get("target_size"))
    x0 = np.zeros((1,) + size + (len(image_keys),), np.float32)
    init_args = (
        (x0, np.zeros((1, len(feat_keys)), np.float32))
        if feat_keys
        else (x0,)
    )
    params0 = model.init({"params": jax.random.PRNGKey(0)}, *init_args)[
        "params"
    ]
    # --checkpoint list (imported reference checkpoints carry BatchNorm
    # running stats, restored next to the params)
    from adell_mri_tpu.entrypoints.prediction_utils import (
        resolve_checkpoint_variables,
    )

    checkpoints = resolve_checkpoint_variables(
        getattr(args, "checkpoint", None), mngr, params0
    )
    # --precision bf16: bf16 params + inputs (logits return to f32); the
    # alias table (bf16-mixed, 16-true, ...) matches training
    from adell_mri_tpu.train.precision import compute_dtype

    bf16 = compute_dtype(getattr(args, "precision", None)) is not None
    if bf16:
        checkpoints = [
            (
                label,
                {
                    "params": jax.tree.map(
                        lambda a: a.astype(jnp.bfloat16), var["params"]
                    ),
                    **{k: var[k] for k in var if k != "params"},
                },
            )
            for label, var in checkpoints
        ]


    transforms = ClassificationTransforms(
        image_keys=image_keys,
        label_key=label_key,
        target_spacing=t_args.get("target_spacing"),
        target_size=size,
        resize_size=t_args.get("resize_size"),
        clinical_feature_keys=feat_keys,
        # rebuild the training-time label semantics (binarization /
        # value->index / group mapping) so metrics score mapped labels
        positive_labels=t_args.get("positive_labels"),
        possible_labels=t_args.get("possible_labels"),
        label_groups=t_args.get("label_groups"),
        adc_keys=t_args.get("adc_keys") or (),
        mask_key=t_args.get("mask_key"),
        image_masking=bool(t_args.get("image_masking")),
        image_crop_from_mask=bool(t_args.get("image_crop_from_mask")),
    )
    load_fn = transforms.load_fn()

    # variables ride as a traced argument so every --checkpoint entry
    # shares one compiled program (parity: ref test.py:233-242 iterates
    # checkpoints x test-id groups, with --one_to_one pairing them)
    @jax.jit
    def predict(variables, x, *feats):
        if bf16:
            x = x.astype(jnp.bfloat16)
            feats = tuple(f.astype(jnp.bfloat16) for f in feats)
        extra = tuple(f[None] for f in feats)
        return model.apply(variables, x[None], *extra)[0].astype(
            jnp.float32
        )

    data = Dataset(args.dataset_json)
    if args.test_ids:
        from adell_mri_tpu.data import parse_ids

        groups = [
            [pid for pid in g if pid in data.dataset]
            for g in parse_ids(list(args.test_ids), "nested_list")
        ]
    else:
        groups = [[pid for pid in data.keys()]]
    if args.one_to_one and len(checkpoints) < len(groups):
        raise ValueError(
            f"--one_to_one needs one checkpoint per test-id group "
            f"({len(groups)}), got {len(checkpoints)}"
        )
    from adell_mri_tpu.entrypoints.prediction_utils import (
        sample_cache_is_reused,
    )

    cache_reused = sample_cache_is_reused(
        groups, len(checkpoints), args.one_to_one
    )
    cache = {}
    mlog = MetricLogger(csv_path=args.metric_path)
    legacy = (
        not getattr(args, "checkpoint", None)
        and not args.one_to_one
        and len(groups) == 1
    )
    all_results = []
    for iteration, group in enumerate(groups):
        ckpt_list = (
            [checkpoints[iteration]] if args.one_to_one else checkpoints
        )
        for ckpt_label, variables in ckpt_list:
            probs, targets = [], []
            for pid in group:
                if pid in cache:
                    sample = cache[pid]
                else:
                    sample = load_fn({**data[pid], "identifier": pid})
                    if cache_reused:
                        cache[pid] = sample
                cond = (sample["features"],) if feat_keys else ()
                logits = np.asarray(
                    predict(variables, sample["image"], *cond)
                )
                if n_classes == 2:
                    probs.append(float(jax.nn.sigmoid(logits[0])))
                elif net_type == "ord":
                    # cumulative threshold logits -> class probabilities
                    # (same conversion as the train-time callback; plain
                    # softmax corrupted AUC/accuracy for ordinal nets)
                    from adell_mri_tpu.models.classification.losses import (
                        ordinal_to_class_probs,
                    )

                    probs.append(
                        np.asarray(ordinal_to_class_probs(logits))
                    )
                else:
                    probs.append(np.asarray(jax.nn.softmax(logits)))
                targets.append(float(sample["label"]))
            if n_classes == 2:
                results = binary_metrics(
                    np.asarray(probs), np.asarray(targets)
                )
            else:
                from adell_mri_tpu.eval.metrics import multiclass_metrics

                results = multiclass_metrics(
                    np.asarray(probs), np.asarray(targets)
                )
            results["n_cases"] = len(targets)
            mlog.log_metrics(
                results,
                step=0,
                checkpoint=ckpt_label,
                iteration=iteration,
            )
            all_results.append(
                {
                    "iteration": iteration,
                    "checkpoint": ckpt_label,
                    **results,
                }
            )
    print(json.dumps(all_results[0] if legacy else all_results))
