"""
``adell classification_deconfounder test`` — metrics for a trained
deconfounded classifier (parity: entrypoints/classification_deconfounder/
test.py). The surrogate-head shapes come from checkpoint metadata
(cat_confounder_cards / cont_confounder_keys).
"""

import json

import jax
import numpy as np

from adell_mri_tpu.data import Dataset
from adell_mri_tpu.entrypoints.assemble_args import Parser
from adell_mri_tpu.entrypoints.classification_deconfounder.train import (
    build_deconfounder_model,
)
from adell_mri_tpu.eval.metrics import binary_metrics
from adell_mri_tpu.train.checkpoints import CheckpointManager
from adell_mri_tpu.train.logging_utils import MetricLogger
from adell_mri_tpu.transforms import ClassificationTransforms

ARG_KEYS = [
    "dataset_json",
    ("image_keys", "image_keys", dict(required=False, default=None)),
    "test_ids",
    "checkpoint_dir",
    "checkpoint_name",
    "n_classes",
    "metric_path",
    "dev",
    "precision",
    "seed",
]


def _rebuild_for_checkpoints(args):
    """Rebuilds the model + template params from checkpoint metadata,
    leaving checkpoint restoration to the caller (predict's
    ``--checkpoint`` list; parity: reference deconfounder predict loop)."""
    mngr = CheckpointManager(
        args.checkpoint_dir,
        name=args.checkpoint_name or "deconfounder",
        fold=0,
    )
    metadata = mngr.load_metadata()
    net_cfg = metadata.get("network_config", {})
    t_args = metadata.get("transform_arguments", {})
    n_classes = metadata.get("n_classes", args.n_classes)
    image_keys = args.image_keys or t_args.get("image_keys", ["image"])
    model = build_deconfounder_model(
        net_cfg,
        metadata.get("cat_confounder_cards", []),
        len(metadata.get("cont_confounder_keys", [])),
        n_classes,
        # pre-round-3 checkpoints predate the key and used the model default
        n_features=metadata.get("n_features_deconfounder", 32),
    )
    size = tuple(t_args.get("target_size"))
    x0 = np.zeros((1,) + size + (len(image_keys),), np.float32)
    params0 = model.init({"params": jax.random.PRNGKey(0)}, x0)["params"]
    transforms = ClassificationTransforms(
        image_keys=image_keys,
        label_key=t_args.get("label_key", "label"),
        target_spacing=t_args.get("target_spacing"),
        target_size=size,
        # training-time label semantics (binarization / value->index /
        # group mapping) from checkpoint metadata
        positive_labels=t_args.get("positive_labels"),
        possible_labels=t_args.get("possible_labels"),
        label_groups=t_args.get("label_groups"),
    )
    return model, mngr, params0, transforms, t_args, n_classes


def _rebuild(args):
    model, mngr, params0, transforms, t_args, n_classes = (
        _rebuild_for_checkpoints(args)
    )
    params = mngr.restore(mngr.best_step(), target={"params": params0})[
        "params"
    ]
    return model, params, transforms, t_args, n_classes


def main(arguments):
    parser = Parser(prog="adell classification_deconfounder test")
    parser.add_argument_by_key(ARG_KEYS)
    args = parser.parse_args(arguments)

    from adell_mri_tpu.parallel.mesh import use_device

    use_device(args.dev)
    model, params, transforms, t_args, n_classes = _rebuild(args)
    load_fn = transforms.load_fn()

    from adell_mri_tpu.train.precision import wrap_apply

    # --precision bf16: params + inputs cast to the compute dtype,
    # outputs return to f32 (same policy as training)
    apply = wrap_apply(model.apply, getattr(args, "precision", None))

    @jax.jit
    def predict(x):
        logits, *_ = apply({"params": params}, x[None])
        return logits[0]

    data = Dataset(args.dataset_json)
    pids = args.test_ids or list(data.keys())
    probs, targets = [], []
    for pid in pids:
        if pid not in data.dataset:
            continue
        sample = load_fn({**data[pid], "identifier": pid})
        logits = np.asarray(predict(sample["image"]))
        if n_classes == 2:
            probs.append(float(jax.nn.sigmoid(logits[0])))
        else:
            probs.append(np.asarray(jax.nn.softmax(logits)))
        targets.append(float(sample["label"]))
    if n_classes == 2:
        results = binary_metrics(np.asarray(probs), np.asarray(targets))
    else:
        from adell_mri_tpu.eval.metrics import multiclass_metrics

        results = multiclass_metrics(np.asarray(probs), np.asarray(targets))
    results["n_cases"] = len(targets)
    MetricLogger(csv_path=args.metric_path).log_metrics(results, step=0)
    print(json.dumps(results))
