"""
``adell classification_ensemble test``.

Parity target: adell_mri/entrypoints/classification_ensemble/test.py —
ensemble probabilities against labels, full metric dictionary.
"""

import json

import jax
import numpy as np

from adell_mri_tpu.data import Dataset
from adell_mri_tpu.entrypoints.assemble_args import Parser
from adell_mri_tpu.entrypoints.classification_ensemble.predict import (
    build_ensemble_from_metadata,
)
from adell_mri_tpu.eval.metrics import binary_metrics, multiclass_metrics
from adell_mri_tpu.train.logging_utils import MetricLogger
from adell_mri_tpu.transforms import ClassificationTransforms
from adell_mri_tpu.utils import get_logger

logger = get_logger(__name__)

ARG_KEYS = [
    "dataset_json",
    ("label_keys", "label_keys", dict(nargs=None, default="label")),
    "test_ids",
    "checkpoint_dir",
    "checkpoint_name",
    "metric_path",
    "dev",
    "precision",
    "seed",
]


def main(arguments):
    parser = Parser(prog="adell classification_ensemble test")
    parser.add_argument_by_key(ARG_KEYS)
    args = parser.parse_args(arguments)

    from adell_mri_tpu.parallel.mesh import use_device

    use_device(args.dev)

    model, params, meta = build_ensemble_from_metadata(
        args.checkpoint_dir, args.checkpoint_name
    )
    t_args = meta["transform_arguments"]
    n_classes = meta.get("n_classes", 2)
    label_key = args.label_keys or t_args.get("label_key", "label")
    transforms = ClassificationTransforms(
        image_keys=t_args["image_keys"],
        label_key=label_key,
        target_spacing=t_args.get("target_spacing"),
        target_size=tuple(t_args["target_size"]),
        # training-time label semantics (binarization / value->index /
        # group mapping) from checkpoint metadata
        positive_labels=t_args.get("positive_labels"),
        possible_labels=t_args.get("possible_labels"),
        label_groups=t_args.get("label_groups"),
    )
    load_fn = transforms.load_fn()

    from adell_mri_tpu.train.precision import wrap_apply

    # --precision bf16: params + inputs cast to the compute dtype,
    # outputs return to f32 (same policy as training)
    apply = wrap_apply(model.apply, getattr(args, "precision", None))

    @jax.jit
    def predict(x):
        logits = apply({"params": params}, x[None])[0]
        if n_classes > 2:
            return jax.nn.softmax(logits)
        return jax.nn.sigmoid(logits[..., 0] if logits.ndim else logits)

    data = Dataset(args.dataset_json)
    pids = args.test_ids or list(data.keys())
    probs, targets = [], []
    for pid in pids:
        if pid not in data.dataset or label_key not in data[pid]:
            continue
        sample = load_fn({**data[pid], "identifier": pid})
        probs.append(np.asarray(predict(sample["image"])))
        targets.append(float(sample["label"]))
    if n_classes > 2:
        results = multiclass_metrics(np.asarray(probs), np.asarray(targets))
    else:
        results = binary_metrics(np.asarray(probs), np.asarray(targets))
    results["n_cases"] = len(targets)
    MetricLogger(csv_path=args.metric_path).log_metrics(results, step=0)
    print(json.dumps(results))
