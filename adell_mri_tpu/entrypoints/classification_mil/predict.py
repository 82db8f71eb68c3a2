"""
``adell classification_mil predict`` — per-case probabilities/logits to
JSON (parity: entrypoints/classification_mil/predict.py).
"""

import json

import jax
import numpy as np

from adell_mri_tpu.data import Dataset
from adell_mri_tpu.entrypoints.assemble_args import Parser
from adell_mri_tpu.entrypoints.classification_mil.test import _rebuild

ARG_KEYS = [
    "dataset_json",
    ("image_keys", "image_keys", dict(required=False, default=None)),
    "prediction_ids",
    "checkpoint_dir",
    "checkpoint_name",
    "n_classes",
    "output_path",
    "prediction_type",
    "dev",
    "precision",
    "seed",
]


def main(arguments):
    parser = Parser(prog="adell classification_mil predict")
    parser.add_argument_by_key(ARG_KEYS)
    args = parser.parse_args(arguments)

    from adell_mri_tpu.parallel.mesh import use_device

    use_device(args.dev)
    model, params, transforms, t_args, n_classes = _rebuild(args)
    label_key = t_args.get("label_key", "label")
    load_fn = transforms.load_fn()

    from adell_mri_tpu.train.precision import wrap_apply

    # --precision bf16: params + inputs cast to the compute dtype,
    # logits return to f32 (same policy as training)
    apply = wrap_apply(model.apply, getattr(args, "precision", None))

    @jax.jit
    def predict(x):
        return apply({"params": params}, x[None])[0]

    data = Dataset(args.dataset_json)
    pids = args.prediction_ids or list(data.keys())
    out = {}
    for pid in pids:
        if pid not in data.dataset:
            continue
        entry = {**data[pid], "identifier": pid}
        if label_key not in entry:
            entry[label_key] = 0
        sample = load_fn(entry)
        logits = np.asarray(predict(sample["image"]))
        if args.prediction_type == "logit":
            out[pid] = logits.tolist()
        elif n_classes == 2:
            out[pid] = float(jax.nn.sigmoid(logits[0]))
        else:
            out[pid] = np.asarray(jax.nn.softmax(logits)).tolist()
    with open(args.output_path, "w") as f:
        json.dump(out, f)
    print(json.dumps(out))
