"""
``adell classification_deconfounder predict`` — per-case probabilities/
logits to JSON (parity: entrypoints/classification_deconfounder/predict.py).
"""

import json

import jax
import numpy as np

from adell_mri_tpu.data import Dataset
from adell_mri_tpu.entrypoints.assemble_args import Parser
from adell_mri_tpu.entrypoints.classification_deconfounder.test import _rebuild

ARG_KEYS = [
    "dataset_json",
    ("image_keys", "image_keys", dict(required=False, default=None)),
    "prediction_ids",
    "checkpoint_dir",
    "checkpoint_name",
    "n_classes",
    "output_path",
    "prediction_type",
    "exclude_surrogate_variables",
    "dev",
    "precision",
    "seed",
]


def main(arguments):
    parser = Parser(prog="adell classification_deconfounder predict")
    parser.add_argument_by_key(ARG_KEYS)
    args = parser.parse_args(arguments)

    from adell_mri_tpu.parallel.mesh import use_device

    use_device(args.dev)
    model, params, transforms, t_args, n_classes = _rebuild(args)
    label_key = t_args.get("label_key", "label")
    load_fn = transforms.load_fn()

    from adell_mri_tpu.train.precision import wrap_apply

    # --precision bf16: params + inputs cast to the compute dtype,
    # outputs return to f32 (same policy as training)
    apply = wrap_apply(model.apply, getattr(args, "precision", None))

    @jax.jit
    def predict(x):
        logits, cat_preds, cont_pred, _ = apply(
            {"params": params}, x[None]
        )
        return (
            logits[0],
            [c[0] for c in cat_preds],
            cont_pred[0] if cont_pred is not None else None,
        )

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
        logits, cat_preds, cont_pred = predict(sample["image"])
        logits = np.asarray(logits)
        if args.prediction_type == "logit":
            pred = logits.tolist()
        elif n_classes == 2:
            pred = float(jax.nn.sigmoid(logits[0]))
        else:
            pred = np.asarray(jax.nn.softmax(logits)).tolist()
        if args.exclude_surrogate_variables or (
            not cat_preds and cont_pred is None
        ):
            out[pid] = pred
        else:
            # surrogate-head predictions ride along unless excluded
            # (parity: ref --exclude_surrogate_variables; the classifier
            # itself never sees the surrogate subspace here)
            out[pid] = {
                "prediction": pred,
                "cat_surrogates": [
                    int(np.argmax(np.asarray(c))) for c in cat_preds
                ],
                "cont_surrogates": (
                    np.asarray(cont_pred).tolist()
                    if cont_pred is not None
                    else None
                ),
            }
    with open(args.output_path, "w") as f:
        json.dump(out, f)
    print(json.dumps(out))
