"""
``adell classification_mil predict`` — per-case probabilities/logits to
JSON (parity: entrypoints/classification_mil/predict.py, including the
``--checkpoint`` x ``--prediction_ids`` matrix, ``--one_to_one`` and
``--ensemble mean|median`` via utils/prediction_utils.py:6).
"""

import json

import jax
import numpy as np

from adell_mri_tpu.data import Dataset
from adell_mri_tpu.entrypoints.assemble_args import Parser
from adell_mri_tpu.entrypoints.classification_mil.test import (
    _rebuild_for_checkpoints,
)
from adell_mri_tpu.entrypoints.prediction_utils import (
    prediction_id_groups,
    resolve_checkpoint_variables,
    run_prediction_matrix,
)

ARG_KEYS = [
    "dataset_json",
    ("image_keys", "image_keys", dict(required=False, default=None)),
    "prediction_ids",
    "checkpoint_dir",
    "checkpoint_name",
    "checkpoint",
    "one_to_one",
    "ensemble",
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
    model, mngr, params0, transforms, t_args, n_classes = (
        _rebuild_for_checkpoints(args)
    )
    checkpoints = resolve_checkpoint_variables(args.checkpoint, mngr, params0)
    label_key = t_args.get("label_key", "label")
    load_fn = transforms.load_fn()
    # unlabeled cases get a placeholder the label mapping accepts
    _lg = t_args.get("label_groups")
    _pl = t_args.get("possible_labels")
    placeholder_label = _lg[0][0] if _lg else (_pl[0] if _pl else 0)

    from adell_mri_tpu.train.precision import wrap_apply

    # --precision bf16: params + inputs cast to the compute dtype,
    # logits return to f32 (same policy as training); variables ride as a
    # traced argument so every checkpoint shares one compiled program
    apply = wrap_apply(model.apply, getattr(args, "precision", None))

    @jax.jit
    def predict(variables, x):
        return apply(variables, x[None])[0]

    data = Dataset(args.dataset_json)
    groups = prediction_id_groups(args.prediction_ids, data)
    from adell_mri_tpu.entrypoints.prediction_utils import (
        sample_cache_is_reused,
    )

    cache_reused = sample_cache_is_reused(
        groups, len(checkpoints), args.one_to_one
    )
    cache = {}

    def predict_one(variables, pid, label):
        entry = {**data[pid], "identifier": pid}
        if label_key not in entry:
            entry[label_key] = placeholder_label
        if pid in cache:
            sample = cache[pid]
        else:
            sample = load_fn(entry)
            if cache_reused:
                cache[pid] = sample
        logits = np.asarray(predict(variables, sample["image"]))
        if args.prediction_type == "logit":
            return logits.tolist()
        if n_classes == 2:
            return float(jax.nn.sigmoid(logits[0]))
        return np.asarray(jax.nn.softmax(logits)).tolist()

    legacy = (
        not args.checkpoint
        and args.ensemble is None
        and not args.one_to_one
        and len(groups) == 1
    )
    global_output = run_prediction_matrix(
        groups,
        checkpoints,
        predict_one,
        one_to_one=args.one_to_one,
        ensemble=args.ensemble,
    )
    out = global_output[0]["predictions"] if legacy else global_output
    with open(args.output_path, "w") as f:
        json.dump(out, f)
    print(json.dumps(out))
