"""
``adell classification_deconfounder predict`` — per-case probabilities/
logits to JSON (parity: entrypoints/classification_deconfounder/predict.py,
including the ``--checkpoint`` x ``--prediction_ids`` matrix,
``--one_to_one`` and ``--ensemble mean|median`` via
utils/prediction_utils.py:6; the ensemble aggregates the scalar/softmax
prediction only — surrogate-head outputs stay per-checkpoint).
"""

import json

import jax
import numpy as np

from adell_mri_tpu.data import Dataset
from adell_mri_tpu.entrypoints.assemble_args import Parser
from adell_mri_tpu.entrypoints.classification_deconfounder.test import (
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
    # outputs return to f32 (same policy as training); variables ride as a
    # traced argument so every checkpoint shares one compiled program
    apply = wrap_apply(model.apply, getattr(args, "precision", None))

    # the ensemble path needs scalar/list predictions, so surrogate-head
    # outputs are suppressed there (they are per-checkpoint diagnostics)
    with_surrogates = not args.exclude_surrogate_variables and (
        args.ensemble is None
    )

    @jax.jit
    def predict(variables, x):
        logits, cat_preds, cont_pred, _ = apply(variables, x[None])
        return (
            logits[0],
            [c[0] for c in cat_preds],
            cont_pred[0] if cont_pred is not None else None,
        )

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
        logits, cat_preds, cont_pred = predict(variables, sample["image"])
        logits = np.asarray(logits)
        if args.prediction_type == "logit":
            pred = logits.tolist()
        elif n_classes == 2:
            pred = float(jax.nn.sigmoid(logits[0]))
        else:
            pred = np.asarray(jax.nn.softmax(logits)).tolist()
        if not with_surrogates or (not cat_preds and cont_pred is None):
            return pred
        # surrogate-head predictions ride along unless excluded
        # (parity: ref --exclude_surrogate_variables; the classifier
        # itself never sees the surrogate subspace here)
        return {
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
