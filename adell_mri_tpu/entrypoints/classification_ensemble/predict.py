"""
``adell classification_ensemble predict``.

Parity target: adell_mri/entrypoints/classification_ensemble/predict.py —
rebuild the GenericEnsemble from checkpoint metadata and emit per-case
probabilities as JSON/CSV.
"""

import json

import jax
import numpy as np

from adell_mri_tpu.config.factories import get_classification_network
from adell_mri_tpu.data import Dataset
from adell_mri_tpu.entrypoints.assemble_args import Parser
from adell_mri_tpu.models.classification import GenericEnsemble
from adell_mri_tpu.train.checkpoints import CheckpointManager
from adell_mri_tpu.transforms import ClassificationTransforms
from adell_mri_tpu.utils import get_logger

logger = get_logger(__name__)

ARG_KEYS = [
    "dataset_json",
    ("image_keys", "image_keys", dict(required=False, default=None)),
    "prediction_ids",
    "checkpoint_dir",
    "checkpoint_name",
    "output_path",
    "dev",
    "precision",
    "seed",
]


def build_ensemble_from_metadata(checkpoint_dir, checkpoint_name):
    """Shared rebuild for predict/test: (model, params, metadata)."""
    mngr = CheckpointManager(
        checkpoint_dir, name=checkpoint_name or "ensemble", fold=0
    )
    meta = mngr.load_metadata()
    n_classes = meta.get("n_classes", 2)
    members = [
        get_classification_network(
            meta.get("net_type", "cat"),
            {**cfg, "feature_extraction": True},
            n_classes=n_classes,
        )
        for cfg in meta.get("member_configs", [])
    ]
    if not members:
        raise ValueError(
            "checkpoint metadata lacks member_configs — retrain with the "
            "current classification_ensemble train"
        )
    model = GenericEnsemble(networks=members, n_classes=n_classes)
    t_args = meta["transform_arguments"]
    size = tuple(t_args["target_size"])
    x0 = np.zeros(
        (1,) + size + (len(t_args["image_keys"]),), np.float32
    )
    params0 = model.init({"params": jax.random.PRNGKey(0)}, x0)["params"]
    params = mngr.restore(mngr.best_step(), target={"params": params0})[
        "params"
    ]
    return model, params, meta


def main(arguments):
    parser = Parser(prog="adell classification_ensemble predict")
    parser.add_argument_by_key(ARG_KEYS)
    args = parser.parse_args(arguments)

    from adell_mri_tpu.parallel.mesh import use_device

    use_device(args.dev)

    model, params, meta = build_ensemble_from_metadata(
        args.checkpoint_dir, args.checkpoint_name
    )
    t_args = meta["transform_arguments"]
    n_classes = meta.get("n_classes", 2)
    transforms = ClassificationTransforms(
        image_keys=args.image_keys or t_args["image_keys"],
        label_key=None,
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
    pids = args.prediction_ids or list(data.keys())
    results = {}
    for pid in pids:
        if pid not in data.dataset:
            continue
        sample = load_fn({**data[pid], "identifier": pid})
        prob = np.asarray(predict(sample["image"]))
        results[pid] = prob.tolist() if prob.ndim else float(prob)
        logger.info("%s -> %s", pid, results[pid])
    out = json.dumps(results)
    if args.output_path:
        with open(args.output_path, "w") as f:
            f.write(out)
    print(out)
