"""
``adell classification predict`` — per-case probabilities/logits/features
to JSON (parity: entrypoints/classification/predict.py).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from adell_mri_tpu.config.factories import get_classification_network
from adell_mri_tpu.data import Dataset
from adell_mri_tpu.entrypoints.assemble_args import Parser
from adell_mri_tpu.train.checkpoints import CheckpointManager
from adell_mri_tpu.transforms import ClassificationTransforms

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
    "seed",
    "classification_net_type",
    "precision",
]


def main(arguments):
    parser = Parser(prog="adell classification predict")
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
    feat_keys = t_args.get("clinical_feature_keys", []) or []

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
    params = mngr.restore(mngr.best_step(), target={"params": params0})["params"]
    raw = mngr.restore(mngr.best_step())
    batch_stats = raw.get("batch_stats") if isinstance(raw, dict) else None
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    # --precision bf16: bf16 params + inputs (logits return to f32); the
    # alias table (bf16-mixed, 16-true, ...) matches training
    from adell_mri_tpu.train.precision import compute_dtype

    bf16 = compute_dtype(getattr(args, "precision", None)) is not None
    if bf16:
        variables = {
            "params": jax.tree.map(
                lambda a: a.astype(jnp.bfloat16), variables["params"]
            ),
            **{k: variables[k] for k in variables if k != "params"},
        }


    transforms = ClassificationTransforms(
        image_keys=image_keys,
        label_key=t_args.get("label_key", "label"),
        target_spacing=t_args.get("target_spacing"),
        target_size=size,
        resize_size=t_args.get("resize_size"),
        clinical_feature_keys=feat_keys,
    )
    base_load = transforms.load_fn()

    # GP-head mean-field correction when a fitted covariance is present
    # (parity: classification/pl.py:381-392 + SNGP predictive variance)
    gp_cov_path = os.path.join(mngr.dir, "gp_covariance.npy")
    gp_cov = np.load(gp_cov_path) if os.path.exists(gp_cov_path) else None

    if gp_cov is not None:
        from adell_mri_tpu.models.layers.gaussian_process import (
            predictive_logits,
        )

        cov = jax.numpy.asarray(gp_cov)

        @jax.jit
        def predict(x, *feats):
            if bf16:
                x = x.astype(jnp.bfloat16)
                feats = tuple(f.astype(jnp.bfloat16) for f in feats)
            extra = tuple(f[None] for f in feats)
            logits, inter = model.apply(
                variables, x[None], *extra,
                mutable=["intermediates"],
            )
            logits = logits.astype(jnp.float32)
            phi = jax.tree.leaves(inter)[0]
            phi = phi[0] if phi.ndim == 3 else phi
            return predictive_logits(logits, phi, cov)[0]

    else:

        @jax.jit
        def predict(x, *feats):
            if bf16:
                x = x.astype(jnp.bfloat16)
                feats = tuple(f.astype(jnp.bfloat16) for f in feats)
            extra = tuple(f[None] for f in feats)
            logits = model.apply(variables, x[None], *extra)[0]
            return logits.astype(jnp.float32)

    # conformal prediction sets (parity: predict_calibrated_step,
    # classification/pl.py:438-459) from the train-time calibration
    aps = None
    if args.prediction_type == "set":
        from adell_mri_tpu.models.layers.conformal import (
            AdaptivePredictionSets,
        )

        conf_path = os.path.join(mngr.dir, "conformal.json")
        if not os.path.exists(conf_path):
            raise FileNotFoundError(
                f"--prediction_type set needs {conf_path}; train with "
                "--calibration_ids first"
            )
        with open(conf_path) as f:
            conf = json.load(f)
        aps = AdaptivePredictionSets(alpha=conf.get("alpha", 0.2))
        aps.q_hat = conf["q_hat"]

    data = Dataset(args.dataset_json)
    pids = args.prediction_ids or list(data.keys())
    out = {}
    for pid in pids:
        if pid not in data.dataset:
            continue
        entry = {**data[pid], "identifier": pid}
        if t_args.get("label_key", "label") not in entry:
            entry[t_args.get("label_key", "label")] = 0
        sample = base_load(entry)
        cond = (sample["features"],) if feat_keys else ()
        logits = np.asarray(predict(sample["image"], *cond))
        if args.prediction_type == "logit":
            out[pid] = logits.tolist()
        elif args.prediction_type == "set":
            if n_classes == 2:
                p1 = float(jax.nn.sigmoid(logits[0]))
                probs = np.asarray([[1.0 - p1, p1]])
            else:
                probs = np.asarray(jax.nn.softmax(logits))[None]
            members = aps(probs)[0]
            out[pid] = [int(i) for i in np.nonzero(members)[0]]
        elif n_classes == 2:
            out[pid] = float(jax.nn.sigmoid(logits[0]))
        else:
            out[pid] = np.asarray(jax.nn.softmax(logits)).tolist()
    with open(args.output_path, "w") as f:
        json.dump(out, f)
    print(json.dumps(out))
