"""
``adell classification predict`` — per-case probabilities/logits/features
to JSON (parity: entrypoints/classification/predict.py).

Multi-checkpoint surface (predict.py:194-266): ``--checkpoint`` run dirs x
``--prediction_ids`` groups, ``--one_to_one`` (checkpoint i serves group i),
``--ensemble mean|median`` appends an aggregate record
(utils/prediction_utils.py:6). With any of those the output is the
reference's list-of-records schema; the plain single-checkpoint call keeps
the flat ``{id: value}`` map.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from adell_mri_tpu.config.factories import get_classification_network
from adell_mri_tpu.data import Dataset
from adell_mri_tpu.entrypoints.assemble_args import Parser
from adell_mri_tpu.entrypoints.prediction_utils import (
    prediction_id_groups,
    resolve_checkpoint_variables,
    run_prediction_matrix,
)
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
    "checkpoint",
    "one_to_one",
    "ensemble",
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
    checkpoints = resolve_checkpoint_variables(
        args.checkpoint, mngr, params0
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

    prediction_type = args.prediction_type
    if args.ensemble is not None and prediction_type == "set":
        # conformal sets are variable-length member lists; elementwise
        # mean/median over them is meaningless (and np.stack raises an
        # opaque shape error) — reject the combination up front
        raise ValueError(
            "--ensemble cannot aggregate --prediction_type set outputs; "
            "ensemble the probabilities instead and calibrate on them"
        )
    if prediction_type == "pre_bias" and net_type != "ord":
        # parity: predict.py:141-146 — warn and fall back
        logger.warning(
            "Net type must be ord for pre_bias, using probability instead"
        )
        prediction_type = "probability"

    transforms = ClassificationTransforms(
        image_keys=image_keys,
        label_key=t_args.get("label_key", "label"),
        target_spacing=t_args.get("target_spacing"),
        target_size=size,
        resize_size=t_args.get("resize_size"),
        clinical_feature_keys=feat_keys,
        # training-time label semantics (prediction ignores the label,
        # but the loader must not crash on non-numeric label values)
        positive_labels=t_args.get("positive_labels"),
        possible_labels=t_args.get("possible_labels"),
        label_groups=t_args.get("label_groups"),
        adc_keys=t_args.get("adc_keys") or (),
        mask_key=t_args.get("mask_key"),
        image_masking=bool(t_args.get("image_masking")),
        image_crop_from_mask=bool(t_args.get("image_crop_from_mask")),
    )
    base_load = transforms.load_fn()

    # GP-head mean-field correction when a fitted covariance is present
    # (parity: classification/pl.py:381-392 + SNGP predictive variance);
    # per-checkpoint covariances ride as a traced argument so every
    # checkpoint shares the one compiled program
    def _gp_cov(label):
        path = os.path.join(label, "gp_covariance.npy")
        return np.load(path) if os.path.exists(path) else None

    covs = {label: _gp_cov(label) for label, _ in checkpoints}
    use_gp = any(c is not None for c in covs.values())
    if use_gp and prediction_type in ("features", "pre_bias"):
        # the GP mean-field correction only makes sense for probability
        # outputs; the user explicitly asked for raw network outputs, so
        # the fitted covariance is skipped rather than hijacking the
        # requested prediction_type
        logger.info(
            "gp_covariance.npy present but --prediction_type %s requests "
            "raw outputs; skipping the GP correction",
            prediction_type,
        )
        use_gp = False
    if use_gp:
        from adell_mri_tpu.models.layers.gaussian_process import (
            predictive_logits,
        )

        cov_dim = next(c for c in covs.values() if c is not None).shape[0]

        @jax.jit
        def predict(variables, cov, x, *feats):
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
            # zero covariance -> zero variance -> identity correction,
            # so checkpoints without a fitted covariance pass through
            return predictive_logits(logits, phi, cov)[0]

    else:
        extra_kwargs = {}
        if prediction_type == "features":
            extra_kwargs = {"return_features": True}
        elif prediction_type == "pre_bias":
            extra_kwargs = {"return_only_pre_bias": True}
        if extra_kwargs:
            # fail with a clear CLI error instead of a TypeError inside
            # jit when the net's __call__ lacks the kwarg (e.g. the ViT
            # classifiers take no return_features)
            import inspect

            sig = inspect.signature(type(model).__call__)
            missing = [k for k in extra_kwargs if k not in sig.parameters]
            if missing:
                raise ValueError(
                    f"--prediction_type {prediction_type} is not supported "
                    f"by net_type {net_type!r} ({type(model).__name__} "
                    f"takes no {missing[0]})"
                )

        @jax.jit
        def predict(variables, cov, x, *feats):
            if bf16:
                x = x.astype(jnp.bfloat16)
                feats = tuple(f.astype(jnp.bfloat16) for f in feats)
            extra = tuple(f[None] for f in feats)
            out = model.apply(variables, x[None], *extra, **extra_kwargs)[0]
            return out.astype(jnp.float32)

    # conformal prediction sets (parity: predict_calibrated_step,
    # classification/pl.py:438-459) from the train-time calibration
    aps = None
    if prediction_type == "set":
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
    groups = prediction_id_groups(args.prediction_ids, data)
    label_key = t_args.get("label_key", "label")
    cov_by_label = {
        label: (
            jnp.asarray(covs[label])
            if covs[label] is not None
            else jnp.zeros((cov_dim, cov_dim), jnp.float32)
        )
        if use_gp
        else None
        for label, _ in checkpoints
    }
    # multiclass probability outputs: ordinal nets emit cumulative
    # threshold logits, converted like the train-time callback (plain
    # softmax over them is wrong); everything else softmaxes
    if net_type == "ord":
        from adell_mri_tpu.models.classification.losses import (
            ordinal_to_class_probs as _class_probs,
        )
    else:
        _class_probs = jax.nn.softmax

    from adell_mri_tpu.entrypoints.prediction_utils import (
        sample_cache_is_reused,
    )

    cache_reused = sample_cache_is_reused(
        groups, len(checkpoints), args.one_to_one
    )
    cache = {}

    # unlabeled cases get a placeholder the label mapping accepts
    # (0 is not in e.g. possible_labels=["a","b"] and would KeyError)
    _lg = t_args.get("label_groups")
    _pl = t_args.get("possible_labels")
    placeholder_label = _lg[0][0] if _lg else (_pl[0] if _pl else 0)

    def predict_one(variables, pid, label):
        entry = {**data[pid], "identifier": pid}
        if label_key not in entry:
            entry[label_key] = placeholder_label
        if pid in cache:
            sample = cache[pid]
        else:
            sample = base_load(entry)
            if cache_reused:
                cache[pid] = sample
        cond = (sample["features"],) if feat_keys else ()
        cov_args = (cov_by_label[label],) if use_gp else (None,)
        out = np.asarray(predict(variables, *cov_args, sample["image"], *cond))
        if prediction_type in ("logit", "features", "pre_bias"):
            return out.tolist()
        if prediction_type == "set":
            if n_classes == 2:
                p1 = float(jax.nn.sigmoid(out[0]))
                probs = np.asarray([[1.0 - p1, p1]])
            else:
                probs = np.asarray(_class_probs(out))[None]
            members = aps(probs)[0]
            return [int(i) for i in np.nonzero(members)[0]]
        if n_classes == 2:
            return float(jax.nn.sigmoid(out[0]))
        return np.asarray(_class_probs(out)).tolist()

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

    if legacy:
        out = global_output[0]["predictions"]
    else:
        out = global_output
    with open(args.output_path, "w") as f:
        json.dump(out, f)
    print(json.dumps(out))
