"""
``adell segmentation test`` — evaluate checkpoints on a test set.

Parity target: adell_mri/entrypoints/segmentation/test.py: per-checkpoint
whole-volume metrics (Dice/IoU) plus optional lesion-level PI-CAI eval.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from adell_mri_tpu.config.factories import get_segmentation_network
from adell_mri_tpu.data import Dataset
from adell_mri_tpu.entrypoints.assemble_args import Parser
from adell_mri_tpu.eval import evaluate as picai_evaluate
from adell_mri_tpu.eval.metrics import dice_score, iou_score
from adell_mri_tpu.train.checkpoints import CheckpointManager
from adell_mri_tpu.train.logging_utils import MetricLogger
from adell_mri_tpu.transforms import SegmentationTransforms
from adell_mri_tpu.utils import get_logger

logger = get_logger(__name__)

ARG_KEYS = [
    "dataset_json",
    ("image_keys", "image_keys", dict(required=False, default=None)),
    "mask_keys",
    "test_ids",
    "checkpoint_dir",
    "checkpoint_name",
    "n_classes",
    "picai_eval",
    "metric_path",
    "dev",
    "seed",
    "segmentation_net_type",
    "precision",
]


def main(arguments):
    parser = Parser(prog="adell segmentation test")
    parser.add_argument_by_key(ARG_KEYS)
    args = parser.parse_args(arguments)

    from adell_mri_tpu.parallel.mesh import use_device

    use_device(args.dev)

    mngr = CheckpointManager(
        args.checkpoint_dir, name=args.checkpoint_name or "segmentation", fold=0
    )
    metadata = mngr.load_metadata()
    net_cfg = metadata.get("network_config", {})
    t_args = metadata.get("transform_arguments", {})
    n_classes = metadata.get("n_classes", args.n_classes)
    net_type = metadata.get("net_type", args.segmentation_net_type)
    image_keys = args.image_keys or t_args.get("image_keys", ["image"])
    label_keys = args.mask_keys or t_args.get("label_keys", ["label"])

    model = get_segmentation_network(
        net_type, net_cfg, n_classes=n_classes,
        n_input_branches=len(image_keys),
    )
    size = tuple(t_args.get("target_size"))
    skip_keys = t_args.get("skip_keys") or []
    feature_keys = t_args.get("feature_keys") or []
    x0 = np.zeros((1,) + size + (len(image_keys),), np.float32)
    init_kwargs = {}
    if skip_keys:
        init_kwargs["x_skip_layer"] = np.zeros(
            (1,) + size + (len(skip_keys),), np.float32
        )
    if feature_keys:
        init_kwargs["x_feature_conditioning"] = np.zeros(
            (1, len(feature_keys)), np.float32
        )
    params0 = model.init(
        {"params": jax.random.PRNGKey(0)}, x0, **init_kwargs
    )["params"]
    restored = mngr.restore(mngr.best_step(), target={"params": params0})
    params = restored["params"]
    # imported reference checkpoints carry BatchNorm running statistics
    # (interop mapping) — restore them so norm_type='batch' models eval
    # with the reference's running-average semantics
    raw = mngr.restore(mngr.best_step())
    batch_stats = None
    if isinstance(raw, dict):
        # top-level in imported reference checkpoints; under "variables"
        # in our own training checkpoints (TrainState.variables)
        batch_stats = raw.get("batch_stats") or (
            raw.get("variables") or {}
        ).get("batch_stats")

    transforms = SegmentationTransforms(
        image_keys=image_keys,
        label_keys=label_keys,
        target_spacing=t_args.get("target_spacing"),
        target_size=size,
        resize_size=t_args.get("resize_size"),
        skip_keys=skip_keys,
        feature_keys=feature_keys,
        # training-time intensity/label semantics (ADC rescale, mask
        # binarization) from checkpoint metadata
        adc_keys=t_args.get("adc_keys") or (),
        positive_labels=t_args.get("positive_labels") or (1,),
    )
    load_fn = transforms.load_fn()

    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    # --precision bf16: bf16 params + inputs for eval throughput; the
    # predicted probabilities return to f32 before metrics
    from adell_mri_tpu.train.precision import compute_dtype

    bf16 = compute_dtype(getattr(args, "precision", None)) is not None
    if bf16:
        variables = {
            "params": jax.tree.map(
                lambda a: a.astype(jnp.bfloat16), variables["params"]
            ),
            **{k: variables[k] for k in variables if k != "params"},
        }

    # 2D checkpoints evaluate 3D volumes slice-wise: every z-slice rides
    # the batch axis and the prediction volume is reassembled (parity:
    # SlicesToFirst + collate_last_slice at test, ref test.py:211-212)
    spatial_dims = int(net_cfg.get("spatial_dimensions", 3))

    @jax.jit
    def predict(x, *cond):
        if bf16:
            x = x.astype(jnp.bfloat16)
            # conditioning inputs too — an f32 skip volume would promote
            # the decoder concat back to f32 and lose the bf16 path
            cond = tuple(c.astype(jnp.bfloat16) for c in cond)
        kwargs = {}
        if skip_keys:
            kwargs["x_skip_layer"] = cond[0][None]
        if feature_keys:
            kwargs["x_feature_conditioning"] = cond[-1][None]
        if spatial_dims == 2 and x.ndim == 4:
            slices = jnp.moveaxis(x, -2, 0)  # [Z, X, Y, C]
            pred, *_ = model.apply(variables, slices, **kwargs)
            return jnp.moveaxis(pred, 0, -2).astype(jnp.float32)
        pred, *_ = model.apply(variables, x[None], **kwargs)
        return pred[0].astype(jnp.float32)

    data = Dataset(args.dataset_json)
    pids = args.test_ids or list(data.keys())
    dices, ious, preds, labels = [], [], [], []
    for pid in pids:
        if pid not in data.dataset:
            continue
        sample = load_fn({**data[pid], "identifier": pid})
        cond = []
        if skip_keys:
            cond.append(sample["skip_layer"])
        if feature_keys:
            cond.append(sample["features"])
        pred_full = np.asarray(predict(sample["image"], *cond))
        lab = sample["label"]
        if n_classes and n_classes > 2:
            # channel 0 is softmax BACKGROUND — evaluate per foreground
            # class on the argmax map (channel 0 alone would score P(bg))
            cls_map = np.argmax(pred_full, axis=-1)
            per_dice, per_iou = [], []
            for c in range(1, n_classes):
                per_dice.append(
                    dice_score((cls_map == c).astype(np.float32), lab == c)
                )
                per_iou.append(
                    iou_score((cls_map == c).astype(np.float32), lab == c)
                )
            dices.append(float(np.mean(per_dice)))
            ious.append(float(np.mean(per_iou)))
            prob = 1.0 - pred_full[..., 0]  # foreground prob for PI-CAI
        else:
            prob = pred_full[..., 0]
            dices.append(dice_score(prob, lab))
            ious.append(iou_score(prob, lab))
        if args.picai_eval:
            preds.append(prob)
            labels.append((lab > 0).astype(np.float32))
    results = {
        "dice": float(np.mean(dices)),
        "iou": float(np.mean(ious)),
        "n_cases": len(dices),
    }
    if args.picai_eval and preds:
        m = picai_evaluate(
            preds,
            labels,
            # parity: the reference's get_lesions default postprocess —
            # a binary x > 0.1 map (segmentation/pl.py:75-95)
            y_det_postprocess_func=lambda y: y > 0.1,
        )
        results.update({"AP": m.AP, "auroc": m.auroc, "score": m.score})
    MetricLogger(csv_path=args.metric_path).log_metrics(results, step=0)
    print(json.dumps(results))
