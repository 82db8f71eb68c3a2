"""
``adell detection predict`` — decode + NMS to a JSON of boxes per case
(parity: entrypoints/detection/predict.py).
"""

import json

import jax
import numpy as np

from adell_mri_tpu.data import Dataset, read_nifti, reorient_to_ras
from adell_mri_tpu.entrypoints.assemble_args import Parser
from adell_mri_tpu.models.detection import YOLONet3d, nms_3d
from adell_mri_tpu.train.checkpoints import CheckpointManager
from adell_mri_tpu.transforms.host import resample_to_spec

ARG_KEYS = [
    ("dataset_json", "dataset_json", dict(required=False, default=None)),
    ("image_keys", "image_keys", dict(required=False, default=None)),
    "sequence_paths",
    "prediction_ids",
    "checkpoint_dir",
    "checkpoint_name",
    "output_path",
    "iou_threshold",
    "dev",
    "seed",
]


def main(arguments):
    parser = Parser(prog="adell detection predict")
    parser.add_argument_by_key(ARG_KEYS)
    args = parser.parse_args(arguments)

    from adell_mri_tpu.parallel.mesh import use_device

    use_device(args.dev)

    mngr = CheckpointManager(
        args.checkpoint_dir, name=args.checkpoint_name or "detection", fold=0
    )
    meta = mngr.load_metadata()
    anchors = np.asarray(meta["anchors"], np.float32)
    base_size = tuple(meta["input_shape"])
    target_spacing = meta.get("target_spacing")
    image_keys = args.image_keys or meta.get("image_keys", ["image"])
    model = YOLONet3d(
        n_anchors=len(anchors),
        n_classes=meta.get("n_classes", 2),
        backbone_structure=[tuple(b) for b in meta["backbone_structure"]],
        norm_type="instance",
    )
    x0 = np.zeros((1,) + base_size + (len(image_keys),), np.float32)
    params0 = model.init({"params": jax.random.PRNGKey(0)}, x0)["params"]
    params = mngr.restore(mngr.best_step(), target={"params": params0})["params"]

    @jax.jit
    def forward(x):
        return model.apply({"params": params}, x[None])

    # --sequence_paths predicts one case from explicit file paths without
    # a dataset JSON (parity: ref detection/predict.py:65-70)
    if args.sequence_paths is not None:
        if len(args.sequence_paths) != len(image_keys):
            raise ValueError(
                "sequence_paths and image_keys must have the same length"
            )
        dataset = {"case": dict(zip(image_keys, args.sequence_paths))}
    elif args.dataset_json:
        dataset = Dataset(args.dataset_json).dataset
    else:
        raise ValueError("one of --dataset_json/--sequence_paths is required")
    out = {}
    for pid in args.prediction_ids or list(dataset):
        if pid not in dataset:
            continue
        channels = []
        for key in image_keys:
            img = reorient_to_ras(read_nifti(dataset[pid][key]))
            # the TRAINING spacing (checkpoint metadata) — native
            # spacing would change object scale vs the anchors
            vol = resample_to_spec(img, target_spacing, base_size)
            lo, hi = vol.min(), vol.max()
            channels.append((vol - lo) / max(hi - lo, 1e-6))
        x = np.stack(channels, -1).astype(np.float32)
        preds = forward(x)
        preds = {k: v[0] for k, v in preds.items()}
        boxes, scores = YOLONet3d.recover_boxes(
            preds, anchors, base_size, threshold=0.5
        )
        if len(boxes):
            boxes, scores, _ = nms_3d(boxes, scores, args.iou_threshold)
        out[pid] = {
            "boxes": boxes.tolist(),
            "scores": scores.tolist(),
        }
    with open(args.output_path, "w") as f:
        json.dump(out, f)
    print(json.dumps({k: len(v["boxes"]) for k, v in out.items()}))
