"""
``adell detection train``.

Parity target: adell_mri/entrypoints/detection/train.py: dataset JSON with
corner boxes per case (box_key/box_class_key/shape_key), anchors from CSV,
YOLONet3d + composite loss, mAP validation.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from adell_mri_tpu.data import (
    CachedVolumeDataset,
    DataLoader,
    Dataset,
    RandomSampler,
    read_nifti,
    reorient_to_ras,
)
from adell_mri_tpu.entrypoints.assemble_args import Parser
from adell_mri_tpu.entrypoints.segmentation.train import get_folds
from adell_mri_tpu.models.detection import (
    YOLONet3d,
    boxes_to_anchor_targets,
    load_anchors_csv,
    yolo_loss,
)
from adell_mri_tpu.parallel.mesh import get_devices, mesh_for_batch
from adell_mri_tpu.train import (
    TrainState,
    cosine_annealing_with_warmup,
    get_optimizer,
    make_eval_step,
    make_train_step,
)
from adell_mri_tpu.train.checkpoints import CheckpointManager
from adell_mri_tpu.train.logging_utils import MetricLogger
from adell_mri_tpu.train.loop import TrainLoop
from adell_mri_tpu.transforms.host import resample_to_spec
from adell_mri_tpu.config.parsing import load_yaml
from adell_mri_tpu.utils import get_logger

logger = get_logger(__name__)

ARG_KEYS = [
    "dataset_json",
    "image_keys",
    "box_key",
    "box_class_key",
    "anchor_csv",
    "augment",
    "filter_on_keys",
    "cache_rate",
    "cache_dir",
    "target_spacing",
    "pad_size",
    "config_file",
    "dev",
    "precision",
    "seed",
    "max_epochs",
    "warmup_steps",
    "n_classes",
    "batch_size",
    "learning_rate",
    "optimizer",
    "n_folds",
    "checkpoint_dir",
    "checkpoint_name",
    "monitor",
    "metric_path",
]


def main(arguments):
    parser = Parser(prog="adell detection train")
    parser.add_argument_by_key(ARG_KEYS)
    args = parser.parse_args(arguments)

    data = Dataset(args.dataset_json, seed=args.seed)
    data.apply_filters(
        presence_keys=list(args.image_keys) + [args.box_key],
        filter_on_keys=args.filter_on_keys,
    )
    cfg = load_yaml(args.config_file) if args.config_file else {}
    batch_size = args.batch_size or cfg.get("batch_size", 2)
    learning_rate = args.learning_rate or cfg.get("learning_rate", 1e-3)
    anchors = (
        load_anchors_csv(args.anchor_csv)
        if args.anchor_csv
        else np.asarray(cfg.get("anchors", [[8.0, 8.0, 4.0]]), np.float32)
    )
    base_size = tuple(args.pad_size)
    backbone = [tuple(s) for s in cfg.get("backbone_structure", [(16, 16, 3, 1), (32, 32, 3, 1)])]
    model = YOLONet3d(
        n_anchors=len(anchors),
        n_classes=args.n_classes,
        backbone_structure=backbone,
        norm_type=cfg.get("norm_type", "instance"),
    )
    # grid shape from a dry forward
    x0 = np.zeros((1,) + base_size + (len(args.image_keys),), np.float32)
    params = model.init({"params": jax.random.PRNGKey(args.seed)}, x0)["params"]
    grid = jax.eval_shape(
        lambda p, x: model.apply({"params": p}, x)["objectness"], params, x0
    ).shape[1:-1]
    logger.info("anchor grid: %s", grid)

    MAX_BOXES = 16

    def load_fn(entry):
        channels = []
        ref_img = None
        for key in args.image_keys:
            img = reorient_to_ras(read_nifti(entry[key]))
            ref_img = ref_img or img
            vol = resample_to_spec(img, args.target_spacing, base_size)
            lo, hi = vol.min(), vol.max()
            channels.append((vol - lo) / max(hi - lo, 1e-6))
        image = np.stack(channels, axis=-1).astype(np.float32)
        boxes = np.asarray(entry[args.box_key], np.float32).reshape(-1, 6)
        # boxes are voxel coords of the RAS-reoriented source image; map
        # them through EXACTLY the resample_to_spec geometry the image
        # takes (spacing zoom then center crop/pad: dst = src*zoom - offset)
        spacing = np.asarray(ref_img.spacing, np.float32)
        tsp = np.asarray(
            args.target_spacing if args.target_spacing else spacing,
            np.float32,
        )
        zoom = spacing / tsp
        resampled = np.round(
            np.asarray(ref_img.data.shape[:3]) * zoom
        ).astype(np.float32)
        offset = (resampled - np.asarray(base_size, np.float32)) / 2.0
        boxes = np.concatenate(
            [boxes[:, :3] * zoom - offset, boxes[:, 3:] * zoom - offset],
            axis=1,
        )
        classes = np.asarray(
            entry.get(args.box_class_key, [1] * len(boxes)), np.float32
        )
        obj, ctr, sz, cls = boxes_to_anchor_targets(
            boxes, classes, grid, anchors, base_size,
            n_classes=args.n_classes,
        )
        # padded corner boxes ride along so geometric augmentation can warp
        # them with the image and re-rasterize on device
        n = min(len(boxes), MAX_BOXES)
        boxes_pad = np.zeros((MAX_BOXES, 6), np.float32)
        classes_pad = np.zeros((MAX_BOXES,), np.float32)
        boxes_pad[:n] = boxes[:n]
        classes_pad[:n] = classes[:n]
        return {
            "image": image,
            "objectness": np.moveaxis(obj, 0, -1),
            "center_offsets": np.moveaxis(ctr, 0, -1),
            "sizes": np.moveaxis(sz, 0, -1),
            "classes": np.moveaxis(cls, 0, -1),
            "boxes": boxes_pad,
            "box_classes": classes_pad,
            "n_boxes": np.int32(n),
        }

    folds = get_folds(list(data.keys()), args.n_folds, args.seed)
    train_pids, val_pids = folds[0]
    train_ds = CachedVolumeDataset(
        data.to_datalist(train_pids), load_fn, cache_rate=args.cache_rate,
        cache_dir=args.cache_dir,
        cache_fingerprint=repr(
            (sorted(args.image_keys), args.target_spacing, base_size,
             args.box_key, anchors.tolist(), grid, args.n_classes)
        ),
    )
    val_ds = CachedVolumeDataset(
        data.to_datalist(val_pids), load_fn, cache_rate=args.cache_rate,
        cache_dir=args.cache_dir,
        cache_fingerprint=repr(
            (sorted(args.image_keys), args.target_spacing, base_size,
             args.box_key, anchors.tolist(), grid, args.n_classes)
        ),
    )
    train_loader = DataLoader(
        train_ds, sampler=RandomSampler(len(train_ds), seed=args.seed),
        batch_size=batch_size, drop_last=True,
    )
    val_loader = DataLoader(
        val_ds, batch_size=max(1, min(batch_size, len(val_ds))), drop_last=True
    )

    platform, devices = get_devices(args.dev)
    mesh = mesh_for_batch(batch_size, devices)

    from adell_mri_tpu.train.precision import cast_floats, compute_dtype

    # --precision bf16: backbone forward in the compute dtype; YOLO loss
    # (CIoU, BCE) in f32 on upcast heads
    dtype = compute_dtype(getattr(args, "precision", None))

    def make_lm(train):
        def lm(params, batch, rng):
            rngs = {"dropout": rng} if train else None
            p, x = params, batch["image"]
            if dtype is not None:
                p, x = cast_floats(p, dtype), x.astype(dtype)
            preds = model.apply({"params": p}, x, train=train, rngs=rngs)
            if dtype is not None:
                preds = cast_floats(preds, jnp.float32)
            total, comp = yolo_loss(
                preds,
                {k: batch[k] for k in ("objectness", "center_offsets", "sizes", "classes")},
                n_classes=args.n_classes,
                # decoded-box CIoU regression + IoU objectness targets
                # (the reference composition; MSE fallback without these)
                anchors=anchors,
                input_shape=base_size,
            )
            return total, {"loss": total, **comp}

        return lm

    schedule = cosine_annealing_with_warmup(
        learning_rate,
        t_max=args.max_epochs * max(len(train_loader), 1),
        n_warmup_steps=args.warmup_steps,
    )
    tx = get_optimizer(args.optimizer, learning_rate=schedule, params=params)
    with mesh:
        state = TrainState.create(model.apply, params, tx)
    ckpt = CheckpointManager(
        args.checkpoint_dir,
        name=args.checkpoint_name or "detection",
        fold=0,
        metadata={
            "anchors": anchors.tolist(),
            "grid": list(grid),
            "input_shape": list(base_size),
            # predict must resample at the TRAINING spacing — without it
            # objects appear at a different scale than the anchors learned
            "target_spacing": (
                list(args.target_spacing) if args.target_spacing else None
            ),
            "n_classes": args.n_classes,
            "backbone_structure": [list(b) for b in backbone],
            "image_keys": list(args.image_keys),
        },
        monitor=args.monitor,
    )
    # fresh runs drop any stale best.json from a prior run
    ckpt.begin_run(resume=False)
    from adell_mri_tpu.transforms import AugmentPolicy
    from adell_mri_tpu.transforms.pipeline import DetectionTransforms

    det_transforms = DetectionTransforms(
        # reference detection factory (transform_factory/augmentations.py
        # :333-389): prob=0.1, rotate-only geometry [pi/16], no flips
        augmentations=AugmentPolicy.from_flags(
            args.augment,
            prob=0.1,
            rotate_range=(np.pi / 16, 0.0, 0.0),
            scale_range=0.0,
        ),
        anchors=anchors,
        grid_shape=grid,
        input_shape=base_size,
        n_classes=args.n_classes,
    )
    loop = TrainLoop(
        augment_fn=det_transforms.augment if args.augment else None,
        train_step=make_train_step(make_lm(True)),
        eval_step=make_eval_step(make_lm(False)),
        mesh=mesh,
        max_epochs=args.max_epochs,
        ckpt_manager=ckpt,
        metric_logger=MetricLogger(csv_path=args.metric_path),
        monitor=args.monitor,
        seed=args.seed,
    )
    state, history = loop.fit(state, train_loader, val_loader)
    logger.info("done: %s", json.dumps(history[-1] if history else {}, default=float))
