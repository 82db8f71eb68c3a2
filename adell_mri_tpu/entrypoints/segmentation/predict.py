"""
``adell segmentation predict``.

Parity target: adell_mri/entrypoints/segmentation/predict.py (SURVEY.md
§3.4): rebuild transforms from checkpoint metadata, sliding-window +
flip-TTA + MC-dropout + checkpoint ensembling, inverse resample to the
original geometry (the Invertd analogue), async NIfTI writing with copied
header geometry.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from adell_mri_tpu.config.factories import get_segmentation_network
from adell_mri_tpu.data import Dataset, read_nifti, reorient_to_ras
from adell_mri_tpu.data.nifti import reorient_from_ras
from adell_mri_tpu.data.writer import AsyncNiftiWriter
from adell_mri_tpu.entrypoints.assemble_args import Parser
from adell_mri_tpu.inference import SegmentationInference
from adell_mri_tpu.train.checkpoints import CheckpointManager
from adell_mri_tpu.transforms.host import resample_to_spec
from adell_mri_tpu.utils import get_logger

logger = get_logger(__name__)

ARG_KEYS = [
    "dataset_json",
    ("image_keys", "image_keys", dict(required=False, default=None)),
    "prediction_ids",
    "checkpoint_dir",
    "checkpoint_name",
    "checkpoint",
    "output_path",
    "sliding_window_size",
    "sliding_window_stride",
    "flip_tta",
    "mc_iterations",
    "dev",
    "seed",
    "n_classes",
    "prediction_type",
    "segmentation_net_type",
    "precision",
]


def _select_fold(checkpoint_dir: str, name: str, fold: int) -> int:
    """``--fold -1`` picks the fold whose best.json has the best monitored
    value (parity: the reference's best-checkpoint selection across folds;
    VERDICT r1 flagged the hardcoded fold 0)."""
    import glob
    import json as _json

    if fold >= 0:
        return fold
    candidates = []
    modes = []
    for c in sorted(glob.glob(os.path.join(checkpoint_dir, f"{name}_fold*"))):
        bj = os.path.join(c, "best.json")
        if not os.path.exists(bj):
            continue
        with open(bj) as f:
            val = _json.load(f).get("value")
        try:
            f_idx = int(c.rsplit("_fold", 1)[1])
        except ValueError:
            continue
        meta = os.path.join(c, "metadata.json")
        mode = None
        if os.path.exists(meta):
            with open(meta) as f:
                md = _json.load(f)
            mode = md.get("mode") or (
                "min" if "loss" in md.get("monitor", "val_loss") else "max"
            )
        if val is not None:
            candidates.append((f_idx, val))
            modes.append(mode)
    if not candidates:
        logger.info("no fold best.json found, defaulting to fold 0")
        return 0
    # one comparison direction for the whole run: the first fold that
    # recorded one (folds missing metadata must not flip the direction)
    known = [m for m in modes if m is not None]
    mode = known[0] if known else "min"
    best_fold, best_val = min(
        candidates, key=lambda fv: fv[1] if mode == "min" else -fv[1]
    )
    logger.info("selected fold %d (best %s, mode %s)", best_fold, best_val, mode)
    return best_fold


def main(arguments):
    parser = Parser(prog="adell segmentation predict")
    parser.add_argument_by_key(ARG_KEYS)
    parser.add_argument(
        "--fold", type=int, default=0,
        help="checkpoint fold to predict with; -1 picks the fold with the "
        "best monitored value",
    )
    parser.add_argument(
        "--keep_ras", action="store_true",
        help="write predictions on the RAS grid instead of inverting back "
        "to the source file's voxel layout",
    )
    # postprocessing (parity: the reference predict's threshold /
    # keep_largest_connected_component / extract_lesions flags)
    parser.add_argument("--threshold", type=float, default=0.5)
    parser.add_argument(
        "--keep_largest_connected_component", action="store_true",
        help="binary predictions keep only the largest foreground component",
    )
    parser.add_argument(
        "--extract_lesions", action="store_true",
        help="write the PI-CAI lesion-candidate map (labelled components "
        "with per-lesion confidence) instead of the raw output",
    )
    args = parser.parse_args(arguments)

    from adell_mri_tpu.parallel.mesh import use_device

    use_device(args.dev)

    # checkpoint + metadata (transform args travel with the weights)
    name = args.checkpoint_name or "segmentation"
    fold = _select_fold(args.checkpoint_dir, name, args.fold)
    mngr = CheckpointManager(
        args.checkpoint_dir, name=name, fold=fold
    )
    metadata = mngr.load_metadata()
    net_cfg = metadata.get("network_config", {})
    t_args = metadata.get("transform_arguments", {})
    n_classes = metadata.get("n_classes", args.n_classes)
    net_type = metadata.get("net_type", args.segmentation_net_type)
    image_keys = args.image_keys or t_args.get("image_keys", ["image"])
    target_spacing = t_args.get("target_spacing")
    target_size = t_args.get("target_size")
    resize_size = t_args.get("resize_size")

    model = get_segmentation_network(
        net_type, net_cfg, n_classes=n_classes,
        n_input_branches=len(image_keys),
    )
    # 2D checkpoints run slice-wise over 3D volumes (parity: SlicesToFirst
    # + collate_last_slice at predict, ref predict.py:209-210)
    spatial_dims = int(net_cfg.get("spatial_dimensions", 3))
    example_spatial = (
        tuple(target_size)[:2] if spatial_dims == 2 else tuple(target_size)
    )
    x0 = np.zeros(
        (1,) + example_spatial + (len(image_keys),), np.float32
    )
    # conditioning inputs must be present at init so the restore target
    # carries the conditioned branches' params
    meta_skip = t_args.get("skip_keys") or []
    meta_feat = t_args.get("feature_keys") or []
    init_kwargs = {}
    if meta_skip:
        init_kwargs["x_skip_layer"] = np.zeros(
            (1,) + tuple(target_size) + (len(meta_skip),), np.float32
        )
    if meta_feat:
        init_kwargs["x_feature_conditioning"] = np.zeros(
            (1, len(meta_feat)), np.float32
        )
    params0 = model.init(
        {"params": jax.random.PRNGKey(0)}, x0, **init_kwargs
    )["params"]

    steps = [mngr.best_step()] if not args.checkpoint else None
    # each entry is a full variables dict: imported reference checkpoints
    # carry BatchNorm running stats next to the params
    param_list = []

    def _restore_variables(m, step):
        grafted = m.restore(step, target={"params": params0})
        raw = m.restore(step)
        var = {"params": grafted["params"]}
        if isinstance(raw, dict):
            # running stats live top-level in imported reference
            # checkpoints and under "variables" in our own training
            # checkpoints (TrainState.variables)
            bs = raw.get("batch_stats") or (
                raw.get("variables") or {}
            ).get("batch_stats")
            if bs:
                var["batch_stats"] = bs
        return var

    if steps:
        for s in steps:
            param_list.append(_restore_variables(mngr, s))
    else:
        for path in args.checkpoint:
            sub = CheckpointManager(os.path.dirname(path), name=os.path.basename(path).replace("_fold0", ""), fold=0)
            param_list.append(_restore_variables(sub, sub.best_step()))

    # --precision bf16: bf16 params + inputs double MXU throughput and
    # halve HBM traffic at inference; outputs (probabilities) return to
    # f32 before TTA/sliding-window accumulation
    from adell_mri_tpu.train.precision import compute_dtype

    bf16 = compute_dtype(getattr(args, "precision", None)) is not None
    if bf16:
        param_list = [
            {
                "params": jax.tree.map(
                    lambda a: a.astype(jnp.bfloat16), v["params"]
                ),
                **{k: v[k] for k in v if k != "params"},
            }
            for v in param_list
        ]

    def base_fn(variables, x, rng=None):
        rngs = {"dropout": rng} if rng is not None else None
        if bf16:
            x = x.astype(jnp.bfloat16)
        if spatial_dims == 2 and x.ndim == 4:
            # single 3D volume [X, Y, Z, C] -> all z-slices as the batch
            slices = jnp.moveaxis(x, -2, 0)
            pred, *_ = model.apply(
                variables, slices, train=rng is not None, rngs=rngs
            )
            return jnp.moveaxis(pred.astype(jnp.float32), 0, -2)
        pred, *_ = model.apply(
            variables,
            x if x.ndim == len(target_size) + 2 else x[None],
            train=rng is not None,
            rngs=rngs,
        )
        pred = pred.astype(jnp.float32)
        return pred if x.ndim == len(target_size) + 2 else pred[0]

    # multi-chip: shard the sliding-window tile grid over a pure-DP mesh
    # (sliding_window_inference_sharded); single chip keeps the one-jit
    # scan path
    sw_mesh = None
    if args.sliding_window_size and spatial_dims == 2:
        logger.warning(
            "--sliding_window_size is a 3D windowing option; 2D "
            "checkpoints predict slice-wise — ignoring it"
        )
        args.sliding_window_size = None
    if args.sliding_window_size and len(jax.devices()) > 1:
        from adell_mri_tpu.parallel.mesh import make_mesh

        sw_mesh = make_mesh()
        logger.info(
            "sliding-window tiles sharded over %d devices",
            sw_mesh.shape["data"],
        )
    # the CLI flag is a float: values <= 1 are window fractions (1.0 =
    # no overlap), values > 1 are absolute voxels (int-typed downstream,
    # the reference's type convention, inference.py:862-866)
    sw_stride = args.sliding_window_stride
    if sw_stride > 1:
        sw_stride = int(sw_stride)
    inference = SegmentationInference(
        base_inference_function=base_fn,
        checkpoint_params=param_list,
        sliding_window_size=args.sliding_window_size,
        stride=sw_stride,
        flip=args.flip_tta,
        mc_iterations=args.mc_iterations,
        n_classes=n_classes,
        rng=jax.random.PRNGKey(args.seed),
        mesh=sw_mesh,
    )

    # conditioning recorded at train time (skip images / scalar features):
    # the conditioned forward runs whole-volume (train enforces no crops
    # with conditioning, so the volume IS the model's input grid)
    skip_keys = t_args.get("skip_keys") or []
    feature_keys = t_args.get("feature_keys") or []
    if skip_keys or feature_keys:
        # the conditioned branch runs a single whole-volume forward with
        # param_list[0]; inference-composition flags would be silently
        # ignored, so say so loudly
        ignored = []
        if len(param_list) > 1:
            ignored.append("multi-checkpoint ensembling")
        if args.flip_tta:
            ignored.append("--flip_tta")
        if args.mc_iterations:
            ignored.append("--mc_iterations")
        if ignored:
            logger.warning(
                "conditioned prediction (skip/feature keys recorded at "
                "train time) bypasses SegmentationInference; ignoring: %s",
                ", ".join(ignored),
            )
        from adell_mri_tpu.transforms.host import make_load_fn

        skip_load_fn = (
            make_load_fn(
                image_keys=skip_keys,
                label_keys=None,
                target_spacing=target_spacing,
                target_size=target_size,
            )
            if skip_keys
            else None
        )

    data = Dataset(args.dataset_json)
    pids = args.prediction_ids or list(data.keys())
    adc_key_set = set(t_args.get("adc_keys") or ())
    os.makedirs(args.output_path, exist_ok=True)
    writer = AsyncNiftiWriter()
    for pid in pids:
        if pid not in data.dataset:
            continue
        entry = data[pid]
        channels = []
        ref_img = None
        orig_affine = None
        for key in image_keys:
            raw = read_nifti(entry[key])
            if orig_affine is None:
                orig_affine = raw.affine.copy()
            img = reorient_to_ras(raw)
            ref_img = ref_img or img
            if resize_size:
                # mirror the training load: Spacingd -> Resized(area)
                # -> pad/crop (transforms/host.py make_load_fn)
                from adell_mri_tpu.transforms.host import (
                    area_resize,
                    center_crop_pad,
                )

                vol = resample_to_spec(img, target_spacing, None)
                vol = area_resize(vol, resize_size)
                if target_size is not None and tuple(target_size) != tuple(
                    resize_size
                ):
                    vol = center_crop_pad(vol, target_size)
            else:
                vol = resample_to_spec(img, target_spacing, target_size)
            if key in adc_key_set:
                # ADC conditional rescale, NOT min-max (the training
                # load path, transforms/host.py:300-306 — min-max here
                # silently fed the model a differently-scaled ADC)
                if vol.max() > 1e3:
                    vol = vol * (-2.0 / 3.0)
                channels.append(vol)
            else:
                lo, hi = vol.min(), vol.max()
                channels.append((vol - lo) / max(hi - lo, 1e-6))
        x = np.stack(channels, axis=-1).astype(np.float32)
        if skip_keys or feature_keys:
            cond_kwargs = {}
            if skip_keys:
                # load through the same make_load_fn path train/test use so
                # skip inputs see the identical scale_intensity min-max
                # normalization they saw at training time
                cond_kwargs["x_skip_layer"] = skip_load_fn(entry)["image"][
                    None
                ].astype(np.float32)
            if feature_keys:
                cond_kwargs["x_feature_conditioning"] = np.asarray(
                    [[float(entry[k]) for k in feature_keys]], np.float32
                )
            xc = x[None]
            if bf16:
                # cast window AND conditioning inputs so the forward stays
                # on the bf16 MXU path (probabilities return to f32 below)
                xc = xc.astype(jnp.bfloat16)
                cond_kwargs = {
                    k: jnp.asarray(v).astype(jnp.bfloat16)
                    for k, v in cond_kwargs.items()
                }
            pred, *_ = model.apply(param_list[0], xc, **cond_kwargs)
            prob = np.asarray(pred[0].astype(jnp.float32))
        else:
            prob = np.asarray(inference(x))
        # inverse resample back to original geometry (Invertd analogue).
        # Binary: one sigmoid channel. Multiclass: channel 0 is softmax
        # BACKGROUND — foreground probability is 1 - P(bg) and masks come
        # from argmax over classes (writing channel 0 would emit P(bg))
        if n_classes and n_classes > 2:
            prob_fg = 1.0 - prob[..., 0]
            class_map = np.argmax(prob, axis=-1).astype(np.float32)
        else:
            prob_fg = prob[..., 0]
            class_map = None
        inv = _invert_geometry(
            prob_fg, ref_img, target_spacing, resize_size=resize_size
        )
        if class_map is not None:
            inv_cls = np.rint(
                _invert_geometry(
                    class_map, ref_img, target_spacing,
                    resize_size=resize_size,
                )
            )
        if args.keep_ras:
            out, affine = inv, ref_img.affine
            out_cls = inv_cls if class_map is not None else None
        else:
            # back to the source file's voxel layout (byte-layout parity
            # with the reference's Invertd)
            out = reorient_from_ras(inv, orig_affine)
            affine = orig_affine
            out_cls = (
                reorient_from_ras(inv_cls, orig_affine)
                if class_map is not None
                else None
            )
        out_path = os.path.join(args.output_path, f"{pid}_prob.nii.gz")
        if args.extract_lesions:
            from adell_mri_tpu.eval.lesion import extract_lesion_candidates

            cand_map, _, _ = extract_lesion_candidates(
                out, threshold="dynamic"
            )
            writer.put(out_path, cand_map.astype(np.float32), affine)
        elif args.prediction_type == "probability":
            writer.put(out_path, out.astype(np.float32), affine)
        elif out_cls is not None:
            # multiclass mask: argmax class ids
            writer.put(out_path, out_cls.astype(np.uint8), affine)
            logger.info("predicted %s -> %s", pid, out_path)
            continue
        else:
            hard = (out > args.threshold).astype(np.uint8)
            if args.keep_largest_connected_component:
                from scipy import ndimage as _ndi

                labelled, n = _ndi.label(hard)
                if n > 1:
                    sizes = _ndi.sum(hard, labelled, range(1, n + 1))
                    hard = (labelled == (int(np.argmax(sizes)) + 1)).astype(
                        np.uint8
                    )
            writer.put(out_path, hard, affine)
        logger.info("predicted %s -> %s", pid, out_path)
    writer.close()


def _invert_geometry(pred, ref_img, target_spacing, resize_size=None):
    """Maps a prediction on the (spacing[, resize], size) grid back to ref
    voxels. With ``resize_size``, the forward path scaled the
    spacing-resampled grid to resize_size (area mode) before any crop —
    the inverse composes the scale factor into the coordinate map."""
    from scipy import ndimage

    orig_shape = ref_img.data.shape[:3]
    spacing = ref_img.spacing
    if target_spacing is None:
        target_spacing = spacing
    zoom = np.asarray(spacing, float) / np.asarray(target_spacing, float)
    resampled_shape = np.round(np.asarray(orig_shape) * zoom).astype(int)
    if resize_size is not None:
        scale = np.asarray(resize_size, float) / np.maximum(
            resampled_shape, 1
        )
        offset = (np.asarray(resize_size) - np.asarray(pred.shape)) / 2.0
    else:
        scale = np.ones(3)
        offset = (resampled_shape - np.asarray(pred.shape)) / 2.0
    coords = np.indices(orig_shape).astype(np.float32)
    for d in range(3):
        coords[d] = coords[d] * zoom[d] * scale[d] - offset[d]
    return ndimage.map_coordinates(pred, coords, order=1, mode="constant")
