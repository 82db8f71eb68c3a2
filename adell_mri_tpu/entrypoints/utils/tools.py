"""
``adell utils`` subcommand implementations.

Parity targets: adell_mri/entrypoints/utils/{preprocessing,statistics,
dataset}/ — each function is one subcommand with its own argparse, matching
the reference's names and core flags.
"""

import argparse
import glob
import json
import os
import re
import sys
from typing import Dict, List

import numpy as np

from adell_mri_tpu.data import (
    Dataset,
    fill_conditional as _fill_conditional,
    read_nifti,
    reorient_to_ras,
    write_nifti,
)
from adell_mri_tpu.transforms.host import resample_to_spec


def generate_dataset_json(argv):
    """Builds {id: {key: path}} from per-key glob patterns."""
    p = argparse.ArgumentParser(prog="adell utils generate_dataset_json")
    p.add_argument("--input_paths", nargs="+", required=True,
                   help="key:glob pairs, e.g. image:/data/*/t2.nii.gz")
    p.add_argument("--output_json", required=True)
    p.add_argument("--id_pattern", default=r"([^/]+)/[^/]+$",
                   help="regex whose group 1 is the case id")
    args = p.parse_args(argv)
    out: Dict[str, Dict] = {}
    for spec in args.input_paths:
        key, pattern = spec.split(":", 1)
        for path in sorted(glob.glob(pattern)):
            m = re.search(args.id_pattern, path)
            pid = m.group(1) if m else os.path.basename(path)
            out.setdefault(pid, {})[key] = path
    with open(args.output_json, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {len(out)} entries to {args.output_json}")


def generate_image_dataset_json(argv):
    """One key, one folder of images -> dataset json."""
    p = argparse.ArgumentParser(prog="adell utils generate_image_dataset_json")
    p.add_argument("--input_path", required=True)
    p.add_argument("--key", default="image")
    p.add_argument("--output_json", required=True)
    p.add_argument("--pattern", default="*.nii.gz")
    args = p.parse_args(argv)
    out = {}
    for path in sorted(glob.glob(os.path.join(args.input_path, args.pattern))):
        pid = os.path.basename(path).split(".")[0]
        out[pid] = {args.key: path}
    with open(args.output_json, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {len(out)} entries")


def generate_json_from_csv(argv):
    p = argparse.ArgumentParser(prog="adell utils generate_json_from_csv")
    p.add_argument("--input_csv", required=True)
    p.add_argument("--id_column", required=True)
    p.add_argument("--output_json", required=True)
    args = p.parse_args(argv)
    import pandas as pd

    df = pd.read_csv(args.input_csv)
    out = {
        str(row[args.id_column]): {
            k: v for k, v in row.items() if k != args.id_column
        }
        for _, row in df.iterrows()
    }
    with open(args.output_json, "w") as f:
        json.dump(out, f, indent=1, default=str)
    print(f"wrote {len(out)} entries")


def merge_json_datasets(argv):
    p = argparse.ArgumentParser(prog="adell utils merge_json_datasets")
    p.add_argument("--input_jsons", nargs="+", required=True)
    p.add_argument("--output_json", required=True)
    args = p.parse_args(argv)
    out: Dict[str, Dict] = {}
    for path in args.input_jsons:
        with open(path) as f:
            for k, v in json.load(f).items():
                out.setdefault(k, {}).update(v)
    with open(args.output_json, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {len(out)} entries")


def fill_with_condition(argv):
    p = argparse.ArgumentParser(prog="adell utils fill_with_condition")
    p.add_argument("--input_json", required=True)
    p.add_argument("--filters", nargs="+", required=True,
                   help="fill_key:value^check_key:value")
    p.add_argument("--output_json", required=True)
    args = p.parse_args(argv)
    with open(args.input_json) as f:
        D = json.load(f)
    D = _fill_conditional(D, args.filters)
    with open(args.output_json, "w") as f:
        json.dump(D, f, indent=1)


def get_test_set_and_folds(argv):
    p = argparse.ArgumentParser(prog="adell utils get_test_set_and_folds")
    p.add_argument("--input_json", required=True)
    p.add_argument("--test_fraction", type=float, default=0.2)
    p.add_argument("--n_folds", type=int, default=5)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--stratify_key", default=None)
    p.add_argument("--output_prefix", required=True)
    args = p.parse_args(argv)
    ds = Dataset(args.input_json, seed=args.seed)
    pids = np.asarray(list(ds.keys()))
    rng = np.random.default_rng(args.seed)
    idx = rng.permutation(len(pids))
    n_test = int(len(pids) * args.test_fraction)
    test = pids[idx[:n_test]].tolist()
    rest = pids[idx[n_test:]]
    folds = np.array_split(rng.permutation(rest), args.n_folds)
    with open(args.output_prefix + "_test.txt", "w") as f:
        f.write("\n".join(test))
    for i, fold in enumerate(folds):
        with open(f"{args.output_prefix}_fold{i}.txt", "w") as f:
            f.write("\n".join(fold.tolist()))
    print(f"test: {len(test)} / folds: {[len(f) for f in folds]}")


def remove_constant_masks(argv):
    p = argparse.ArgumentParser(prog="adell utils remove_constant_masks")
    p.add_argument("--input_json", required=True)
    p.add_argument("--mask_key", required=True)
    p.add_argument("--output_json", required=True)
    args = p.parse_args(argv)
    with open(args.input_json) as f:
        D = json.load(f)
    keep = {}
    for pid, entry in D.items():
        if args.mask_key not in entry:
            continue
        try:
            data = read_nifti(entry[args.mask_key]).data
            if data.max() != data.min():
                keep[pid] = entry
        except Exception:
            continue
    with open(args.output_json, "w") as f:
        json.dump(keep, f, indent=1)
    print(f"kept {len(keep)}/{len(D)}")


def get_mask_coordinates(argv):
    p = argparse.ArgumentParser(prog="adell utils get_mask_coordinates")
    p.add_argument("--input_json", required=True)
    p.add_argument("--mask_key", required=True)
    p.add_argument("--output_json", required=True)
    args = p.parse_args(argv)
    with open(args.input_json) as f:
        D = json.load(f)
    out = {}
    for pid, entry in D.items():
        if args.mask_key not in entry:
            continue
        data = read_nifti(entry[args.mask_key]).data
        pos = np.argwhere(data > 0)
        if len(pos) == 0:
            out[pid] = None
        else:
            lo, hi = pos.min(0), pos.max(0) + 1
            out[pid] = lo.tolist() + hi.tolist()
    with open(args.output_json, "w") as f:
        json.dump(out, f, indent=1)


def get_label_size(argv):
    p = argparse.ArgumentParser(prog="adell utils get_label_size")
    p.add_argument("--input_json", required=True)
    p.add_argument("--mask_key", required=True)
    args = p.parse_args(argv)
    with open(args.input_json) as f:
        D = json.load(f)
    for pid, entry in D.items():
        if args.mask_key not in entry:
            continue
        img = read_nifti(entry[args.mask_key])
        voxels = int((img.data > 0).sum())
        vol = voxels * float(np.prod(img.spacing))
        print(f"{pid},{voxels},{vol:.2f}")


def compare_masks(argv):
    p = argparse.ArgumentParser(prog="adell utils compare_masks")
    p.add_argument("--input_json", required=True)
    p.add_argument("--mask_keys", nargs=2, required=True)
    args = p.parse_args(argv)
    from adell_mri_tpu.eval.metrics import dice_score, iou_score

    with open(args.input_json) as f:
        D = json.load(f)
    k1, k2 = args.mask_keys
    for pid, entry in D.items():
        if k1 not in entry or k2 not in entry:
            continue
        a = read_nifti(entry[k1]).data
        b = read_nifti(entry[k2]).data
        print(f"{pid},{dice_score(a, b):.4f},{iou_score(a, b):.4f}")


def match_to_mask(argv):
    p = argparse.ArgumentParser(prog="adell utils match_to_mask")
    p.add_argument("--input_json", required=True)
    p.add_argument("--image_key", required=True)
    p.add_argument("--mask_key", required=True)
    args = p.parse_args(argv)
    with open(args.input_json) as f:
        D = json.load(f)
    for pid, entry in D.items():
        if args.image_key not in entry or args.mask_key not in entry:
            continue
        a = read_nifti(entry[args.image_key])
        b = read_nifti(entry[args.mask_key])
        same = a.data.shape[:3] == b.data.shape[:3]
        print(f"{pid},{'match' if same else 'MISMATCH'}")


def resample_image(argv):
    p = argparse.ArgumentParser(prog="adell utils resample_image")
    p.add_argument("--input_path", required=True)
    p.add_argument("--output_path", required=True)
    p.add_argument("--spacing", nargs=3, type=float, required=True)
    p.add_argument("--is_label", action="store_true")
    args = p.parse_args(argv)
    img = reorient_to_ras(read_nifti(args.input_path))
    out = resample_to_spec(
        img, target_spacing=args.spacing,
        interp_order=0 if args.is_label else 1,
    )
    affine = np.diag(list(args.spacing) + [1.0])
    affine[:3, 3] = img.affine[:3, 3]
    write_nifti(args.output_path, out, affine)
    print(f"{img.data.shape} -> {out.shape}")


def resample_volumes_and_masks(argv):
    p = argparse.ArgumentParser(prog="adell utils resample_volumes_and_masks")
    p.add_argument("--input_json", required=True)
    p.add_argument("--image_keys", nargs="+", required=True)
    p.add_argument("--mask_keys", nargs="+", default=[])
    p.add_argument("--spacing", nargs=3, type=float, required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--output_json", required=True)
    args = p.parse_args(argv)
    with open(args.input_json) as f:
        D = json.load(f)
    os.makedirs(args.output_dir, exist_ok=True)
    out = {}
    for pid, entry in D.items():
        new_entry = dict(entry)
        for key in list(args.image_keys) + list(args.mask_keys):
            if key not in entry:
                continue
            img = reorient_to_ras(read_nifti(entry[key]))
            res = resample_to_spec(
                img, target_spacing=args.spacing,
                interp_order=0 if key in args.mask_keys else 1,
            )
            affine = np.diag(list(args.spacing) + [1.0])
            affine[:3, 3] = img.affine[:3, 3]
            path = os.path.join(args.output_dir, f"{pid}_{key}.nii.gz")
            write_nifti(path, res, affine)
            new_entry[key] = path
        out[pid] = new_entry
    with open(args.output_json, "w") as f:
        json.dump(out, f, indent=1)
    print(f"resampled {len(out)} cases")


def merge_masks(argv):
    p = argparse.ArgumentParser(prog="adell utils merge_masks")
    p.add_argument("--input_paths", nargs="+", required=True)
    p.add_argument("--output_path", required=True)
    p.add_argument("--mode", default="max", choices=["max", "sum", "vote"])
    args = p.parse_args(argv)
    imgs = [read_nifti(path) for path in args.input_paths]
    stack = np.stack([i.data for i in imgs])
    if args.mode == "max":
        merged = stack.max(0)
    elif args.mode == "sum":
        merged = stack.sum(0)
    else:
        merged = (stack.mean(0) > 0.5).astype(np.uint8)
    write_nifti(args.output_path, merged, imgs[0].affine)
    print(f"merged {len(imgs)} masks")


def bias_field_correction(argv):
    """
    Homomorphic bias correction: divide by a heavily smoothed version of
    the volume (N4 analogue without SimpleITK; parity in purpose with
    preprocessing/bias_field_correction).
    """
    p = argparse.ArgumentParser(prog="adell utils bias_field_correction")
    p.add_argument("--input_path", required=True)
    p.add_argument("--output_path", required=True)
    p.add_argument("--sigma_mm", type=float, default=30.0)
    args = p.parse_args(argv)
    from scipy import ndimage

    img = read_nifti(args.input_path)
    data = img.data.astype(np.float64)
    positive = np.clip(data, np.percentile(data[data > 0], 1), None)
    log_img = np.log(positive)
    sigma_vox = args.sigma_mm / np.maximum(img.spacing, 1e-3)
    smooth = ndimage.gaussian_filter(log_img, sigma_vox)
    corrected = np.exp(log_img - smooth + smooth.mean())
    write_nifti(args.output_path, corrected.astype(np.float32), img.affine)
    print("bias-corrected", args.input_path)


def describe_image(argv):
    """Prints image geometry + intensity summary (parity:
    utils/dataset/describe_sitk.py — size/spacing/origin/direction/
    components/pixel type/unique values; ``describe_sitk`` is an alias;
    ``--paths`` accepted as the reference spelling)."""
    p = argparse.ArgumentParser(prog="adell utils describe_image")
    p.add_argument(
        "--input_paths", "--paths", dest="input_paths", nargs="+",
        required=True,
    )
    args = p.parse_args(argv)
    for path in args.input_paths:
        img = read_nifti(path)
        data = img.data
        desc = {
            "path": path,
            "shape": list(data.shape),
            "spacing": [round(float(s), 4) for s in img.spacing],
            # origin/direction from the RAS affine (the reference prints
            # SimpleITK's LPS equivalents; axes flips aside, same info)
            "origin": [round(float(o), 4) for o in img.affine[:3, 3]],
            "direction": [
                round(float(d), 6)
                for d in (
                    img.affine[:3, :3] / img.spacing[None, :]
                ).flatten()
            ],
            "n_components": int(data.shape[3]) if data.ndim == 4 else 1,
            "pixel_type": str(data.dtype),
            "min": float(data.min()),
            "max": float(data.max()),
            "mean": float(data.mean()),
        }
        u, c = np.unique(data, return_counts=True)
        if u.shape[0] > 5:
            desc["n_unique_values"] = int(u.shape[0])
        else:
            desc["unique_values"] = [
                [float(i), int(j)] for i, j in zip(u, c)
            ]
        print(json.dumps(desc))


def describe_sitk(argv):
    """Reference-name alias (utils/dataset/describe_sitk.py)."""
    describe_image(argv)


def bb_to_anchors(argv):
    """K-means anchors from dataset boxes (parity: dataset/bb_to_anchors)."""
    p = argparse.ArgumentParser(prog="adell utils bb_to_anchors")
    p.add_argument("--input_json", required=True)
    p.add_argument("--box_key", default="boxes")
    p.add_argument("--n_anchors", type=int, default=3)
    p.add_argument("--output_csv", required=True)
    args = p.parse_args(argv)
    from sklearn.cluster import KMeans

    with open(args.input_json) as f:
        D = json.load(f)
    sizes = []
    for entry in D.values():
        for box in entry.get(args.box_key, []):
            box = np.asarray(box, float)
            ndim = len(box) // 2
            sizes.append(box[ndim:] - box[:ndim])
    sizes = np.asarray(sizes)
    km = KMeans(n_clusters=args.n_anchors, n_init=10, random_state=0).fit(sizes)
    with open(args.output_csv, "w") as f:
        for c in km.cluster_centers_:
            f.write(",".join(f"{x:.2f}" for x in c) + "\n")
    print(f"wrote {args.n_anchors} anchors from {len(sizes)} boxes")


def bb_to_distances(argv):
    """
    Minimum inter-box centre distances per image from a bounding-box CSV
    (parity: dataset/bb_to_distances). CSV rows:
    ``image_id,<2*dim box coords>,<dim shape>,class``.
    """
    p = argparse.ArgumentParser(prog="adell utils bb_to_distances")
    p.add_argument("--input_path", required=True)
    p.add_argument("--spatial_dim", type=int, default=3, choices=[2, 3])
    args = p.parse_args(argv)
    dim = args.spatial_dim
    boxes: Dict[str, List] = {}
    with open(args.input_path) as f:
        for line in f:
            parts = line.strip().split(",")
            if len(parts) < 2 * dim + 2:
                continue
            boxes.setdefault(parts[0], []).append(
                np.asarray(parts[1 : 1 + 2 * dim], float)
            )
    dists = []
    for image_id, bb in boxes.items():
        if len(bb) < 2:
            continue
        centers = np.stack([(b[:dim] + b[dim:]) / 2 for b in bb])
        d = np.linalg.norm(centers[:, None] - centers[None], axis=-1)
        np.fill_diagonal(d, np.inf)  # eye*inf would 0*inf-NaN off-diagonal
        dists.append(float(d.min()))
    if dists:
        q = np.quantile(dists, [0.05, 0.25, 0.5, 0.75, 0.95])
        print(
            json.dumps(
                {
                    "n_images_with_multiple_boxes": len(dists),
                    "min": float(np.min(dists)),
                    "quantiles_5_25_50_75_95": [float(x) for x in q],
                }
            )
        )
    else:
        print(json.dumps({"n_images_with_multiple_boxes": 0}))


def generate_dicom_dataset_json(argv):
    """Walks study/series/*.dcm trees into the nested DICOM JSON (parity:
    dataset/generate_dicom_dataset_json)."""
    p = argparse.ArgumentParser(
        prog="adell utils generate_dicom_dataset_json"
    )
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_json", required=True)
    p.add_argument("--image_key", default="image")
    args = p.parse_args(argv)
    from adell_mri_tpu.data.dicom import generate_dicom_dataset_json as walk

    out = walk(args.input_dir, image_key=args.image_key)
    with open(args.output_json, "w") as f:
        json.dump(out, f, indent=1)
    n = sum(len(v) for study in out for v in study.values())
    print(f"wrote {len(out)} studies / {n} slices to {args.output_json}")


def inspect_dicom_dataset(argv):
    """Prints DICOM slices containing NaN/Inf pixels (parity:
    dataset/inspect_dicom_dataset)."""
    p = argparse.ArgumentParser(prog="adell utils inspect_dicom_dataset")
    p.add_argument("--json_path", required=True)
    args = p.parse_args(argv)
    from adell_mri_tpu.data.dicom import read_dicom

    with open(args.json_path) as f:
        data = json.load(f)
    studies = data if isinstance(data, list) else list(data.values())
    for study in studies:
        for entries in study.values():
            for entry in entries:
                arr, _ = read_dicom(entry["image"])
                n_nan = int(np.sum(np.isnan(arr)))
                n_inf = int(np.sum(np.isinf(arr)))
                if n_nan or n_inf:
                    print(
                        json.dumps(
                            {
                                "image": entry["image"],
                                "nan": n_nan,
                                "inf": n_inf,
                                "min": float(np.nanmin(arr)),
                                "max": float(np.nanmax(arr)),
                            }
                        )
                    )


def describe_dicom_dataset(argv):
    """Summary statistics over a nested DICOM dataset JSON (parity:
    dataset/describe_dicom_dataset)."""
    p = argparse.ArgumentParser(prog="adell utils describe_dicom_dataset")
    p.add_argument("--json_path", required=True)
    args = p.parse_args(argv)
    from adell_mri_tpu.data.dicom import read_dicom

    with open(args.json_path) as f:
        data = json.load(f)
    studies = data if isinstance(data, list) else list(data.values())
    n_series = 0
    n_slices = 0
    shapes = []
    means = []
    for study in studies:
        for entries in study.values():
            n_series += 1
            n_slices += len(entries)
            for entry in entries[:1]:  # one probe slice per series
                arr, _ = read_dicom(entry["image"])
                shapes.append(arr.shape)
                means.append(float(arr.mean()))
    print(
        json.dumps(
            {
                "n_studies": len(studies),
                "n_series": n_series,
                "n_slices": n_slices,
                "unique_shapes": sorted({str(s) for s in shapes}),
                "mean_intensity": float(np.mean(means)) if means else None,
            }
        )
    )


def get_image_examples(argv):
    """Renders preprocessed dataset entries to PNG panels (parity:
    dataset/get_image_examples)."""
    p = argparse.ArgumentParser(prog="adell utils get_image_examples")
    p.add_argument("--dataset_json", required=True)
    p.add_argument("--image_keys", nargs="+", required=True)
    p.add_argument("--target_spacing", nargs="+", type=float, default=None)
    p.add_argument("--crop_size", nargs="+", type=int, default=None)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--n_examples", type=int, default=8)
    args = p.parse_args(argv)
    from PIL import Image

    from adell_mri_tpu.transforms.host import resample_to_spec as _rts

    data = Dataset(args.dataset_json)
    data.filter_dictionary(filters_presence=list(args.image_keys))
    os.makedirs(args.output_dir, exist_ok=True)
    for pid in list(data.keys())[: args.n_examples]:
        entry = data[pid]
        case_dir = os.path.join(args.output_dir, pid)
        os.makedirs(case_dir, exist_ok=True)
        for key in args.image_keys:
            img = reorient_to_ras(read_nifti(entry[key]))
            vol = _rts(
                img,
                args.target_spacing,
                args.crop_size,
            )
            lo, hi = vol.min(), vol.max()
            vol8 = np.uint8((vol - lo) / max(hi - lo, 1e-6) * 255)
            for z in range(vol8.shape[2]):
                Image.fromarray(vol8[:, :, z]).save(
                    os.path.join(case_dir, f"{key}_{z}.png")
                )
    print(f"wrote examples to {args.output_dir}")


def get_temporal_test_set_and_folds(argv):
    """Prospective (date-ordered) test split + K folds on the rest (parity:
    dataset/get_temporal_test_set_and_folds)."""
    p = argparse.ArgumentParser(
        prog="adell utils get_temporal_test_set_and_folds"
    )
    p.add_argument("--dataset_json", required=True)
    p.add_argument("--date_key", required=True)
    p.add_argument("--n_folds", type=int, default=5)
    p.add_argument("--fraction_test", type=float, default=0.3)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)
    from sklearn.model_selection import KFold

    with open(args.dataset_json) as f:
        D = json.load(f)
    dated = [
        (pid, str(entry.get(args.date_key, "")))
        for pid, entry in D.items()
        if entry.get(args.date_key) is not None
    ]
    dated.sort(key=lambda kv: kv[1])
    n_test = int(len(dated) * args.fraction_test)
    test_ids = [pid for pid, _ in dated[len(dated) - n_test :]]
    rest = np.asarray([pid for pid, _ in dated[: len(dated) - n_test]])
    print("test," + ",".join(test_ids))
    kf = KFold(args.n_folds, shuffle=True, random_state=args.seed)
    for i, (_, val_idx) in enumerate(kf.split(rest)):
        print(f"cv{i+1}," + ",".join(rest[val_idx]))


def random_image_panel(argv):
    """Tiles random slices from dataset volumes into one PNG (parity:
    other/random_image_panel)."""
    p = argparse.ArgumentParser(prog="adell utils random_image_panel")
    p.add_argument("--dataset_json", required=True)
    p.add_argument("--image_key", default="image")
    p.add_argument("--output_path", required=True)
    p.add_argument("--n_images", type=int, default=16)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)
    from PIL import Image

    rng = np.random.default_rng(args.seed)
    data = Dataset(args.dataset_json)
    data.filter_dictionary(filters_presence=[args.image_key])
    pids = list(data.keys())
    rng.shuffle(pids)
    tiles = []
    for pid in pids[: args.n_images]:
        img = reorient_to_ras(read_nifti(data[pid][args.image_key]))
        z = int(rng.integers(img.data.shape[2]))
        sl = img.data[:, :, z]
        if sl.ndim == 3:
            sl = sl[..., 0]
        lo, hi = sl.min(), sl.max()
        tiles.append(np.uint8((sl - lo) / max(hi - lo, 1e-6) * 255))
    side = int(np.ceil(np.sqrt(len(tiles))))
    h = max(t.shape[0] for t in tiles)
    w = max(t.shape[1] for t in tiles)
    panel = np.zeros((side * h, side * w), np.uint8)
    for i, t in enumerate(tiles):
        r, c = divmod(i, side)
        panel[r * h : r * h + t.shape[0], c * w : c * w + t.shape[1]] = t
    Image.fromarray(panel).save(args.output_path)
    print(f"wrote {len(tiles)}-tile panel to {args.output_path}")


def test_exported_model(argv):
    """Loads a jax.export artifact and runs a random input through it
    (parity: other/test_traced_model for torchscript)."""
    p = argparse.ArgumentParser(prog="adell utils test_exported_model")
    p.add_argument("--model_path", required=True)
    p.add_argument("--batch_size", type=int, default=1)
    args = p.parse_args(argv)
    import jax.numpy as jnp

    from adell_mri_tpu.train.export import load_exported

    fn, meta = load_exported(args.model_path)
    shape = list(meta["input_shape"])
    shape[0] = args.batch_size
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=shape),
        dtype=meta.get("input_dtype", "float32"),
    )
    out = fn(x)
    leaves = out if isinstance(out, (tuple, list)) else [out]
    print(
        json.dumps(
            {
                "input_shape": shape,
                "output_shapes": [list(np.shape(o)) for o in leaves if o is not None],
            }
        )
    )


# reference CLI name parity (utils/__main__.py:35)
test_traced_model = test_exported_model


def import_torch_checkpoint(argv):
    """
    Migration path from the reference: converts a torch/Lightning
    checkpoint saved by adell-mri (UNet — reference unet.py:31 /
    segmentation/pl.py:668 — CatNet, classification.py:263, or
    ViTClassifier, classification.py:709) into an orbax checkpoint +
    metadata.json consumable by ``segmentation test|predict`` /
    ``classification test|predict`` here.
    Weight-transfer parity is exact (tests/test_reference_parity.py::
    test_*_weight_transfer_forward_parity).
    """
    p = argparse.ArgumentParser(prog="adell utils import_torch_checkpoint")
    p.add_argument("--input_path", required=True,
                   help="torch .pt/.ckpt file (raw state dict, "
                        "{'state_dict': ...}, or a Lightning checkpoint)")
    p.add_argument("--config_file", required=True,
                   help="network YAML (same file the model was trained "
                        "with: depth/conv_type/link_type/...)")
    p.add_argument("--net_type", default="unet",
                   choices=["unet", "cat", "vit", "unetr", "swin"])
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--checkpoint_name", default=None,
                   help="defaults to 'segmentation' / 'classification' "
                        "by net type")
    p.add_argument("--fold", type=int, default=0)
    p.add_argument("--image_keys", nargs="+", required=True)
    p.add_argument("--mask_keys", nargs="+", default=["mask"])
    p.add_argument("--label_key", default="label",
                   help="classification label key (net_type=cat)")
    p.add_argument("--target_spacing", nargs="+", type=float, default=None)
    p.add_argument("--target_size", nargs="+", type=int, required=True)
    p.add_argument("--n_classes", type=int, default=2)
    p.add_argument("--dev", default="cpu",
                   help="device for the structural-validation init "
                        "(conversion itself is host-side)")
    args = p.parse_args(argv)

    import jax

    from adell_mri_tpu.parallel.mesh import use_device

    use_device(args.dev)

    from adell_mri_tpu.config.factories import (
        get_classification_network,
        get_segmentation_network,
    )
    from adell_mri_tpu.config.parsing import load_yaml
    from adell_mri_tpu.interop import (
        import_reference_catnet,
        import_reference_unet_state_dict,
        import_reference_vit_state_dict,
        load_reference_state_dict,
    )
    from adell_mri_tpu.train.checkpoints import CheckpointManager

    sd = load_reference_state_dict(args.input_path)

    cfg = load_yaml(args.config_file)
    cfg = cfg.get("network", cfg)
    if args.net_type == "vit":
        # detect the embed variant from the checkpoint itself and record
        # it in the config so test/predict rebuild the identical tree
        cfg["embed_method"] = (
            "convolutional" if "embedding.conv.weight" in sd else "linear"
        )
        cfg["embed_norm"] = "embedding.map_to_out.1.weight" in sd
        cfg["use_seq_pool"] = "seqpool.embedding_layer.weight" in sd
        # exact transformer MLP widths from the checkpoint (mlp.0, mlp.2,
        # ... are the hidden linears; the last even index is the out proj)
        _mlp_keys = sorted(
            int(k.split(".")[-2])
            for k in sd
            if k.startswith("tbs.transformer_blocks.0.mlp.")
            and k.endswith(".weight")
        )
        if _mlp_keys:
            cfg["mlp_structure"] = [
                int(sd[f"tbs.transformer_blocks.0.mlp.{i}.weight"].shape[0])
                for i in _mlp_keys[:-1]
            ]
        imported = {
            "params": import_reference_vit_state_dict(
                sd,
                n_heads=cfg.get(
                    "n_heads", cfg.get("number_of_attention_heads", 4)
                ),
                n_blocks=cfg.get(
                    "n_blocks", cfg.get("number_of_blocks", 4)
                ),
            )
        }
    elif args.net_type == "cat":
        imported = import_reference_catnet(
            sd,
            resnet_structure=[
                tuple(s)
                for s in cfg.get(
                    "resnet_structure", ((64, 128, 5, 2), (128, 256, 3, 5))
                )
            ],
            classification_structure=cfg.get("classification_structure"),
            norm_type=cfg.get("norm_type", "batch"),
            activation_fn=cfg.get(
                "act_fn", cfg.get("activation_fn", "swish")
            ),
        )
    elif args.net_type == "unetr":
        from adell_mri_tpu.interop import import_reference_unetr_state_dict

        # geometry the compat module needs but the reference stores
        # outside the YAML: image size comes from --target_size;
        # attention_dim is read off the checkpoint's qkv width
        cfg["image_size"] = list(args.target_size)
        qkv = sd.get("vit.tbs.transformer_blocks.0.mha.qkv.weight")
        if qkv is not None:
            cfg["attention_dim"] = int(qkv.shape[0] // 3)
        # projecting embedding: read E off map_to_out's Linear
        proj = sd.get("vit.embedding.map_to_out.1.weight")
        if proj is not None:
            cfg["embedding_size"] = int(proj.shape[0])
        imported = import_reference_unetr_state_dict(
            sd,
            depth=cfg.get("depth", (16, 32, 64)),
            n_blocks=cfg.get("n_blocks", cfg.get("number_of_blocks", 8)),
            n_heads=cfg.get("n_heads", 8),
            return_at=cfg.get("return_at", (2, 4, 5)),
            link_type=cfg.get("link_type", "identity"),
            norm_type=cfg.get("norm_type", "instance"),
            activation_fn=cfg.get("activation_fn", "swish"),
        )
    elif args.net_type == "swin":
        from adell_mri_tpu.interop import import_reference_swin_state_dict

        cfg["image_size"] = list(args.target_size)
        # detect the embed variant from the checkpoint (the reference
        # records it nowhere outside the YAML)
        if "first_swin_block.stbs.0.embedding.conv.weight" in sd:
            cfg["embed_method"] = "convolutional"
        # blocks per stage from the checkpoint itself (arg_compliance
        # normalizes shift_sizes; counting stbs indices avoids trusting
        # the YAML's pre-normalization shape)
        depth = cfg.get("depth", (16, 32, 64))
        n_stack = []
        for s in range(len(depth)):
            prefix = (
                "first_swin_block.stbs."
                if s == 0
                else f"swin_blocks.{s - 1}.stbs."
            )
            idx = {
                int(k[len(prefix):].split(".")[0])
                for k in sd
                if k.startswith(prefix)
            }
            n_stack.append(max(idx) + 1 if idx else 0)
        imported = import_reference_swin_state_dict(
            sd,
            depth=depth,
            n_stack_blocks=n_stack,
            link_type=cfg.get("link_type", "identity"),
            norm_type=cfg.get("norm_type", "instance"),
            activation_fn=cfg.get("activation_fn", "swish"),
        )
    else:
        # defaults mirror the model factory's (_unet_kwargs) so the
        # mapped tree and the validation init agree on omitted keys
        _ct = cfg.get("conv_type", "regular")
        imported = import_reference_unet_state_dict(
            sd,
            depth=cfg.get("depth", (16, 32, 64)),
            conv_type=_ct,
            link_type=cfg.get("link_type", "identity"),
            upscale_type=cfg.get("upscale_type", "upsample"),
            norm_type=cfg.get("norm_type", "instance"),
            activation_fn=cfg.get("activation_fn", "swish"),
            deep_supervision=cfg.get("deep_supervision", False),
            bottleneck_classification=cfg.get(
                "bottleneck_classification", False
            ),
            feature_conditioning=cfg.get("feature_conditioning"),
            in_channels=cfg.get("n_channels", cfg.get("in_channels", 1)),
            skip_conditioning=cfg.get("skip_conditioning") or 0,
        )
        # sae/asp imports serve through the reference-compat _ConvUnit
        # variants (sum-combined scSE / never-downsampling ASPP +
        # center-crop decoder); record the compat conv_type so
        # test/predict rebuild the identical tree
        cfg["conv_type"] = {
            "sae": "sae_ref",
            "asp": "asp_ref",
            "depthwise": "depthwise_ref",
        }.get(_ct, _ct)
    # BatchNorm running statistics ride along in the saved payload; the
    # test/predict entrypoints restore them so imported batch-norm models
    # eval with the reference's running-average semantics
    if "feature_conditioning_params" in imported:
        cfg["feature_conditioning_params"] = {
            k: v.tolist()
            for k, v in imported["feature_conditioning_params"].items()
        }

    # structural validation against a fresh init at the declared config
    size = tuple(args.target_size)
    x0 = np.zeros((1,) + size + (len(args.image_keys),), np.float32)
    init_kwargs = {}
    if args.net_type in ("cat", "vit"):
        model = get_classification_network(
            args.net_type, cfg, n_classes=args.n_classes
        )
    else:
        model = get_segmentation_network(
            {"unetr": "unetr_ref", "swin": "swin_ref"}.get(
                args.net_type, "unet"
            ),
            cfg,
            n_classes=args.n_classes,
        )
        if cfg.get("feature_conditioning"):
            init_kwargs["x_feature_conditioning"] = np.zeros(
                (1, cfg["feature_conditioning"]), np.float32
            )
        if cfg.get("skip_conditioning"):
            init_kwargs["x_skip_layer"] = np.zeros(
                (1,) + size + (cfg["skip_conditioning"],), np.float32
            )
    params0 = model.init(
        {"params": jax.random.PRNGKey(0)}, x0, **init_kwargs
    )["params"]
    want = jax.tree.map(np.shape, params0)
    got = jax.tree.map(np.shape, imported["params"])
    if want != got:
        raise ValueError(
            "imported parameter tree does not match the config's "
            "structure — wrong --config_file for this checkpoint?"
        )

    if args.net_type in ("cat", "vit"):
        t_args = {
            "image_keys": list(args.image_keys),
            "label_key": args.label_key,
            "target_spacing": args.target_spacing,
            "target_size": list(size),
            "resize_size": None,
            "clinical_feature_keys": [],
        }
        extra = {
            "clinical_feature_means": None,
            "clinical_feature_stds": None,
        }
        default_name = "classification"
    else:
        t_args = {
            "image_keys": list(args.image_keys),
            "skip_keys": [],
            "feature_keys": [],
            "label_keys": list(args.mask_keys),
            "target_spacing": args.target_spacing,
            "target_size": list(size),
            "resize_size": None,
            "crop_size": None,
        }
        extra = {}
        default_name = "segmentation"
    mngr = CheckpointManager(
        args.checkpoint_dir,
        name=args.checkpoint_name or default_name,
        fold=args.fold,
        metadata={
            "network_config": cfg,
            "transform_arguments": t_args,
            "train_pids": [],
            "val_pids": [],
            "n_classes": args.n_classes,
            "net_type": {"unetr": "unetr_ref", "swin": "swin_ref"}.get(
                args.net_type, args.net_type
            ),
            "imported_from": args.input_path,
            **extra,
        },
        monitor="val_loss",
        mode="min",
    )
    payload = {"params": imported["params"]}
    if "batch_stats" in imported:
        payload["batch_stats"] = imported["batch_stats"]
    mngr.save(0, payload, metrics={"val_loss": 0.0})
    mngr.wait()  # the caller reads the directory immediately
    print(
        json.dumps(
            {
                "checkpoint_dir": mngr.dir,
                "n_parameters": int(
                    sum(
                        np.prod(s)
                        for s in jax.tree.leaves(
                            jax.tree.map(np.shape, imported["params"]),
                            is_leaf=lambda x: isinstance(x, tuple),
                        )
                    )
                ),
            }
        )
    )


def flatten_dataset_json(argv):
    """Create individual entries from a hierarchical dataset JSON (parity:
    entrypoints/utils/dataset/flatten_dataset_json.py:1-37) — each
    ``{pid: {key: path}}`` pair becomes ``{pid_key: {"image": path}}``."""
    p = argparse.ArgumentParser(prog="adell utils flatten_dataset_json")
    p.add_argument("--input_json", required=True)
    p.add_argument("--image_keys", nargs="+", required=True,
                   help="keys kept as individual entries")
    args = p.parse_args(argv)
    with open(args.input_json) as f:
        D = json.load(f)
    output = {
        f"{pid}_{key}": {"image": entry[key]}
        for pid, entry in D.items()
        for key in entry
        if key in args.image_keys
    }
    print(json.dumps(output, indent=2))


def get_segmentation_label_composition(argv):
    """Count which classes are present in a folder of segmentation maps
    (parity: entrypoints/utils/dataset/get_segmentation_label_composition.py:
    1-50) — per label: n_images, n_voxels, image fraction, voxel fraction."""
    p = argparse.ArgumentParser(
        prog="adell utils get_segmentation_label_composition"
    )
    p.add_argument("--input_path", required=True,
                   help="directory containing masks")
    p.add_argument("--pattern", default="*", help="glob pattern for masks")
    args = p.parse_args(argv)
    total_voxels: Dict[float, List[int]] = {}
    n_images = 0
    for path in sorted(
        glob.glob(os.path.join(args.input_path, args.pattern))
    ):
        try:
            data = read_nifti(path).data
        except Exception as exc:
            print(f"skipping unreadable {path}: {exc}", file=sys.stderr)
            continue
        n_images += 1
        un, co = np.unique(data, return_counts=True)
        for u, c in zip(un, co):
            total_voxels.setdefault(float(u), []).append(int(c))
    total_vo = sum(int(np.sum(v)) for v in total_voxels.values())
    for u in sorted(total_voxels):
        v = total_voxels[u]
        print(
            json.dumps(
                {
                    "label": u,
                    "n_images": len(v),
                    "n_voxels": int(np.sum(v)),
                    # fraction of scanned images containing the label
                    "image_fraction": len(v) / max(n_images, 1),
                    "voxel_fraction": int(np.sum(v)) / max(total_vo, 1),
                }
            )
        )
