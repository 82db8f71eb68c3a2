"""
Host-side label operations (numpy; run inside load_fn before device work).

Parity targets: adell_mri/utils/monai_transforms/labels.py —
LabelOperatord (:32, scalar label cat/binary/group mapping),
LabelOperatorSegmentationd (:119, mask cat/binary), CombineBinaryLabelsd
(:180, any/majority), ConvexHulld (:237), ConvertToOneHot (:255),
DbscanAssistedSegmentSelection (:310), CropFromMaskd (:403); and
bounding_boxes.py — MasksToBBd (:315).
"""

from typing import Dict, Optional, Sequence, Union

import numpy as np


def label_operator(
    value,
    possible_labels: Sequence,
    mode: str = "cat",
    positive_labels: Sequence = (1,),
    label_groups: Optional[Sequence[Sequence]] = None,
) -> int:
    """Scalar label mapping (parity: LabelOperatord:32). ``label_groups``
    maps each group's members to its index; otherwise ``binary`` maps
    positive_labels to 1, and ``cat`` maps possible_labels to 0..n-1."""
    if isinstance(value, (tuple, list)):
        value = max(value)
    key = str(value)
    if label_groups is not None:
        match = {
            str(label): i
            for i, group in enumerate(label_groups)
            for label in group
        }
    elif positive_labels is not None and mode == "binary":
        pos = {str(p) for p in positive_labels}
        match = {str(l): int(str(l) in pos) for l in possible_labels}
    else:
        match = {str(l): i for i, l in enumerate(possible_labels)}
    return match[key]


def label_operator_segmentation(
    mask: np.ndarray,
    possible_labels: Sequence,
    mode: str = "cat",
    positive_labels: Sequence = (1,),
) -> np.ndarray:
    """Mask label mapping (parity: LabelOperatorSegmentationd:119)."""
    if mode == "binary":
        return np.isin(mask, np.float32(list(positive_labels))).astype(
            np.float32
        )
    if mode == "cat":
        match = {l: i for i, l in enumerate(possible_labels)}
        out = np.zeros_like(mask)
        for u in np.unique(mask):
            if u in match:
                out[mask == u] = match[u]
        return out
    return mask


def combine_binary_labels(
    masks: Sequence[np.ndarray], mode: str = "any"
) -> np.ndarray:
    """any: union; majority: >50% agreement (parity:
    CombineBinaryLabelsd:180)."""
    stacked = np.stack(list(masks), axis=-1)
    if mode == "any":
        return np.float32(stacked.sum(-1) > 0)
    if mode == "majority":
        return np.float32(stacked.mean(-1) > 0.5)
    raise ValueError(f"mode {mode!r}")


def convert_to_one_hot(
    sample: Dict,
    keys: Sequence[str],
    priority: Optional[Sequence[str]] = None,
    out_key: str = "label",
    include_background: bool = True,
) -> Dict:
    """
    Merges several binary masks into one categorical map; later keys in
    ``priority`` (default: keys order) overwrite earlier ones (parity:
    ConvertToOneHot:255 — binary problems coerced to one multi-class map).
    """
    order = list(priority or keys)
    base = np.zeros_like(np.asarray(sample[order[0]]), dtype=np.float32)
    for i, k in enumerate(order):
        m = np.asarray(sample[k]) > 0.5
        # include_background=False conflates the FIRST key's voxels with
        # empty voxels (both 0) — exact parity with the reference's
        # bg=False argmax (monai_transforms.py:191-200, argmax of an
        # all-zero stack is 0); use include_background=True when the first
        # structure must be separable from background
        base[m] = i + (1 if include_background else 0)
    sample[out_key] = base
    return sample


def convex_hull(mask: np.ndarray) -> np.ndarray:
    """
    Fills each 2D slice's foreground with its convex hull (parity:
    ConvexHulld:237 / convex_hull_iter). 3D masks are treated slice-wise
    along the last axis.
    """
    from scipy.spatial import ConvexHull, QhullError, Delaunay

    def hull_2d(sl):
        pts = np.stack(np.where(sl > 0.5), axis=1)
        if len(pts) < 3:
            return (sl > 0.5).astype(np.float32)
        try:
            hull = Delaunay(pts[ConvexHull(pts).vertices])
        except QhullError:
            return (sl > 0.5).astype(np.float32)
        grid = np.stack(
            np.meshgrid(*[np.arange(s) for s in sl.shape], indexing="ij"),
            axis=-1,
        ).reshape(-1, 2)
        inside = hull.find_simplex(grid) >= 0
        return inside.reshape(sl.shape).astype(np.float32)

    mask = np.asarray(mask)
    if mask.ndim == 2:
        return hull_2d(mask)
    out = np.zeros_like(mask, dtype=np.float32)
    for z in range(mask.shape[-1]):
        out[..., z] = hull_2d(mask[..., z])
    return out


def dbscan_segment_selection(
    mask: np.ndarray,
    min_dist: float = 1.0,
    filter_by_size: bool = False,
    filter_by_dist_to_centre: bool = False,
    keep_n: int = 1,
) -> np.ndarray:
    """
    Drops spurious small activations with DBSCAN clustering over foreground
    voxel coordinates; optionally keeps the ``keep_n`` largest clusters
    and/or the one closest to the image centre (parity:
    DbscanAssistedSegmentSelection:310).
    """
    from sklearn.cluster import DBSCAN

    mask = np.asarray(mask)
    centre = np.asarray(mask.shape, float) / 2
    coords = np.stack(np.where(mask > 0.5), axis=1)
    out = np.zeros_like(mask, dtype=np.float32)
    if len(coords) == 0:
        return out
    labels = DBSCAN(eps=max(min_dist, 1e-3)).fit(coords).labels_
    unique = np.unique(labels)
    unique = unique[unique >= 0]
    if len(unique) == 0:
        return out
    sizes = {l: int(np.sum(labels == l)) for l in unique}
    dists = {
        l: float(np.sum((coords[labels == l].mean(0) - centre) ** 2))
        for l in unique
    }
    keep = list(unique)
    if filter_by_size:
        keep = sorted(keep, key=lambda l: -sizes[l])[:keep_n]
    if filter_by_dist_to_centre:
        keep = [min(keep, key=lambda l: dists[l])]
    for l in keep:
        pts = coords[labels == l]
        out[tuple(pts.T)] = 1.0
    return out


def mask_to_bb(mask: np.ndarray) -> np.ndarray:
    """
    Bounding box [min..., max...] of each connected component (parity:
    MasksToBBd, bounding_boxes.py:315). Returns [n_boxes, 2*ndim].
    """
    from scipy import ndimage

    mask = np.asarray(mask)
    labels, n = ndimage.label(mask > 0.5)
    boxes = []
    for sl in ndimage.find_objects(labels):
        if sl is None:
            continue
        mins = [s.start for s in sl]
        maxs = [s.stop - 1 for s in sl]
        boxes.append(mins + maxs)
    return np.asarray(boxes, np.float32).reshape(-1, 2 * mask.ndim)


def crop_from_mask(
    images: Union[np.ndarray, Sequence[np.ndarray]],
    mask: np.ndarray,
    output_size: Optional[Sequence[int]] = None,
    margin: int = 0,
):
    """
    Crops image(s) to the smallest box containing the mask, optionally
    padded/cropped to ``output_size`` around its centre (parity:
    CropFromMaskd:403; the classification pipeline's 16px-margin crop uses
    ``margin``).
    """
    mask = np.asarray(mask)
    fg = np.where(mask > 0.5)
    single = isinstance(images, np.ndarray)
    imgs = [images] if single else list(images)
    ndim = mask.ndim
    if len(fg[0]) == 0:
        out = imgs
    else:
        mins = [max(int(a.min()) - margin, 0) for a in fg]
        maxs = [
            min(int(a.max()) + 1 + margin, s)
            for a, s in zip(fg, mask.shape)
        ]
        sl = tuple(slice(lo, hi) for lo, hi in zip(mins, maxs))
        out = [np.asarray(im)[sl + (Ellipsis,)] for im in imgs]
    if output_size is not None:
        resized = []
        for im in out:
            target = list(output_size) + list(im.shape[ndim:])
            pad = [
                (max((t - s) // 2, 0), max(t - s - max((t - s) // 2, 0), 0))
                for s, t in zip(im.shape, target)
            ]
            im = np.pad(im, pad)
            sl = tuple(
                slice((s - t) // 2, (s - t) // 2 + t)
                for s, t in zip(im.shape, target)
            )
            resized.append(im[sl])
        out = resized
    return out[0] if single else out
