"""
DICOM dataset layer.

Parity targets: adell_mri/utils/dicom_loader.py — DICOMDataset (:66, nested
study/series/slice indexing), SliceSampler (:145, n_iterations random slices
per study per epoch), filter_orientations (:20); and
adell_mri/utils/dicom_dataset.py — filter_dicom_dict_on_presence (:10).

The reference reads slices with pydicom inside MONAI's LoadImaged. pydicom
is not a dependency here: ``read_dicom`` uses pydicom when importable and
otherwise falls back to a built-in minimal codec for uncompressed
little-endian explicit/implicit-VR files (the standard MR export format) —
enough for slice-level 2D training. Structure format::

    [{series_uid: [{"image": "f1.dcm", "orientation": [...]}, ...], ...},
     ...]                      # one outer dict per study
"""

import os
import struct
from typing import Callable, Dict, List, Optional, Sequence, Union

import numpy as np

from adell_mri_tpu.utils import get_logger

logger = get_logger(__name__)

DICOMDatasetType = Sequence[Dict[str, Sequence[Dict[str, str]]]]

_MAGIC_OFFSET = 128


def _read_pydicom(path: str):
    import pydicom

    ds = pydicom.dcmread(path)
    arr = ds.pixel_array.astype(np.float32)
    orientation = [float(v) for v in getattr(ds, "ImageOrientationPatient", [])] or None
    return arr, {
        "orientation": orientation,
        "position": [float(v) for v in getattr(ds, "ImagePositionPatient", [])] or None,
        "series_uid": str(getattr(ds, "SeriesInstanceUID", "")),
    }


# minimal tag set the mini-codec understands
_TAG_ROWS = (0x0028, 0x0010)
_TAG_COLS = (0x0028, 0x0011)
_TAG_BITS = (0x0028, 0x0100)
_TAG_PIXELREP = (0x0028, 0x0103)
_TAG_SLOPE = (0x0028, 0x1053)
_TAG_INTERCEPT = (0x0028, 0x1052)
_TAG_ORIENT = (0x0020, 0x0037)
_TAG_POSITION = (0x0020, 0x0032)
_TAG_SERIES_UID = (0x0020, 0x000E)
_TAG_PIXELDATA = (0x7FE0, 0x0010)

# VRs with a 2-byte reserved field and 4-byte length in explicit VR
_LONG_VRS = {b"OB", b"OW", b"OF", b"SQ", b"UT", b"UN"}


def _parse_elements(buf: bytes, start: int, explicit: bool):
    """Yields (group, elem, value_bytes) for little-endian encodings."""
    pos = start
    n = len(buf)
    while pos + 8 <= n:
        group, elem = struct.unpack_from("<HH", buf, pos)
        pos += 4
        if explicit and group != 0xFFFE:
            vr = buf[pos : pos + 2]
            if vr in _LONG_VRS:
                length = struct.unpack_from("<I", buf, pos + 4)[0]
                pos += 8
            else:
                length = struct.unpack_from("<H", buf, pos + 2)[0]
                pos += 4
        else:
            length = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        if length == 0xFFFFFFFF:  # undefined length; skip (no SQ support)
            raise ValueError("mini DICOM codec: undefined lengths unsupported")
        yield (group, elem), buf[pos : pos + length]
        pos += length


def _read_mini(path: str):
    with open(path, "rb") as f:
        buf = f.read()
    if buf[_MAGIC_OFFSET : _MAGIC_OFFSET + 4] != b"DICM":
        raise ValueError(f"{path}: missing DICM magic")
    # file meta group (0002) is always explicit VR little endian; walk it
    # manually to find both the transfer syntax of the main dataset
    # ((0002,0010)) and the offset where the meta group ends
    transfer_syntax = "1.2.840.10008.1.2.1"  # explicit LE default
    p = _MAGIC_OFFSET + 4
    n = len(buf)
    while p + 8 <= n:
        group, elem = struct.unpack_from("<HH", buf, p)
        if group != 0x0002:
            break
        vr = buf[p + 4 : p + 6]
        if vr in _LONG_VRS:
            length = struct.unpack_from("<I", buf, p + 8)[0]
            val_start = p + 12
        else:
            length = struct.unpack_from("<H", buf, p + 6)[0]
            val_start = p + 8
        if (group, elem) == (0x0002, 0x0010):
            transfer_syntax = (
                buf[val_start : val_start + length]
                .decode("ascii")
                .rstrip("\x00 ")
            )
        p = val_start + length
    explicit = transfer_syntax != "1.2.840.10008.1.2"  # implicit VR LE
    elems = {}
    for tag, val in _parse_elements(buf, p, explicit=explicit):
        elems[tag] = val

    rows = struct.unpack("<H", elems[_TAG_ROWS])[0]
    cols = struct.unpack("<H", elems[_TAG_COLS])[0]
    bits = struct.unpack("<H", elems.get(_TAG_BITS, b"\x10\x00"))[0]
    signed = struct.unpack("<H", elems.get(_TAG_PIXELREP, b"\x00\x00"))[0]
    dtype = {
        (8, 0): np.uint8,
        (8, 1): np.int8,
        (16, 0): np.uint16,
        (16, 1): np.int16,
        (32, 0): np.uint32,
        (32, 1): np.int32,
    }[(bits, signed)]
    arr = (
        np.frombuffer(elems[_TAG_PIXELDATA], dtype=dtype)[: rows * cols]
        .reshape(rows, cols)
        .astype(np.float32)
    )
    slope = float(elems.get(_TAG_SLOPE, b"1").decode().strip("\x00 ") or 1)
    intercept = float(
        elems.get(_TAG_INTERCEPT, b"0").decode().strip("\x00 ") or 0
    )
    arr = arr * slope + intercept

    def _ds_list(tag):
        raw = elems.get(tag)
        if raw is None:
            return None
        txt = raw.decode("ascii").strip("\x00 ")
        return [float(v) for v in txt.split("\\")] if txt else None

    return arr, {
        "orientation": _ds_list(_TAG_ORIENT),
        "position": _ds_list(_TAG_POSITION),
        "series_uid": elems.get(_TAG_SERIES_UID, b"")
        .decode("ascii")
        .rstrip("\x00 "),
    }


def read_dicom(path: str):
    """Returns (float32 [rows, cols] array, metadata dict).

    pydicom when importable; any pydicom failure (absent, or a file it
    can't decode) falls back to the built-in mini codec so environments
    WITH pydicom can still read mini-codec-written files."""
    try:
        return _read_pydicom(path)
    except ImportError:
        return _read_mini(path)
    except Exception as pyd_exc:
        try:
            return _read_mini(path)
        except Exception:
            raise pyd_exc


def write_dicom(
    path: str,
    array: np.ndarray,
    series_uid: str = "1.2.3",
    orientation: Optional[Sequence[float]] = None,
    position: Optional[Sequence[float]] = None,
):
    """
    Minimal explicit-VR little-endian writer (uint16 pixels) — used by the
    tests and the dataset-generation utils; readable by any DICOM tool.
    """
    array = np.asarray(array)
    lo, hi = float(array.min()), float(array.max())
    span = max(hi - lo, 1e-6)
    # round, don't truncate: astype alone floors, a biased full-step
    # quantization error where rounding gives unbiased half-step
    pix = np.round((array - lo) / span * 65535).astype(np.uint16)

    def elem(group, el, vr, value: bytes):
        if len(value) % 2:
            value += b"\x00"
        if vr in (b"OB", b"OW", b"UT", b"UN", b"SQ", b"OF"):
            return (
                struct.pack("<HH", group, el)
                + vr
                + b"\x00\x00"
                + struct.pack("<I", len(value))
                + value
            )
        return (
            struct.pack("<HH", group, el)
            + vr
            + struct.pack("<H", len(value))
            + value
        )

    ts = b"1.2.840.10008.1.2.1\x00"
    # MR Image Storage SOP class + a file-unique instance UID: the tags
    # pydicom/other tools require to build a dataset and decode pixels
    sop_class = b"1.2.840.10008.5.1.4.1.1.4\x00"
    import zlib

    # crc32, not hash(): PYTHONHASHSEED would make re-exports differ
    sop_instance = f"{series_uid}.{zlib.crc32(path.encode())}".encode()
    meta_body = (
        elem(0x0002, 0x0002, b"UI", sop_class)
        + elem(0x0002, 0x0003, b"UI", sop_instance)
        + elem(0x0002, 0x0010, b"UI", ts)
    )
    meta = elem(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta_body)))
    # data-set elements in ascending (group, element) order as the
    # standard requires (strict parsers stop at out-of-order tags)
    body = b""
    body += elem(0x0008, 0x0016, b"UI", sop_class)
    body += elem(0x0008, 0x0018, b"UI", sop_instance)
    body += elem(0x0020, 0x000E, b"UI", series_uid.encode())
    if position is not None:
        txt = "\\".join(f"{v:.10g}" for v in position).encode()
        body += elem(0x0020, 0x0032, b"DS", txt)
    if orientation is not None:
        txt = "\\".join(f"{v:.10g}" for v in orientation).encode()
        body += elem(0x0020, 0x0037, b"DS", txt)
    body += elem(0x0028, 0x0002, b"US", struct.pack("<H", 1))
    body += elem(0x0028, 0x0004, b"CS", b"MONOCHROME2 ")
    body += elem(0x0028, 0x0010, b"US", struct.pack("<H", array.shape[0]))
    body += elem(0x0028, 0x0011, b"US", struct.pack("<H", array.shape[1]))
    body += elem(0x0028, 0x0100, b"US", struct.pack("<H", 16))
    body += elem(0x0028, 0x0101, b"US", struct.pack("<H", 16))
    body += elem(0x0028, 0x0102, b"US", struct.pack("<H", 15))
    body += elem(0x0028, 0x0103, b"US", struct.pack("<H", 0))
    # 10 significant digits (DS allows 16 bytes; %g's 6 digits cost
    # ~1e-6 relative error on top of quantization)
    body += elem(0x0028, 0x1053, b"DS", f"{span / 65535:.10g}".encode())
    body += elem(0x0028, 0x1052, b"DS", f"{lo:.10g}".encode())
    body += elem(0x7FE0, 0x0010, b"OW", pix.tobytes())
    with open(path, "wb") as f:
        f.write(b"\x00" * _MAGIC_OFFSET + b"DICM" + meta + meta_body + body)


# ---------------------------------------------------------------------------
# dataset structure (parity: dicom_loader.py:20,66,145; dicom_dataset.py:10)
# ---------------------------------------------------------------------------


def filter_orientations(
    dicom_dictionary, keep_bad: bool = True
):
    """
    Drops .dcm entries with no orientation tag; when ``keep_bad`` is False
    also drops entries whose orientation's last triplet is ~[0, 0, -1]
    (parity: dicom_loader.py:20).
    """
    out = {}
    for k, series in dicom_dictionary.items():
        new_series = {}
        for uid, entries in series.items():
            kept = []
            for entry in entries:
                if ".dcm" in entry.get("image", ""):
                    orient = entry.get("orientation")
                    if orient is None:
                        continue
                    bad = np.all(np.isclose(orient[-3:], [0, 0, -1]))
                    if bad and not keep_bad:
                        continue
                    kept.append(entry)
                else:
                    kept.append(entry)
            if kept:
                new_series[uid] = kept
        if new_series:
            out[k] = new_series
    return out


def filter_dicom_dict_on_presence(
    dicom_dataset, keys: Sequence[str]
):
    """
    Keeps only slice entries containing every key in ``keys`` (parity:
    dicom_dataset.py:10).
    """
    out = []
    for study in dicom_dataset:
        new_study = {}
        for uid, entries in study.items():
            kept = [e for e in entries if all(k in e for k in keys)]
            if kept:
                new_study[uid] = kept
        if new_study:
            out.append(new_study)
    return out


class DICOMDataset:
    """
    Nested study/series/slice dataset with flat integer indexing (parity:
    dicom_loader.py:66). ``transform`` is applied per entry dict; by default
    each entry's "image" path is read into a float32 array under "image".
    """

    def __init__(
        self,
        dicom_dataset: DICOMDatasetType,
        transform: Optional[Callable] = None,
        load: bool = True,
    ):
        self.dicom_dataset = list(dicom_dataset)
        self.transform = transform
        self.load = load
        self.correspondence: List[List] = []
        for index, element in enumerate(self.dicom_dataset):
            for k in element:
                for dcm_index in range(len(element[k])):
                    self.correspondence.append([index, k, dcm_index])

    def __len__(self):
        return len(self.correspondence)

    def _fetch(self, real_index):
        entry = dict(
            self.dicom_dataset[real_index[0]][real_index[1]][real_index[2]]
        )
        if self.load and isinstance(entry.get("image"), str):
            arr, meta = read_dicom(entry["image"])
            entry["image_path"] = entry["image"]
            entry["image"] = arr
            entry.setdefault("orientation", meta.get("orientation"))
        if self.transform is not None:
            entry = self.transform(entry)
        return entry

    def __getitem__(self, index: Union[int, tuple, slice, Sequence]):
        if isinstance(index, tuple):
            return self._fetch(list(index))
        if isinstance(index, slice):
            return [self[i] for i in range(*index.indices(len(self)))]
        if isinstance(index, (list, np.ndarray)):
            return [self[int(i)] for i in index]
        return self._fetch(self.correspondence[index])


class SliceSampler:
    """
    Yields ``n_iterations`` random slice indices per study per epoch
    (parity: dicom_loader.py:145). Iterable of flat DICOMDataset indices.
    """

    def __init__(
        self,
        dicom_dataset: DICOMDatasetType,
        n_iterations: int = 1,
        n_samples: Optional[float] = None,
        shuffle: bool = True,
        seed: int = 42,
    ):
        self.dicom_dataset = list(dicom_dataset)
        self.n_iterations = n_iterations
        self.n_samples = n_samples
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        # per (study, series): list of flat indices
        self.correspondence = []
        self.N = 0
        i = 0
        for element in self.dicom_dataset:
            # one slot per (study, series) so an epoch draws exactly one
            # slice from every series (the reference's keys_to_indices,
            # dicom_loader.py:179-195, appends ONE shared dict per series,
            # so all of a study's slots alias every series — a study can
            # then over-sample one series and skip another)
            for k in element:
                idxs = []
                for _ in element[k]:
                    idxs.append(i)
                    i += 1
                self.correspondence.append({k: idxs})
                self.N += 1
        self.i = i

    def __iter__(self):
        corr_idx = list(range(self.N)) * self.n_iterations
        if self.shuffle:
            self.rng.shuffle(corr_idx)
        if self.n_samples is not None:
            n = (
                int(self.n_samples * len(corr_idx))
                if self.n_samples < 1.0
                else int(self.n_samples)
            )
            if n < len(corr_idx):
                corr_idx = corr_idx[:n]
            else:
                corr_idx = list(
                    self.rng.choice(corr_idx, size=n, replace=True)
                )
        for idx in corr_idx:
            element = self.correspondence[idx]
            series = self.rng.choice(list(element.keys()))
            yield int(self.rng.choice(element[series]))

    def __len__(self):
        if self.n_samples is not None:
            if self.n_samples < 1.0:
                return int(self.N * self.n_iterations * self.n_samples)
            return int(self.n_samples)
        return self.N * self.n_iterations


def generate_dicom_dataset_json(
    root: str, image_key: str = "image"
) -> List[Dict]:
    """
    Walks ``root`` expecting study/series/*.dcm and builds the nested
    structure (the utils CLI exposes this).
    """
    out = []
    for study in sorted(os.listdir(root)):
        sdir = os.path.join(root, study)
        if not os.path.isdir(sdir):
            continue
        entry = {}
        for series in sorted(os.listdir(sdir)):
            sedir = os.path.join(sdir, series)
            if not os.path.isdir(sedir):
                continue
            files = sorted(
                f for f in os.listdir(sedir) if f.endswith(".dcm")
            )
            slices = []
            for f in files:
                path = os.path.join(sedir, f)
                meta = {}
                try:
                    _, meta = read_dicom(path)
                except Exception as e:
                    logger.warning("skipping %s (%s)", path, e)
                    continue
                slices.append(
                    {image_key: path, "orientation": meta.get("orientation")}
                )
            if slices:
                entry[series] = slices
        if entry:
            out.append(entry)
    return out
