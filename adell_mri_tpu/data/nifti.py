"""
Pure-numpy NIfTI-1 reader/writer.

The reference reads volumes through SimpleITK/MONAI (adell_mri/utils/
sitk_utils.py, transform LoadImaged); neither library is available here, and
the hot path only needs: decode voxels, recover the voxel-to-world affine,
reorient to RAS, and write predictions back with copied geometry
(adell_mri/utils/sitk_writer.py:17). NIfTI-1 is a fixed 348-byte header, so a
dependency-free codec is smaller than the wrapper code it replaces.

Everything here is host-side IO; no JAX.
"""

import gzip
import struct
from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np

# NIfTI-1 datatype codes -> numpy dtypes
_DTYPES = {
    2: np.uint8,
    4: np.int16,
    8: np.int32,
    16: np.float32,
    64: np.float64,
    256: np.int8,
    512: np.uint16,
    768: np.uint32,
    1024: np.int64,
    1280: np.uint64,
}
_DTYPE_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}
HEADER_SIZE = 348


@dataclass
class NiftiImage:
    """A decoded volume: ``data`` indexed [x, y, z(, t)] plus its affine."""

    data: np.ndarray
    affine: np.ndarray  # (4, 4) voxel -> world (RAS+ world convention)
    header: dict = field(default_factory=dict)

    @property
    def spacing(self) -> np.ndarray:
        """Per-axis voxel spacing in mm, from the affine columns."""
        return np.linalg.norm(self.affine[:3, :3], axis=0)

    @property
    def shape(self) -> Tuple[int, ...]:
        return self.data.shape


def _quaternion_to_affine(hdr: dict) -> np.ndarray:
    b, c, d = hdr["quatern_b"], hdr["quatern_c"], hdr["quatern_d"]
    a = np.sqrt(max(0.0, 1.0 - (b * b + c * c + d * d)))
    rot = np.array(
        [
            [
                a * a + b * b - c * c - d * d,
                2 * (b * c - a * d),
                2 * (b * d + a * c),
            ],
            [
                2 * (b * c + a * d),
                a * a + c * c - b * b - d * d,
                2 * (c * d - a * b),
            ],
            [
                2 * (b * d - a * c),
                2 * (c * d + a * b),
                a * a + d * d - b * b - c * c,
            ],
        ]
    )
    qfac = hdr["pixdim"][0]
    qfac = 1.0 if qfac == 0 else qfac
    spacing = np.array(
        [hdr["pixdim"][1], hdr["pixdim"][2], qfac * hdr["pixdim"][3]]
    )
    affine = np.eye(4)
    affine[:3, :3] = rot * spacing[None, :]
    affine[:3, 3] = [hdr["qoffset_x"], hdr["qoffset_y"], hdr["qoffset_z"]]
    return affine


def _parse_header(raw: bytes) -> dict:
    (sizeof_hdr,) = struct.unpack("<i", raw[0:4])
    endian = "<"
    if sizeof_hdr != HEADER_SIZE:
        endian = ">"
        (sizeof_hdr,) = struct.unpack(">i", raw[0:4])
        if sizeof_hdr != HEADER_SIZE:
            raise ValueError("not a NIfTI-1 file (bad sizeof_hdr)")
    u = lambda fmt, off: struct.unpack(endian + fmt, raw[off : off + struct.calcsize(fmt)])
    hdr = {
        "endian": endian,
        "dim": u("8h", 40),
        "datatype": u("h", 70)[0],
        "bitpix": u("h", 72)[0],
        "pixdim": u("8f", 76),
        "vox_offset": u("f", 108)[0],
        "scl_slope": u("f", 112)[0],
        "scl_inter": u("f", 116)[0],
        "qform_code": u("h", 252)[0],
        "sform_code": u("h", 254)[0],
        "quatern_b": u("f", 256)[0],
        "quatern_c": u("f", 260)[0],
        "quatern_d": u("f", 264)[0],
        "qoffset_x": u("f", 268)[0],
        "qoffset_y": u("f", 272)[0],
        "qoffset_z": u("f", 276)[0],
        "srow_x": u("4f", 280),
        "srow_y": u("4f", 296),
        "srow_z": u("4f", 312),
        "magic": raw[344:348],
    }
    return hdr


def _affine_from_header(hdr: dict) -> np.ndarray:
    if hdr["sform_code"] > 0:
        affine = np.eye(4)
        affine[0] = hdr["srow_x"]
        affine[1] = hdr["srow_y"]
        affine[2] = hdr["srow_z"]
        return affine
    if hdr["qform_code"] > 0:
        return _quaternion_to_affine(hdr)
    affine = np.diag([hdr["pixdim"][1], hdr["pixdim"][2], hdr["pixdim"][3], 1.0])
    return affine


def _read_bytes(path: str) -> bytes:
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "rb") as f:
        return f.read()


def read_nifti(path: str) -> NiftiImage:
    """Reads a .nii or .nii.gz file into a NiftiImage."""
    raw = _read_bytes(path)
    hdr = _parse_header(raw[:HEADER_SIZE])
    ndim = hdr["dim"][0]
    shape = tuple(int(s) for s in hdr["dim"][1 : 1 + ndim])
    dtype = np.dtype(_DTYPES[hdr["datatype"]]).newbyteorder(hdr["endian"])
    offset = int(hdr["vox_offset"])
    count = int(np.prod(shape))
    data = np.frombuffer(
        raw, dtype=dtype, count=count, offset=offset
    ).reshape(shape, order="F")
    slope, inter = hdr["scl_slope"], hdr["scl_inter"]
    # NaN slope/inter mean "unset" (nibabel semantics) — treating NaN as a
    # real slope would multiply the whole volume by NaN
    if not np.isfinite(slope):
        slope = 0.0
    if not np.isfinite(inter):
        inter = 0.0
    if slope not in (0.0, 1.0) or inter != 0.0:
        slope = slope if slope != 0.0 else 1.0
        data = data.astype(np.float32) * slope + inter
    else:
        data = np.asarray(data)
    return NiftiImage(data=data, affine=_affine_from_header(hdr), header=hdr)


def write_nifti(
    path: str,
    data: np.ndarray,
    affine: Optional[np.ndarray] = None,
    dtype: Optional[np.dtype] = None,
):
    """Writes ``data`` (indexed [x, y, z(, t)]) as a single-file NIfTI-1."""
    if affine is None:
        affine = np.eye(4)
    if dtype is not None:
        data = data.astype(dtype)
    if data.dtype == np.bool_:
        data = data.astype(np.uint8)
    if np.dtype(data.dtype) not in _DTYPE_CODES:
        data = data.astype(np.float32)
    code = _DTYPE_CODES[np.dtype(data.dtype)]
    ndim = data.ndim
    dim = [ndim] + list(data.shape) + [1] * (7 - ndim)
    spacing = np.linalg.norm(affine[:3, :3], axis=0)
    pixdim = [1.0] + list(spacing[: min(3, ndim)]) + [1.0] * (7 - min(3, ndim))

    hdr = bytearray(HEADER_SIZE)
    struct.pack_into("<i", hdr, 0, HEADER_SIZE)
    struct.pack_into("<8h", hdr, 40, *dim)
    struct.pack_into("<h", hdr, 70, code)
    struct.pack_into("<h", hdr, 72, data.dtype.itemsize * 8)
    struct.pack_into("<8f", hdr, 76, *pixdim)
    struct.pack_into("<f", hdr, 108, 352.0)  # vox_offset
    struct.pack_into("<f", hdr, 112, 1.0)  # scl_slope
    struct.pack_into("<f", hdr, 116, 0.0)  # scl_inter
    struct.pack_into("<h", hdr, 252, 0)  # qform_code
    struct.pack_into("<h", hdr, 254, 1)  # sform_code
    struct.pack_into("<4f", hdr, 280, *affine[0])
    struct.pack_into("<4f", hdr, 296, *affine[1])
    struct.pack_into("<4f", hdr, 312, *affine[2])
    hdr[344:348] = b"n+1\x00"

    payload = bytes(hdr) + b"\x00" * 4 + np.asfortranarray(data).tobytes(order="F")
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "wb") as f:
        f.write(payload)


# ---------------------------------------------------------------------------
# Orientation (RAS reorient, parity with monai Orientationd("RAS"))
# ---------------------------------------------------------------------------


def orientation_codes(affine: np.ndarray) -> Tuple[int, ...]:
    """
    For each voxel axis, the dominant world axis (0=L/R, 1=P/A, 2=I/S) and
    its sign, encoded as signed index (+1-based): e.g. (+1, -2, +3).
    """
    R = affine[:3, :3]
    codes = []
    remaining = [0, 1, 2]
    for col in range(3):
        mags = [abs(R[row, col]) if row in remaining else -1 for row in range(3)]
        row = int(np.argmax(mags))
        remaining.remove(row)
        sign = 1 if R[row, col] >= 0 else -1
        codes.append(sign * (row + 1))
    return tuple(codes)


def reorient_from_ras(data: np.ndarray, original_affine: np.ndarray) -> np.ndarray:
    """
    Inverse of :func:`reorient_to_ras` for a voxel array: takes data on the
    RAS grid of a file whose affine was ``original_affine`` and returns it
    in the ORIGINAL file's axis order and direction, so a written
    prediction matches the source file voxel-for-voxel (the reference's
    Invertd byte-layout parity, monai Invertd in
    entrypoints/segmentation/predict.py).
    """
    codes = orientation_codes(original_affine)
    perm = [0, 0, 0]
    flips = [False, False, False]
    for vox_axis, code in enumerate(codes):
        world = abs(code) - 1
        perm[world] = vox_axis
        flips[world] = code < 0
    out = data
    for world in range(3):
        if flips[world]:
            out = np.flip(out, axis=world)
    extra = list(range(3, out.ndim))
    inv = list(np.argsort(perm))
    return np.ascontiguousarray(np.transpose(out, inv + extra))


def reorient_to_ras(img: NiftiImage) -> NiftiImage:
    """
    Permutes/flips voxel axes so axis 0 increases to the Right, axis 1 to
    Anterior, axis 2 to Superior, updating the affine accordingly.
    """
    data, affine = img.data, img.affine.copy()
    codes = orientation_codes(affine)
    # permutation: world axis w is found at voxel axis perm[w]
    perm = [0, 0, 0]
    flips = [False, False, False]
    for vox_axis, code in enumerate(codes):
        world = abs(code) - 1
        perm[world] = vox_axis
        flips[world] = code < 0

    extra_axes = list(range(3, data.ndim))
    data = np.transpose(data, perm + extra_axes)
    affine = affine[:, perm + [3]]
    for world in range(3):
        if flips[world]:
            data = np.flip(data, axis=world)
            n = data.shape[world]
            affine[:3, 3] = affine[:3, 3] + affine[:3, world] * (n - 1)
            affine[:3, world] = -affine[:3, world]
    return NiftiImage(data=np.ascontiguousarray(data), affine=affine, header=img.header)
