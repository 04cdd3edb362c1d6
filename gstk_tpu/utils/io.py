"""File IO: PLY point clouds (no external deps), images, depth maps.

Replaces the reference's open3d PLY loading
(``gs_toolkit/data/dataparsers/gs_toolkit_dataparser.py:434-457``) and PIL
image / 16-bit depth loading (``gs_toolkit/data/datasets/base_dataset.py:85-129``)
with a self-contained implementation (open3d is not available in the TPU
image; the PLY codec here handles ascii and binary little/big endian and
arbitrary vertex properties, which also serves the Gaussian PLY exporter).
"""

from __future__ import annotations

import io as _io
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

_PLY_DTYPES = {
    "char": "i1", "int8": "i1",
    "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2",
    "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4",
    "double": "f8", "float64": "f8",
}


def read_ply(path) -> Dict[str, np.ndarray]:
    """Read a PLY file; returns {element_name: structured array}.

    List properties (e.g. face vertex_indices) are returned as object arrays.
    """
    with open(path, "rb") as f:
        data = f.read()
    header_end = data.find(b"end_header\n")
    if header_end < 0:
        raise ValueError(f"{path}: not a PLY file (no end_header)")
    header = data[:header_end].decode("ascii", errors="replace").splitlines()
    body = data[header_end + len(b"end_header\n"):]

    if not header or header[0].strip() != "ply":
        raise ValueError(f"{path}: missing ply magic")
    fmt = None
    elements: List[Tuple[str, int, List]] = []  # (name, count, props)
    for line in header[1:]:
        parts = line.strip().split()
        if not parts or parts[0] == "comment":
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            elements.append((parts[1], int(parts[2]), []))
        elif parts[0] == "property":
            if parts[1] == "list":
                elements[-1][2].append((parts[4], ("list", parts[2], parts[3])))
            else:
                elements[-1][2].append((parts[2], parts[1]))

    out: Dict[str, np.ndarray] = {}
    if fmt == "ascii":
        text_rows = body.decode("ascii").split("\n")
        row_i = 0
        for name, count, props in elements:
            has_list = any(isinstance(t, tuple) for _, t in props)
            rows = []
            for _ in range(count):
                vals = text_rows[row_i].split()
                row_i += 1
                rec, vi = [], 0
                for pname, ptype in props:
                    if isinstance(ptype, tuple):
                        n = int(vals[vi]); vi += 1
                        rec.append(np.asarray(vals[vi:vi + n], _PLY_DTYPES[ptype[2]]))
                        vi += n
                    else:
                        rec.append(np.dtype(_PLY_DTYPES[ptype]).type(vals[vi]))
                        vi += 1
                rows.append(tuple(rec))
            dtype = [
                (pname, object if isinstance(pt, tuple) else _PLY_DTYPES[pt])
                for pname, pt in props
            ]
            out[name] = np.array(rows, dtype=dtype)
    elif fmt in ("binary_little_endian", "binary_big_endian"):
        endian = "<" if fmt == "binary_little_endian" else ">"
        buf = _io.BytesIO(body)
        for name, count, props in elements:
            has_list = any(isinstance(t, tuple) for _, t in props)
            if not has_list:
                dtype = np.dtype(
                    [(pname, endian + _PLY_DTYPES[pt]) for pname, pt in props]
                )
                out[name] = np.frombuffer(
                    buf.read(dtype.itemsize * count), dtype=dtype
                ).copy()
            else:
                rows = []
                for _ in range(count):
                    rec = []
                    for pname, pt in props:
                        if isinstance(pt, tuple):
                            cnt_dt = np.dtype(endian + _PLY_DTYPES[pt[1]])
                            n = int(np.frombuffer(buf.read(cnt_dt.itemsize), cnt_dt)[0])
                            it_dt = np.dtype(endian + _PLY_DTYPES[pt[2]])
                            rec.append(
                                np.frombuffer(buf.read(it_dt.itemsize * n), it_dt).copy()
                            )
                        else:
                            dt = np.dtype(endian + _PLY_DTYPES[pt])
                            rec.append(np.frombuffer(buf.read(dt.itemsize), dt)[0])
                    rows.append(tuple(rec))
                dtype = [
                    (pname, object if isinstance(pt, tuple) else _PLY_DTYPES[pt])
                    for pname, pt in props
                ]
                out[name] = np.array(rows, dtype=dtype)
    else:
        raise ValueError(f"{path}: unsupported PLY format {fmt}")
    return out


def read_ply_points(path) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Read (xyz float32 (N,3), rgb uint8 (N,3) or None) from a PLY."""
    ply = read_ply(path)
    v = ply["vertex"]
    xyz = np.stack([v["x"], v["y"], v["z"]], axis=-1).astype(np.float32)
    names = v.dtype.names
    rgb = None
    if all(c in names for c in ("red", "green", "blue")):
        rgb = np.stack([v["red"], v["green"], v["blue"]], axis=-1)
        if rgb.dtype != np.uint8:
            rgb = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
    return xyz, rgb


def write_ply(
    path,
    elements: Dict[str, Dict[str, np.ndarray]],
    fmt: str = "binary_little_endian",
    comments: Optional[List[str]] = None,
) -> None:
    """Write a PLY: {element: {property: (N,) array}} (insertion ordered)."""
    lines = ["ply", f"format {fmt} 1.0"]
    for c in comments or []:
        lines.append(f"comment {c}")
    rev = {v: k for k, v in _PLY_DTYPES.items()}
    for ename, props in elements.items():
        n = len(next(iter(props.values())))
        lines.append(f"element {ename} {n}")
        for pname, arr in props.items():
            lines.append(f"property {rev[arr.dtype.str[1:]]} {pname}")
    lines.append("end_header")
    with open(path, "wb") as f:
        f.write(("\n".join(lines) + "\n").encode("ascii"))
        for ename, props in elements.items():
            arrs = list(props.values())
            n = len(arrs[0])
            if fmt == "ascii":
                for i in range(n):
                    f.write(
                        (" ".join(str(a[i]) for a in arrs) + "\n").encode("ascii")
                    )
            else:
                endian = "<" if fmt == "binary_little_endian" else ">"
                rec = np.empty(
                    n,
                    dtype=[
                        (pname, endian + a.dtype.str[1:])
                        for pname, a in props.items()
                    ],
                )
                for pname, a in props.items():
                    rec[pname] = a
                f.write(rec.tobytes())


def load_image(path, scale_factor: float = 1.0) -> np.ndarray:
    """uint8 (H, W, 3|4) image (reference base_dataset.py:60-83)."""
    from PIL import Image

    img = Image.open(path)
    if scale_factor != 1.0:
        w, h = img.size
        img = img.resize(
            (round(w * scale_factor), round(h * scale_factor)), Image.BILINEAR
        )
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = np.repeat(arr[..., None], 3, axis=-1)
    return arr


def load_depth(path, depth_unit_scale_factor: float = 1e-3,
               scale_factor: float = 1.0) -> np.ndarray:
    """float32 (H, W) depth in meters: 16-bit png in mm, or .npy
    (reference base_dataset.py:85-129)."""
    path = Path(path)
    if path.suffix == ".npy":
        depth = np.load(path).astype(np.float32)
        if depth.ndim == 3:
            depth = depth[..., 0]
        if scale_factor != 1.0:
            import cv2

            depth = cv2.resize(
                depth, None, fx=scale_factor, fy=scale_factor,
                interpolation=cv2.INTER_NEAREST,
            )
        return depth
    from PIL import Image

    img = Image.open(path)
    if scale_factor != 1.0:
        w, h = img.size
        img = img.resize(
            (round(w * scale_factor), round(h * scale_factor)), Image.NEAREST
        )
    return np.asarray(img).astype(np.float32) * depth_unit_scale_factor


def load_mask(path, scale_factor: float = 1.0) -> np.ndarray:
    """bool (H, W) mask."""
    from PIL import Image

    img = Image.open(path)
    if scale_factor != 1.0:
        w, h = img.size
        img = img.resize(
            (round(w * scale_factor), round(h * scale_factor)), Image.NEAREST
        )
    arr = np.asarray(img)
    if arr.ndim == 3:
        arr = arr[..., 0]
    return arr > 0
