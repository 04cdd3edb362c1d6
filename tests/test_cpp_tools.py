"""Build + run the C++ surface_distance tool on synthetic geometry."""

import shutil
import struct
import subprocess
from pathlib import Path

import numpy as np
import pytest

from gstk_tpu.utils.io import write_ply

ROOT = Path(__file__).resolve().parent.parent
TOOL_DIR = ROOT / "tools" / "cpp" / "surface_distance"


def _write_cube_stl(path, half=1.0):
    """Binary STL of a cube [-half, half]^3 (12 triangles)."""
    h = half
    v = np.array(
        [[x, y, z] for x in (-h, h) for y in (-h, h) for z in (-h, h)],
        np.float32,
    )
    # faces as vertex index triplets (two per cube face)
    faces = [
        (0, 1, 3), (0, 3, 2),  # x = -h
        (4, 6, 7), (4, 7, 5),  # x = +h
        (0, 4, 5), (0, 5, 1),  # y = -h
        (2, 3, 7), (2, 7, 6),  # y = +h
        (0, 2, 6), (0, 6, 4),  # z = -h
        (1, 5, 7), (1, 7, 3),  # z = +h
    ]
    with open(path, "wb") as f:
        f.write(b"\x00" * 80)
        f.write(struct.pack("<I", len(faces)))
        for a, b, c in faces:
            f.write(struct.pack("<3f", 0, 0, 0))
            for idx in (a, b, c):
                f.write(struct.pack("<3f", *v[idx]))
            f.write(struct.pack("<H", 0))


@pytest.fixture(scope="module")
def binary(tmp_path_factory):
    if shutil.which("cmake") is None:
        pytest.skip("cmake not available")
    build = tmp_path_factory.mktemp("build_sd")
    subprocess.run(
        ["cmake", "-S", str(TOOL_DIR), "-B", str(build)],
        check=True, capture_output=True,
    )
    subprocess.run(
        ["cmake", "--build", str(build)], check=True, capture_output=True
    )
    return build / "surface_distance"


def test_surface_distance_on_cube(binary, tmp_path, rng):
    _write_cube_stl(tmp_path / "cube.stl", half=1.0)
    # points exactly on the cube surface (faces z = +-1)
    n = 500
    xy = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    z = np.where(rng.uniform(size=n) > 0.5, 1.0, -1.0).astype(np.float32)
    pts_on = np.column_stack([xy, z])
    # points offset outward by exactly 0.1
    pts_off = pts_on.copy()
    pts_off[:, 2] += np.sign(pts_off[:, 2]) * 0.1

    for pts, expected in ((pts_on, 0.0), (pts_off, 0.1)):
        write_ply(
            tmp_path / "pts.ply",
            {"vertex": {"x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2]}},
        )
        out = subprocess.run(
            [str(binary), str(tmp_path / "cube.stl"), str(tmp_path / "pts.ply")],
            check=True, capture_output=True, text=True,
        ).stdout
        mean = float(
            [ln for ln in out.splitlines() if "mean_distance" in ln][0].split()[-1]
        )
        assert abs(mean - expected) < 1e-5, out
