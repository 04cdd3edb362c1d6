"""Build + run the C++ aruco_eval tool; cross-check detection with cv2."""

import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parent.parent
TOOL_DIR = ROOT / "tools" / "cpp" / "aruco_eval"


@pytest.fixture(scope="module")
def binary(tmp_path_factory):
    if shutil.which("cmake") is None:
        pytest.skip("cmake not available")
    build = tmp_path_factory.mktemp("build_aruco")
    try:
        subprocess.run(
            ["cmake", "-S", str(TOOL_DIR), "-B", str(build)],
            check=True, capture_output=True,
        )
        subprocess.run(
            ["cmake", "--build", str(build)], check=True, capture_output=True
        )
    except subprocess.CalledProcessError as e:
        pytest.skip(f"OpenCV C++ build unavailable: {e.stderr[-200:]}")
    return build / "aruco_eval"


def test_generate_and_detect(binary, tmp_path):
    import cv2

    board_png = tmp_path / "board.png"
    out = subprocess.run(
        [str(binary), "generate", str(board_png)],
        check=True, capture_output=True, text=True,
    )
    assert board_png.exists()

    # cross-check with the Python bindings: 5x7 charuco has 17 markers
    img = cv2.imread(str(board_png), cv2.IMREAD_GRAYSCALE)
    d = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_5X5_100)
    corners, ids, _ = cv2.aruco.ArucoDetector(d).detectMarkers(img)
    assert ids is not None and len(ids) == 17

    # fabricate a plausible calibration and run the C++ detector
    calib = tmp_path / "calib.yml"
    calib.write_text(
        "%YAML:1.0\n---\n"
        "camera_matrix: !!opencv-matrix\n"
        "   rows: 3\n   cols: 3\n   dt: d\n"
        "   data: [1000., 0., 500., 0., 1000., 700., 0., 0., 1.]\n"
        "dist_coeffs: !!opencv-matrix\n"
        "   rows: 1\n   cols: 5\n   dt: d\n"
        "   data: [0., 0., 0., 0., 0.]\n"
    )
    out = subprocess.run(
        [str(binary), "detect", str(calib), str(board_png)],
        check=True, capture_output=True, text=True,
    ).stdout
    assert "detected 17 markers" in out

    # measure distance between two detected markers: board squares are 4 cm,
    # markers live in alternating squares — any pair distance is a lattice
    # distance in multiples of ~4 cm
    out = subprocess.run(
        [str(binary), "measure", str(calib), str(board_png), "0", "1", "0.02"],
        check=True, capture_output=True, text=True,
    ).stdout
    dist = float(out.split("distance_m:")[1].strip())
    assert 0.03 < dist < 0.5
    # lattice check: distance should be close to a multiple of sqrt of
    # (k^2+l^2)*squareLen with squareLen=0.04
    ratio = dist / 0.04
    lattice = [np.hypot(k, l) for k in range(0, 8) for l in range(0, 8)][1:]
    assert min(abs(ratio - v) for v in lattice) < 0.08, dist
