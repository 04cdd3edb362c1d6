"""Equirectangular -> perspective view extraction.

Equivalent of the reference ``process_data/equirect_utils.py`` (365 LoC):
sample a set of planar pinhole views out of 360° equirectangular captures so
they can run through the standard SfM + splat pipeline.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Tuple

import numpy as np


def perspective_from_equirect(
    equirect: np.ndarray,
    yaw: float,
    pitch: float,
    fov_deg: float = 90.0,
    out_hw: Tuple[int, int] = (720, 960),
) -> np.ndarray:
    """Extract one pinhole view (yaw/pitch radians) from an equirect image."""
    import cv2

    h_out, w_out = out_hw
    f = 0.5 * w_out / np.tan(0.5 * np.deg2rad(fov_deg))
    xs = (np.arange(w_out) - w_out / 2 + 0.5) / f
    ys = (np.arange(h_out) - h_out / 2 + 0.5) / f
    xg, yg = np.meshgrid(xs, ys)
    dirs = np.stack([xg, yg, np.ones_like(xg)], axis=-1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    d = dirs @ (ry @ rx).T

    he, we = equirect.shape[:2]
    lon = np.arctan2(d[..., 0], d[..., 2])
    lat = np.arcsin(np.clip(d[..., 1], -1, 1))
    u = ((lon / (2 * np.pi) + 0.5) * we).astype(np.float32)
    v = ((lat / np.pi + 0.5) * he).astype(np.float32)
    return cv2.remap(
        equirect, u, v, interpolation=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_WRAP,
    )


def generate_planar_projections_from_equirectangular(
    image_dir: Path,
    out_dir: Path,
    samples_per_image: int = 8,
    fov_deg: float = 90.0,
    out_hw: Tuple[int, int] = (720, 960),
) -> List[Path]:
    """Sample ``samples_per_image`` yaw-spaced views (plus up/down) for every
    equirect image in ``image_dir``."""
    import cv2

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    written = []
    yaws = np.linspace(0, 2 * np.pi, samples_per_image, endpoint=False)
    files = sorted(
        p for p in Path(image_dir).iterdir()
        if p.suffix.lower() in (".jpg", ".jpeg", ".png")
    )
    for p in files:
        img = cv2.imread(str(p), cv2.IMREAD_COLOR)
        for j, yaw in enumerate(yaws):
            view = perspective_from_equirect(img, yaw, 0.0, fov_deg, out_hw)
            out = out_dir / f"{p.stem}_view{j:02d}.png"
            cv2.imwrite(str(out), view)
            written.append(out)
    return written
