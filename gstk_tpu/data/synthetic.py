"""Synthetic dataset generation: write a complete on-disk training dataset.

Equivalent of the reference's synthetic data generator
(``gs_toolkit/data/datasynthetic/object_generation.py``): procedurally build
a colored-Gaussian object, render posed views with the framework's own
renderer, and write a standard dataset directory (images/, depths/,
sparse.ply seed cloud, transforms.json) that the full CLI pipeline —
gs-train, gs-eval, gs-render, gs-export — can consume. Used by the E2E CLI
smoke tests and as an offline demo dataset.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Tuple

import numpy as np


def generate_synthetic_dataset(
    out_dir: Path,
    n_points: int = 1500,
    n_views: int = 12,
    img_wh: Tuple[int, int] = (96, 72),
    seed: int = 0,
    object_kind: str = "blobs",  # blobs | sphere | cube
    write_depth: bool = True,
) -> Path:
    """Create the dataset under ``out_dir``; returns the directory."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from gstk_tpu.core.cameras import Camera
    from gstk_tpu.core.gaussians import init_scene
    from gstk_tpu.models.vanilla import render_scene
    from gstk_tpu.ops.rasterize import RasterizeConfig
    from gstk_tpu.utils.io import write_ply

    rng = np.random.default_rng(seed)
    w, h = img_wh
    out_dir = Path(out_dir)
    (out_dir / "images").mkdir(parents=True, exist_ok=True)
    if write_depth:
        (out_dir / "depths").mkdir(exist_ok=True)

    if object_kind == "sphere":
        d = rng.normal(size=(n_points, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        pts = (d * rng.uniform(0.9, 1.1, (n_points, 1))).astype(np.float32)
    elif object_kind == "cube":
        pts = rng.uniform(-1, 1, (n_points, 3)).astype(np.float32)
        axis = rng.integers(0, 3, n_points)
        sign = rng.choice([-1.0, 1.0], n_points)
        pts[np.arange(n_points), axis] = sign
    else:
        centers = rng.uniform(-1, 1, (6, 3))
        which = rng.integers(0, 6, n_points)
        pts = (
            centers[which] + rng.normal(0, 0.25, (n_points, 3))
        ).astype(np.float32)
    rgb = rng.uniform(30, 225, (n_points, 3)).astype(np.float32)

    scene = init_scene(
        jax.random.PRNGKey(seed), 1 << int(np.ceil(np.log2(n_points + 1))),
        (pts, rgb), sh_degree=0,
    )
    scene = scene._replace(
        opacities=jnp.full_like(scene.opacities, 1.5),
        scales=scene.scales + 0.3,
    )
    raster = RasterizeConfig(chunk_size=32, isect_capacity=1 << 17)
    fx = 0.9 * w
    frames = []
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        c, s = np.cos(ang), np.sin(ang)
        rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        c2w = np.zeros((4, 4), np.float32)
        c2w[:3, :3] = rot
        c2w[:3, 3] = rot @ np.array([0, 0.3, 5.0], np.float32)
        c2w[3, 3] = 1.0
        camera = Camera(
            fx=jnp.float32(fx), fy=jnp.float32(fx),
            cx=jnp.float32(w / 2), cy=jnp.float32(h / 2),
            c2w=jnp.asarray(c2w[:3]),
        )
        outp = render_scene(
            scene, camera, h, w, sh_degree=0,
            background=jnp.zeros(3), raster_config=raster,
        )
        rgba = np.concatenate(
            [
                np.clip(np.asarray(outp["rgb"]), 0, 1),
                np.clip(np.asarray(outp["alpha"]), 0, 1)[..., None],
            ],
            axis=-1,
        )
        img = (rgba * 255).astype(np.uint8)
        name = f"frame_{i:05d}.png"
        Image.fromarray(img).save(out_dir / "images" / name)
        frame = {
            "file_path": f"images/{name}",
            "transform_matrix": c2w.tolist(),
        }
        if write_depth:
            depth_mm = (np.asarray(outp["depth"]) * 1000).astype(np.uint16)
            dname = f"depth_{i:05d}.png"
            Image.fromarray(depth_mm).save(out_dir / "depths" / dname)
            frame["depth_path"] = f"depths/{dname}"
        frames.append(frame)

    write_ply(
        out_dir / "sparse.ply",
        {
            "vertex": {
                "x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2],
                "red": rgb[:, 0].astype(np.uint8),
                "green": rgb[:, 1].astype(np.uint8),
                "blue": rgb[:, 2].astype(np.uint8),
            }
        },
    )
    meta = {
        "fl_x": fx, "fl_y": fx, "cx": w / 2, "cy": h / 2, "w": w, "h": h,
        "camera_model": "OPENCV",
        "ply_file_path": "sparse.ply",
        "frames": frames,
    }
    with open(out_dir / "transforms.json", "w") as f:
        json.dump(meta, f, indent=2)
    return out_dir


def main(argv=None) -> None:
    import argparse

    parser = argparse.ArgumentParser("gs-synthetic-data")
    parser.add_argument("--output-dir", type=Path, required=True)
    parser.add_argument("--n-points", type=int, default=1500)
    parser.add_argument("--n-views", type=int, default=12)
    parser.add_argument("--width", type=int, default=96)
    parser.add_argument("--height", type=int, default=72)
    parser.add_argument("--object", type=str, default="blobs",
                        choices=["blobs", "sphere", "cube"])
    args = parser.parse_args(argv)
    out = generate_synthetic_dataset(
        args.output_dir, args.n_points, args.n_views,
        (args.width, args.height), object_kind=args.object,
    )
    print(f"Synthetic dataset written to {out}")


if __name__ == "__main__":
    main()
