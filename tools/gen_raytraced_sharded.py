"""Sharded (multi-process) raytraced dataset generation.

The serial generator (data/raytraced.py) renders ~1 view/20 s at 800x800
with --supersample 3; a 240-view band-limited dataset costs hours on one
core. This driver shards the view loop across worker processes (each
rendering views shard::nshards with per-view-seeded RNG) and then merges
frames + seed clouds into the same transforms.json/sparse.ply layout.

Usage:
  python tools/gen_raytraced_sharded.py --output-dir /root/data/rt_ss3 \
      --n-views 240 --supersample 3 --workers 3        # driver
  (workers are spawned internally)
"""

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def render_shard(out_dir, n_views, img_wh, shard, nshards, supersample,
                 fov_deg=40.0):
    from PIL import Image

    from gstk_tpu.data.raytraced import _orbit_pose, build_scene, shade

    out_dir = Path(out_dir)
    w, h = img_wh
    fx = 0.5 * w / np.tan(np.radians(fov_deg) / 2)
    cx, cy = w / 2.0, h / 2.0
    objs = build_scene()
    ss = max(int(supersample), 1)

    u, v = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
    dir_cam = np.stack(
        [(u - cx) / fx, -(v - cy) / fx, -np.ones_like(u)], axis=-1
    ).reshape(-1, 3)
    sub_dirs = []
    for oy in (np.arange(ss) + 0.5) / ss:
        for ox in (np.arange(ss) + 0.5) / ss:
            uu, vv = np.meshgrid(np.arange(w) + ox, np.arange(h) + oy)
            sub_dirs.append(np.stack(
                [(uu - cx) / fx, -(vv - cy) / fx, -np.ones_like(uu)],
                axis=-1,
            ).reshape(-1, 3))

    frames, cloud_pts, cloud_rgb = [], [], []
    for i in range(shard, n_views, nshards):
        rng = np.random.default_rng(1000 + i)
        ring = i % 3
        radius = (7.2, 6.2, 5.2)[ring]
        height = (1.2, 2.8, 4.2)[ring]
        angle = 2 * np.pi * i / n_views + 0.21 * ring
        c2w = _orbit_pose(radius, height, angle)
        o = np.broadcast_to(c2w[:3, 3], dir_cam.shape)
        d = dir_cam @ c2w[:3, :3].T
        rgb, t, hit = shade(objs, o, d)  # center ray: depth + seeds
        if ss > 1:
            acc = np.zeros_like(rgb)
            acc_hit = np.zeros(rgb.shape[0])
            for sd in sub_dirs:
                r2, _, h2 = shade(objs, o, sd @ c2w[:3, :3].T)
                acc += r2
                acc_hit += h2.astype(np.float64)
            rgb_img = acc / (ss * ss)
            hit_img = acc_hit / (ss * ss) >= 0.5
        else:
            rgb_img, hit_img = rgb, hit

        img = np.zeros((h * w, 4), np.uint8)
        img[:, :3] = (rgb_img * 255).astype(np.uint8)
        img[:, 3] = np.where(hit_img, 255, 0)
        name = f"frame_{i:05d}.png"
        Image.fromarray(img.reshape(h, w, 4)).save(out_dir / "images" / name)
        depth_mm = np.where(hit, t * 1000.0, 0.0)
        depth_mm = np.clip(depth_mm, 0, 65535).astype(np.uint16)
        dname = f"depth_{i:05d}.png"
        Image.fromarray(depth_mm.reshape(h, w)).save(
            out_dir / "depths" / dname
        )
        frames.append((i, {
            "file_path": f"images/{name}",
            "depth_path": f"depths/{dname}",
            "transform_matrix": c2w.tolist(),
        }))
        hit_idx = np.flatnonzero(hit)
        if hit_idx.size:
            take = rng.choice(hit_idx, min(4000, hit_idx.size),
                              replace=False)
            p = o[take] + d[take] * t[take, None]
            p = p + rng.normal(0, 0.004, p.shape)
            cloud_pts.append(p.astype(np.float32))
            cloud_rgb.append((rgb[take] * 255).astype(np.float32))

    np.savez_compressed(
        out_dir / f"shard_{shard}.npz",
        idx=np.array([i for i, _ in frames]),
        frames=json.dumps([f for _, f in frames]),
        pts=np.concatenate(cloud_pts),
        rgb=np.concatenate(cloud_rgb),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output-dir", type=Path, required=True)
    ap.add_argument("--n-views", type=int, default=240)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--seed-points", type=int, default=160_000)
    ap.add_argument("--supersample", type=int, default=3)
    ap.add_argument("--workers", type=int, default=3)
    ap.add_argument("--shard", type=int, default=None, help="internal")
    args = ap.parse_args()

    out = args.output_dir
    if args.shard is not None:
        render_shard(out, args.n_views, (args.width, args.height),
                     args.shard, args.workers, args.supersample)
        return

    (out / "images").mkdir(parents=True, exist_ok=True)
    (out / "depths").mkdir(exist_ok=True)
    procs = [
        subprocess.Popen([
            sys.executable, __file__, "--output-dir", str(out),
            "--n-views", str(args.n_views), "--width", str(args.width),
            "--height", str(args.height),
            "--supersample", str(args.supersample),
            "--workers", str(args.workers), "--shard", str(s),
        ])
        for s in range(args.workers)
    ]
    for p in procs:
        assert p.wait() == 0, "shard failed"

    # merge
    from gstk_tpu.utils.io import write_ply

    frames_by_idx, pts, cols = {}, [], []
    for s in range(args.workers):
        z = np.load(out / f"shard_{s}.npz", allow_pickle=False)
        for i, f in zip(z["idx"], json.loads(str(z["frames"]))):
            frames_by_idx[int(i)] = f
        pts.append(z["pts"])
        cols.append(z["rgb"])
        (out / f"shard_{s}.npz").unlink()
    pts = np.concatenate(pts)
    cols = np.concatenate(cols)
    rng = np.random.default_rng(0)
    if pts.shape[0] > args.seed_points:
        sel = rng.choice(pts.shape[0], args.seed_points, replace=False)
        pts, cols = pts[sel], cols[sel]
    write_ply(
        out / "sparse.ply",
        {"vertex": {
            "x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2],
            "red": cols[:, 0].astype(np.uint8),
            "green": cols[:, 1].astype(np.uint8),
            "blue": cols[:, 2].astype(np.uint8),
        }},
    )
    w, h = args.width, args.height
    fx = 0.5 * w / np.tan(np.radians(40.0) / 2)
    meta = {
        "fl_x": fx, "fl_y": fx, "cx": w / 2.0, "cy": h / 2.0,
        "w": w, "h": h, "camera_model": "OPENCV",
        "ply_file_path": "sparse.ply",
        "frames": [frames_by_idx[i] for i in range(args.n_views)],
    }
    (out / "transforms.json").write_text(json.dumps(meta, indent=2))
    print(f"sharded raytraced dataset written to {out}")


if __name__ == "__main__":
    main()
