"""Raytraced synthetic dataset: a high-fidelity offline stand-in for a real
captured scene.

The toy Gaussian-rendered generator (``synthetic.py``) cannot expose SH or
densification pathologies — its ground truth is itself made of Gaussians.
This module raytraces an *analytic* textured scene (checkered ground plane,
marble/striped/checkered spheres, colored boxes) with Lambertian shading,
two lights, and hard shadows, entirely in vectorized numpy on the host, and
writes the standard dataset layout (images/, depths/, sparse.ply seed
cloud, transforms.json) that gs-train consumes.

Used for the full reference-recipe training runs (15k iterations, SH
degree 3, full densify/cull schedule — reference operating point
``gs_toolkit/configs/method_configs.py:41``): view-dependent shading,
sharp texture edges, occlusion boundaries and shadows give the densifier
and the SH bands something real to fit.

Cameras use the repo's OpenGL c2w convention (look along -z, y up); depth
maps store view-space z in millimeters (16-bit png), matching the
dataparser contract. The seed cloud backprojects shaded hit points from the
training views with small positional noise — an honest SfM analog.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Tuple

import numpy as np


# ----------------------------------------------------------------------
# procedural textures
# ----------------------------------------------------------------------

def _hash3(ix, iy, iz, seed):
    h = (
        ix.astype(np.int64) * 374761393
        + iy.astype(np.int64) * 668265263
        + iz.astype(np.int64) * 2147483647
        + np.int64(seed) * 104729
    )
    h = (h ^ (h >> 13)) * 1274126177
    h = h ^ (h >> 16)
    return (h & 0xFFFFFF).astype(np.float64) / float(0xFFFFFF)


def _value_noise(p, seed=0):
    """Trilinear value noise in [0,1], p (N,3)."""
    pf = np.floor(p)
    f = p - pf
    f = f * f * (3.0 - 2.0 * f)
    ix, iy, iz = pf[:, 0], pf[:, 1], pf[:, 2]
    n = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (
                    (f[:, 0] if dx else 1 - f[:, 0])
                    * (f[:, 1] if dy else 1 - f[:, 1])
                    * (f[:, 2] if dz else 1 - f[:, 2])
                )
                n = n + w * _hash3(ix + dx, iy + dy, iz + dz, seed)
    return n


def _fbm(p, octaves=4, seed=0):
    out = np.zeros(p.shape[0])
    amp, freq, norm = 1.0, 1.0, 0.0
    for o in range(octaves):
        out += amp * _value_noise(p * freq, seed + o)
        norm += amp
        amp *= 0.5
        freq *= 2.17
    return out / norm


def _checker(p, scale=1.0):
    q = np.floor(p * scale).astype(np.int64)
    return ((q[:, 0] + q[:, 2]) % 2).astype(np.float64)


# ----------------------------------------------------------------------
# scene primitives
# ----------------------------------------------------------------------

class _Sphere:
    def __init__(self, center, radius, tex):
        self.c = np.asarray(center, np.float64)
        self.r = float(radius)
        self.tex = tex

    def intersect(self, o, d):
        # rays are unnormalized (pinhole z = -1), so keep the full
        # quadratic a t^2 + 2 b t + c with a = d.d
        oc = o - self.c
        a = np.einsum("ij,ij->i", d, d)
        b = np.einsum("ij,ij->i", oc, d)
        c = np.einsum("ij,ij->i", oc, oc) - self.r * self.r
        disc = b * b - a * c
        ok = disc > 0
        sq = np.sqrt(np.maximum(disc, 0))
        t = np.where(ok, (-b - sq) / a, np.inf)
        t = np.where(t > 1e-4, t, np.where(ok, (-b + sq) / a, np.inf))
        return np.where(t > 1e-4, t, np.inf)

    def normal(self, p):
        n = p - self.c
        return n / np.linalg.norm(n, axis=-1, keepdims=True)

    def albedo(self, p):
        return self.tex(p, self)


class _Box:
    def __init__(self, lo, hi, tex):
        self.lo = np.asarray(lo, np.float64)
        self.hi = np.asarray(hi, np.float64)
        self.tex = tex

    def intersect(self, o, d):
        inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
        t0 = (self.lo - o) * inv
        t1 = (self.hi - o) * inv
        tmin = np.minimum(t0, t1).max(axis=1)
        tmax = np.maximum(t0, t1).min(axis=1)
        hit = (tmax > np.maximum(tmin, 1e-4))
        return np.where(hit & (tmin > 1e-4), tmin, np.inf)

    def normal(self, p):
        eps = 1e-4
        n = np.zeros_like(p)
        for a in range(3):
            lo_f = np.abs(p[:, a] - self.lo[a]) < eps
            hi_f = np.abs(p[:, a] - self.hi[a]) < eps
            n[lo_f, a] = -1.0
            n[hi_f, a] = 1.0
        nl = np.linalg.norm(n, axis=-1, keepdims=True)
        return n / np.where(nl == 0, 1, nl)

    def albedo(self, p):
        return self.tex(p, self)


class _Plane:
    """y = const ground plane."""

    def __init__(self, y, tex):
        self.y = float(y)
        self.tex = tex

    def intersect(self, o, d):
        t = (self.y - o[:, 1]) / np.where(np.abs(d[:, 1]) < 1e-12, 1e-12, d[:, 1])
        return np.where(t > 1e-4, t, np.inf)

    def normal(self, p):
        n = np.zeros_like(p)
        n[:, 1] = 1.0
        return n

    def albedo(self, p):
        return self.tex(p, self)


# ----------------------------------------------------------------------
# textures
# ----------------------------------------------------------------------

def _tex_ground(p, _):
    ck = _checker(p, 0.9)[:, None]
    a = np.array([0.82, 0.78, 0.72])
    b = np.array([0.28, 0.3, 0.36])
    base = ck * a + (1 - ck) * b
    dust = _fbm(p * 0.7, 3, seed=11)[:, None]
    return base * (0.8 + 0.4 * dust)


def _tex_marble(tint):
    tint = np.asarray(tint)

    def tex(p, _):
        v = _fbm(p * 2.2, 4, seed=5)
        veins = 0.5 + 0.5 * np.sin(6.0 * p[:, 1] + 9.0 * v)
        return (0.25 + 0.75 * veins[:, None]) * tint

    return tex


def _tex_stripes(c1, c2, freq=8.0, axis=1):
    c1, c2 = np.asarray(c1), np.asarray(c2)

    def tex(p, obj):
        rel = p - obj.c
        s = 0.5 + 0.5 * np.sin(freq * np.arctan2(rel[:, 2], rel[:, 0]))
        band = (s > 0.5).astype(np.float64)[:, None]
        return band * c1 + (1 - band) * c2

    return tex


def _tex_check_faces(c1, c2, scale=3.0):
    c1, c2 = np.asarray(c1), np.asarray(c2)

    def tex(p, _):
        q = np.floor(p * scale).astype(np.int64)
        ck = ((q[:, 0] + q[:, 1] + q[:, 2]) % 2).astype(np.float64)[:, None]
        return ck * c1 + (1 - ck) * c2

    return tex


def _tex_noise(tint, freq=3.0, seed=23):
    tint = np.asarray(tint)

    def tex(p, _):
        v = _fbm(p * freq, 4, seed=seed)[:, None]
        return (0.3 + 0.7 * v) * tint

    return tex


def build_scene():
    """The fixed benchmark scene: ground + 8 textured primitives."""
    objs = [
        _Plane(-1.2, _tex_ground),
        _Sphere([0.0, -0.2, 0.0], 1.0, _tex_marble([0.9, 0.85, 0.8])),
        _Sphere([1.9, -0.65, 0.9], 0.55, _tex_stripes(
            [0.85, 0.2, 0.15], [0.95, 0.85, 0.3], freq=10.0)),
        _Sphere([-1.8, -0.5, 1.2], 0.7, _tex_noise([0.2, 0.55, 0.9], 4.0)),
        _Sphere([-1.2, -0.85, -1.6], 0.35, _tex_stripes(
            [0.15, 0.7, 0.35], [0.9, 0.9, 0.95], freq=14.0)),
        _Box([0.9, -1.2, -2.2], [1.9, -0.2, -1.2],
             _tex_check_faces([0.85, 0.5, 0.15], [0.3, 0.2, 0.5], 2.5)),
        _Box([-2.6, -1.2, -0.6], [-1.9, 0.1, 0.1],
             _tex_noise([0.75, 0.3, 0.55], 5.0, seed=41)),
        _Sphere([0.9, -0.9, 2.1], 0.3, _tex_marble([0.4, 0.9, 0.6])),
        _Box([-0.5, -1.2, 2.0], [0.3, -0.7, 2.6],
             _tex_check_faces([0.2, 0.75, 0.8], [0.95, 0.95, 0.9], 4.0)),
    ]
    return objs


_L1 = np.array([0.45, 1.0, 0.35])
_L1 /= np.linalg.norm(_L1)
_L2 = np.array([-0.55, 0.55, -0.3])
_L2 /= np.linalg.norm(_L2)


def _trace(objs, o, d):
    """Nearest hit: returns (t, obj_idx). o,d (N,3); t inf on miss."""
    t_best = np.full(o.shape[0], np.inf)
    idx = np.full(o.shape[0], -1, np.int64)
    for i, obj in enumerate(objs):
        t = obj.intersect(o, d)
        m = t < t_best
        t_best = np.where(m, t, t_best)
        idx[m] = i
    return t_best, idx


def _occluded(objs, p, light_dir):
    o = p + light_dir * 1e-3
    d = np.broadcast_to(light_dir, o.shape)
    occ = np.zeros(o.shape[0], bool)
    for obj in objs:
        t = obj.intersect(o, d)
        occ |= np.isfinite(t)
    return occ


def shade(objs, o, d):
    """Returns (rgb (N,3) in [0,1], depth_t (N,), hit mask)."""
    t, idx = _trace(objs, o, d)
    hit = np.isfinite(t)
    rgb = np.zeros((o.shape[0], 3))
    if not hit.any():
        return rgb, t, hit
    ph = o[hit] + d[hit] * t[hit, None]
    nh = np.zeros_like(ph)
    alb = np.zeros_like(ph)
    for i, obj in enumerate(objs):
        m = idx[hit] == i
        if m.any():
            nh[m] = obj.normal(ph[m])
            alb[m] = obj.albedo(ph[m])
    lam1 = np.maximum(nh @ _L1, 0.0)
    shadow = _occluded(objs, ph, _L1)
    lam1 = np.where(shadow, 0.0, lam1)
    lam2 = np.maximum(nh @ _L2, 0.0)
    amb = 0.16 + 0.06 * np.maximum(nh[:, 1], 0.0)
    lum = 0.95 * lam1 + 0.32 * lam2 + amb
    rgb[hit] = np.clip(alb * lum[:, None], 0.0, 1.0)
    return rgb, t, hit


def _orbit_pose(radius, height, angle, target=(0.0, -0.4, 0.0)):
    """OpenGL c2w looking at target from an orbit position."""
    eye = np.array(
        [radius * np.cos(angle), height, radius * np.sin(angle)]
    )
    target = np.asarray(target)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    up2 = np.cross(right, fwd)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = up2
    c2w[:3, 2] = -fwd  # OpenGL: camera looks along -z
    c2w[:3, 3] = eye
    return c2w


def generate_raytraced_dataset(
    out_dir: Path,
    n_views: int = 64,
    img_wh: Tuple[int, int] = (800, 800),
    seed_points: int = 160_000,
    seed: int = 0,
    fov_deg: float = 40.0,
    supersample: int = 1,
) -> Path:
    """Raytrace the benchmark scene and write a full dataset directory.

    ``supersample``: rays per pixel axis (ss*ss stratified rays,
    box-filtered). The default 1 matches the original datasets, but a
    1-spp GT carries view-incoherent speckle above Nyquist at grazing
    incidence — measured as a PSNR *ceiling* of ~23 dB on the 240-view
    capture's low ring (tools/analyze_gt_aliasing.py,
    docs/RESULTS_240_30K.md). Use >=3 for band-limited GT whose eval
    PSNR measures the model, not the dataset. Depth stays 1-spp (center
    ray): averaging depth across an edge would invent midair surfaces
    for the sensor-depth losses."""
    from PIL import Image

    from gstk_tpu.utils.io import write_ply

    rng = np.random.default_rng(seed)
    out_dir = Path(out_dir)
    (out_dir / "images").mkdir(parents=True, exist_ok=True)
    (out_dir / "depths").mkdir(exist_ok=True)
    w, h = img_wh
    fx = 0.5 * w / np.tan(np.radians(fov_deg) / 2)
    cx, cy = w / 2.0, h / 2.0
    objs = build_scene()

    u, v = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
    dir_cam = np.stack(
        [(u - cx) / fx, -(v - cy) / fx, -np.ones_like(u)], axis=-1
    ).reshape(-1, 3)

    ss = max(int(supersample), 1)
    sub_dirs = []
    for oy in (np.arange(ss) + 0.5) / ss:
        for ox in (np.arange(ss) + 0.5) / ss:
            uu, vv = np.meshgrid(np.arange(w) + ox, np.arange(h) + oy)
            sub_dirs.append(np.stack(
                [(uu - cx) / fx, -(vv - cy) / fx, -np.ones_like(uu)],
                axis=-1,
            ).reshape(-1, 3))

    frames = []
    cloud_pts, cloud_rgb = [], []
    for i in range(n_views):
        ring = i % 3
        radius = (7.2, 6.2, 5.2)[ring]
        height = (1.2, 2.8, 4.2)[ring]
        angle = 2 * np.pi * i / n_views + 0.21 * ring
        c2w = _orbit_pose(radius, height, angle)
        o = np.broadcast_to(c2w[:3, 3], dir_cam.shape)
        d = dir_cam @ c2w[:3, :3].T
        rgb, t, hit = shade(objs, o, d)
        if ss > 1:
            acc = np.zeros_like(rgb)
            acc_hit = np.zeros(rgb.shape[0])
            for sd in sub_dirs:
                r2, _, h2 = shade(objs, o, sd @ c2w[:3, :3].T)
                acc += r2
                acc_hit += h2.astype(np.float64)
            rgb = acc / (ss * ss)
            hit = acc_hit / (ss * ss) >= 0.5

        img = np.zeros((h * w, 4), np.uint8)
        img[:, :3] = (rgb * 255).astype(np.uint8)
        img[:, 3] = np.where(hit, 255, 0)
        name = f"frame_{i:05d}.png"
        Image.fromarray(img.reshape(h, w, 4)).save(
            out_dir / "images" / name
        )
        # depth = view-space z = t (dir_cam has z = -1)
        depth_mm = np.where(hit, t * 1000.0, 0.0)
        depth_mm = np.clip(depth_mm, 0, 65535).astype(np.uint16)
        dname = f"depth_{i:05d}.png"
        Image.fromarray(depth_mm.reshape(h, w)).save(
            out_dir / "depths" / dname
        )
        frames.append({
            "file_path": f"images/{name}",
            "depth_path": f"depths/{dname}",
            "transform_matrix": c2w.tolist(),
        })

        # SfM-like seed samples: sparse backprojected shaded points
        hit_idx = np.flatnonzero(hit)
        if hit_idx.size:
            take = rng.choice(
                hit_idx, min(4000, hit_idx.size), replace=False
            )
            p = o[take] + d[take] * t[take, None]
            p = p + rng.normal(0, 0.004, p.shape)
            cloud_pts.append(p.astype(np.float32))
            cloud_rgb.append((rgb[take] * 255).astype(np.float32))

    pts = np.concatenate(cloud_pts)
    cols = np.concatenate(cloud_rgb)
    if pts.shape[0] > seed_points:
        sel = rng.choice(pts.shape[0], seed_points, replace=False)
        pts, cols = pts[sel], cols[sel]
    write_ply(
        out_dir / "sparse.ply",
        {
            "vertex": {
                "x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2],
                "red": cols[:, 0].astype(np.uint8),
                "green": cols[:, 1].astype(np.uint8),
                "blue": cols[:, 2].astype(np.uint8),
            }
        },
    )
    meta = {
        "fl_x": fx, "fl_y": fx, "cx": cx, "cy": cy, "w": w, "h": h,
        "camera_model": "OPENCV",
        "ply_file_path": "sparse.ply",
        "frames": frames,
    }
    with open(out_dir / "transforms.json", "w") as f:
        json.dump(meta, f, indent=2)
    return out_dir


def main(argv=None) -> None:
    import argparse

    ap = argparse.ArgumentParser("gs-raytraced-data")
    ap.add_argument("--output-dir", type=Path, required=True)
    ap.add_argument("--n-views", type=int, default=64)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--seed-points", type=int, default=160_000)
    ap.add_argument("--supersample", type=int, default=1,
                    help="rays per pixel axis; >=3 for band-limited GT "
                         "(see generate_raytraced_dataset docstring)")
    args = ap.parse_args(argv)
    out = generate_raytraced_dataset(
        args.output_dir, args.n_views, (args.width, args.height),
        args.seed_points, supersample=args.supersample,
    )
    print(f"Raytraced dataset written to {out}")


if __name__ == "__main__":
    main()
