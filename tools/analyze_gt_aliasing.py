"""Per-view achievable-PSNR ceiling of the raytraced dataset's own GT.

The dataset generator (data/raytraced.py) traces ONE ray per pixel
(pixel centers, no supersampling) over hard-edged procedural textures
(checker ground plane). At grazing incidence the texture frequency
crosses Nyquist and the 1-spp GT contains view-incoherent speckle that
NO smooth scene representation can reproduce. A supersampled render of
the same analytic scene is the band-limited image a perfect smooth
model would converge to, so

    ceiling(view) ~= PSNR(gt_1spp, gt_supersampled)

upper-bounds any splat model's achievable PSNR against the shipped GT.
This tool computes that ceiling for every eval view and prints it next
to the model's achieved per-view PSNR (eval_240_30k.json) — separating
"method limitation" from "dataset aliasing" in the quality roofline
(docs/RESULTS_240_30K.md).

CPU/numpy only; no TPU use.
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gstk_tpu.data.raytraced import _orbit_pose, build_scene, shade  # noqa: E402


def render(objs, c2w, w, h, fx, cx, cy, ss):
    """ss x ss jittered-grid supersampled render, box-filtered to (h, w)."""
    offs = (np.arange(ss) + 0.5) / ss  # stratified within the pixel
    acc = np.zeros((h * w, 3), np.float64)
    alpha = np.zeros((h * w,), np.float64)
    for oy in offs:
        for ox in offs:
            u, v = np.meshgrid(np.arange(w) + ox, np.arange(h) + oy)
            dir_cam = np.stack(
                [(u - cx) / fx, -(v - cy) / fx, -np.ones_like(u)], axis=-1
            ).reshape(-1, 3)
            d = dir_cam @ c2w[:3, :3].T
            o = np.broadcast_to(c2w[:3, 3], d.shape)
            rgb, t, hit = shade(objs, o, d)
            acc += rgb
            alpha += hit.astype(np.float64)
    n = ss * ss
    return (acc / n).reshape(h, w, 3), (alpha / n).reshape(h, w)


def main():
    n_views = 240
    w = h = 800
    fov_deg = 40.0
    ss = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    fx = 0.5 * w / np.tan(np.radians(fov_deg) / 2)
    cx, cy = w / 2.0, h / 2.0
    objs = build_scene()

    eval_json = Path("/root/runs/eval_240_30k.json")
    achieved = None
    if eval_json.exists():
        achieved = json.load(open(eval_json))["per_image"]["psnr"]

    # quantized 1-spp render == the shipped GT (uint8 PNG); compare the
    # supersampled reference against the same uint8 quantization the
    # model trains on. Composite both over black like the eval path with
    # a black background and alpha GT.
    rows = []
    saved = []
    print(f"{'eval':>4s} {'frame':>5s} {'ring':>4s} {'ceilPSNR':>8s} "
          f"{'achieved':>8s}")
    for ei in range(30):
        i = ei * 8
        ring = i % 3
        radius = (7.2, 6.2, 5.2)[ring]
        height = (1.2, 2.8, 4.2)[ring]
        angle = 2 * np.pi * i / n_views + 0.21 * ring
        c2w = _orbit_pose(radius, height, angle)

        img1, a1 = render(objs, c2w, w, h, fx, cx, cy, ss=1)
        imgS, aS = render(objs, c2w, w, h, fx, cx, cy, ss=ss)
        # shipped GT quantizes to uint8 and stores alpha; eval composites
        # premultiplied rgb*alpha over black (EVAL_BACKGROUND is black for
        # the raytraced runs)
        gt1 = np.rint(img1 * 255) / 255.0 * (a1 >= 0.5)[..., None]
        gtS = imgS * aS[..., None]
        if "--save" in sys.argv:
            saved.append(gtS.astype(np.float32))
        mse = np.mean((gt1 - gtS) ** 2)
        ceil = -10 * np.log10(max(mse, 1e-10))
        ach = achieved[ei] if achieved else float("nan")
        rows.append((ei, i, ring, ceil, ach))
        print(f"{ei:4d} {i:5d} {ring:4d} {ceil:8.2f} {ach:8.2f}")

    arr = np.array([[r[2], r[3], r[4]] for r in rows])
    for ring in (0, 1, 2):
        m = arr[:, 0] == ring
        print(f"ring {ring}: ceiling mean {arr[m, 1].mean():.2f}  "
              f"achieved mean {arr[m, 2].mean():.2f}")
    print(f"all: ceiling mean {arr[:, 1].mean():.2f}  "
          f"achieved mean {arr[:, 2].mean():.2f}")
    if "--save" in sys.argv:
        np.savez_compressed(
            "/root/runs/gtS_eval.npz", gts=np.stack(saved), ss=ss
        )
        print("saved supersampled eval GTs -> /root/runs/gtS_eval.npz")


if __name__ == "__main__":
    main()
