"""Shared synthetic scene builders for kernel tests."""

import numpy as np


def make_camera(img_w=64, img_h=48, fov_deg=60.0):
    fx = 0.5 * img_w / np.tan(0.5 * np.deg2rad(fov_deg))
    fy = fx
    cx, cy = img_w / 2.0, img_h / 2.0
    viewmat = np.eye(4, dtype=np.float32)  # camera at origin looking +z
    tan_fovx = 0.5 * img_w / fx
    tan_fovy = 0.5 * img_h / fy
    near, far = 0.001, 1000.0
    projmat = np.array(
        [
            [1.0 / tan_fovx, 0, 0, 0],
            [0, 1.0 / tan_fovy, 0, 0],
            [0, 0, (far + near) / (far - near), -far * near / (far - near)],
            [0, 0, 1.0, 0],
        ],
        np.float32,
    )
    fullmat = projmat @ viewmat
    return dict(
        fx=fx, fy=fy, cx=cx, cy=cy, img_w=img_w, img_h=img_h,
        viewmat=viewmat, projmat=projmat, fullmat=fullmat,
    )


def make_gaussians(rng, n=300, depth_range=(2.0, 8.0), spread=3.0):
    means = np.stack(
        [
            rng.uniform(-spread, spread, n),
            rng.uniform(-spread * 0.75, spread * 0.75, n),
            rng.uniform(*depth_range, n),
        ],
        axis=-1,
    ).astype(np.float32)
    scales = np.exp(rng.uniform(-2.5, -0.5, (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opacities = rng.uniform(0.2, 0.95, n).astype(np.float32)
    return means, scales, quats, colors, opacities
