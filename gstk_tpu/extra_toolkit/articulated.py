"""Articulated-object pose composition utilities.

Equivalent of the reference ``extra_toolkit/articulated_utils.py``: compose a
joint transform (revolute rotation about an axis through a pivot, or
prismatic translation along an axis) onto subsets of Gaussians — used for
robotics perception scenes with articulated objects.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gstk_tpu.core.gaussians import GaussianScene
from gstk_tpu.core.trajectories import rotmat_to_quat


def axis_angle_rotation(axis, angle) -> jnp.ndarray:
    """Rodrigues rotation matrix for an (3,) axis and scalar angle."""
    axis = jnp.asarray(axis, jnp.float32)
    axis = axis / jnp.linalg.norm(axis)
    kx, ky, kz = axis
    K = jnp.asarray([[0, -kz, ky], [kz, 0, -kx], [-ky, kx, 0]], jnp.float32)
    return jnp.eye(3) + jnp.sin(angle) * K + (1 - jnp.cos(angle)) * (K @ K)


def _quat_multiply(q1, q2):
    """Hamilton product, wxyz."""
    w1, x1, y1, z1 = jnp.split(q1, 4, axis=-1)
    w2, x2, y2, z2 = jnp.split(q2, 4, axis=-1)
    return jnp.concatenate(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def transform_gaussians(
    scene: GaussianScene,
    mask: jax.Array,
    rotation: jnp.ndarray,
    translation: jnp.ndarray,
) -> GaussianScene:
    """Apply (R, t) to the masked Gaussians (means + orientations)."""
    rot_q = jnp.asarray(rotmat_to_quat(np.asarray(rotation)), jnp.float32)
    new_means = scene.means @ rotation.T + translation
    new_quats = _quat_multiply(
        jnp.broadcast_to(rot_q, scene.quats.shape), scene.quats
    )
    m = mask[:, None]
    return scene._replace(
        means=jnp.where(m, new_means, scene.means),
        quats=jnp.where(m, new_quats, scene.quats),
    )


def revolute_joint(
    scene: GaussianScene, mask: jax.Array, pivot, axis, angle
) -> GaussianScene:
    """Rotate masked Gaussians by ``angle`` about ``axis`` through ``pivot``."""
    R = axis_angle_rotation(axis, angle)
    pivot = jnp.asarray(pivot, jnp.float32)
    t = pivot - R @ pivot
    return transform_gaussians(scene, mask, R, t)


def prismatic_joint(
    scene: GaussianScene, mask: jax.Array, axis, displacement
) -> GaussianScene:
    """Translate masked Gaussians along ``axis`` by ``displacement``."""
    axis = jnp.asarray(axis, jnp.float32)
    axis = axis / jnp.linalg.norm(axis)
    return transform_gaussians(
        scene, mask, jnp.eye(3), axis * displacement
    )


def rgbd_to_pointcloud(
    depth: np.ndarray,
    rgb: np.ndarray,
    fx: float, fy: float, cx: float, cy: float,
    c2w_opengl: np.ndarray = None,
    max_depth: float = 10.0,
    mask: np.ndarray = None,
):
    """Backproject an RGB-D frame to a world-space point cloud
    (reference extra_toolkit/pcd_utils.py:5-31, incl. its mask-gated
    depth; ``max_depth`` is its depth_trunc)."""
    h, w = depth.shape
    if mask is not None:
        depth = np.where(mask > 0, depth, 0.0)
    ys, xs = np.nonzero((depth > 0) & (depth < max_depth))
    d = depth[ys, xs]
    x_c = (xs - cx) / fx * d
    y_c = (ys - cy) / fy * d
    pts = np.stack([x_c, y_c, d], axis=-1)  # OpenCV camera frame
    if c2w_opengl is not None:
        pts_gl = np.stack([x_c, -y_c, -d], axis=-1)
        pts = pts_gl @ c2w_opengl[:3, :3].T + c2w_opengl[:3, 3]
    cols = rgb[ys, xs]
    return pts.astype(np.float32), cols


def estimate_normals(points: np.ndarray, k: int = 30) -> np.ndarray:
    """kNN-PCA surface normals (reference pcd_utils.py:28-30 uses open3d's
    KDTreeSearchParamHybrid; here scipy cKDTree + local covariance
    eigenvectors). Normals are unit length with arbitrary sign."""
    from scipy.spatial import cKDTree

    pts = np.asarray(points, np.float64)
    k = min(k, len(pts))
    _, idx = cKDTree(pts).query(pts, k=k)
    nbrs = pts[idx]  # (N, k, 3)
    centered = nbrs - nbrs.mean(axis=1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", centered, centered) / max(k - 1, 1)
    # smallest-eigenvalue eigenvector of each 3x3 covariance
    _, vecs = np.linalg.eigh(cov)
    normals = vecs[:, :, 0]
    norms = np.linalg.norm(normals, axis=-1, keepdims=True)
    return (normals / np.maximum(norms, 1e-12)).astype(np.float32)
