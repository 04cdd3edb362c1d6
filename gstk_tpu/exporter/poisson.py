"""Grid-based screened-Poisson surface reconstruction + mesh cleanup.

Second meshing backend for ``gs-export offline-tsdf``, the TPU-native
equivalent of the reference's open3d Poisson option + pymeshlab cleanup
(``gs_toolkit/scripts/exporter.py:216-325``). Instead of an octree solver
over an oriented point cloud, we already have a regular TSDF grid
(exporter/tsdf.py), so the reconstruction is formulated directly on it:

  1. the normal field is the TSDF gradient restricted to the narrow band
     (|tsdf| < band), normalized and confidence-weighted;
  2. the indicator chi solves the screened Poisson equation
     (lap - lam*W) chi = div(v) - lam*W*chi0, where chi0 is the clamped
     TSDF sign — the screening term anchors chi to the observed surface
     exactly as the point constraints do in screened Poisson;
  3. Jacobi iterations with a 7-point stencil (pure jnp, jit/TPU-friendly:
     each sweep is one stencil contraction over the volume);
  4. the isosurface chi = 0 is extracted with the existing marching
     tetrahedra.

``clean_mesh`` provides the pymeshlab-analog cleanup: drop small connected
components and optional Laplacian smoothing.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _laplacian(x):
    import jax.numpy as jnp

    return (
        jnp.roll(x, 1, 0) + jnp.roll(x, -1, 0)
        + jnp.roll(x, 1, 1) + jnp.roll(x, -1, 1)
        + jnp.roll(x, 1, 2) + jnp.roll(x, -1, 2)
        - 6.0 * x
    )


def _divergence(vx, vy, vz):
    import jax.numpy as jnp

    return (
        (jnp.roll(vx, -1, 0) - jnp.roll(vx, 1, 0)) * 0.5
        + (jnp.roll(vy, -1, 1) - jnp.roll(vy, 1, 1)) * 0.5
        + (jnp.roll(vz, -1, 2) - jnp.roll(vz, 1, 2)) * 0.5
    )


def poisson_indicator(
    tsdf: np.ndarray,
    weights: Optional[np.ndarray] = None,
    band: float = 1.0,
    screen: float = 4.0,
    iters: int = 200,
) -> np.ndarray:
    """Solve for the indicator chi on the TSDF grid; chi < 0 inside.

    ``tsdf`` is in truncation units (clamped to [-1, 1]); ``weights`` are
    integration confidences (None -> observed = |tsdf| < 1)."""
    import jax
    import jax.numpy as jnp

    t = jnp.asarray(tsdf, jnp.float32)
    if weights is None:
        w_obs = (jnp.abs(t) < 0.999).astype(jnp.float32)
    else:
        w_obs = jnp.clip(jnp.asarray(weights, jnp.float32), 0.0, 1.0)

    # oriented normal field on the narrow band
    gx = (jnp.roll(t, -1, 0) - jnp.roll(t, 1, 0)) * 0.5
    gy = (jnp.roll(t, -1, 1) - jnp.roll(t, 1, 1)) * 0.5
    gz = (jnp.roll(t, -1, 2) - jnp.roll(t, 1, 2)) * 0.5
    nrm = jnp.sqrt(gx * gx + gy * gy + gz * gz)
    in_band = (jnp.abs(t) < band) & (nrm > 1e-6) & (w_obs > 0)
    scale = jnp.where(in_band, 1.0 / jnp.maximum(nrm, 1e-6), 0.0)
    vx, vy, vz = gx * scale, gy * scale, gz * scale

    rhs = _divergence(vx, vy, vz)
    chi0 = jnp.clip(t, -1.0, 1.0)
    lam_w = screen * w_obs

    def body(_, chi):
        # Jacobi update of (lap - lam W) chi = rhs - lam W chi0
        neighbor_sum = _laplacian(chi) + 6.0 * chi
        chi_new = (neighbor_sum - rhs + lam_w * chi0) / (6.0 + lam_w)
        return chi_new

    chi = jax.lax.fori_loop(0, iters, body, chi0)
    return np.asarray(chi)


def poisson_mesh(
    tsdf: np.ndarray,
    weights: np.ndarray,
    colors: np.ndarray,
    origin: np.ndarray,
    voxel_size: float,
    iters: int = 200,
    screen: float = 4.0,
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Extract a mesh via the screened-Poisson indicator (normals from the
    TSDF gradient field). Same signature/return as marching_tetrahedra."""
    from gstk_tpu.exporter.tsdf import marching_tetrahedra

    w = np.asarray(weights)
    chi = poisson_indicator(
        np.asarray(tsdf), np.minimum(w, 1.0), iters=iters, screen=screen
    )
    # reuse the tetrahedral extractor on the indicator: mask unobserved
    # space to positive (outside) so no surface is hallucinated there
    chi = np.where(w > 0, chi, 1.0).astype(np.float32)
    return marching_tetrahedra(
        chi, w, np.asarray(colors), origin=np.asarray(origin),
        voxel_size=voxel_size,
    )


def clean_mesh(
    verts: np.ndarray,
    faces: np.ndarray,
    colors: Optional[np.ndarray] = None,
    min_component_frac: float = 0.05,
    smooth_iters: int = 0,
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """pymeshlab-analog cleanup (reference exporter.py:288-310): drop
    connected components smaller than ``min_component_frac`` of the largest
    and optionally Laplacian-smooth."""
    if len(faces) == 0:
        return verts, faces, colors
    # union-find over face-shared vertices
    parent = np.arange(len(verts))

    def find(a):
        root = a
        while parent[root] != root:
            root = parent[root]
        while parent[a] != root:
            parent[a], a = root, parent[a]
        return root

    for f in faces:
        ra, rb, rc = find(f[0]), find(f[1]), find(f[2])
        parent[rb] = ra
        parent[rc] = ra
    roots = np.array([find(i) for i in range(len(verts))])
    labels, counts = np.unique(roots, return_counts=True)
    keep_roots = set(labels[counts >= min_component_frac * counts.max()])
    keep_v = np.array([r in keep_roots for r in roots])
    if not keep_v.all():
        remap = -np.ones(len(verts), np.int64)
        remap[keep_v] = np.arange(int(keep_v.sum()))
        keep_f = keep_v[faces].all(axis=1)
        faces = remap[faces[keep_f]]
        verts = verts[keep_v]
        if colors is not None:
            colors = colors[keep_v]

    for _ in range(smooth_iters):
        acc = np.zeros_like(verts)
        cnt = np.zeros(len(verts))
        for a, b in ((0, 1), (1, 2), (2, 0)):
            np.add.at(acc, faces[:, a], verts[faces[:, b]])
            np.add.at(acc, faces[:, b], verts[faces[:, a]])
            np.add.at(cnt, faces[:, a], 1)
            np.add.at(cnt, faces[:, b], 1)
        mask = cnt > 0
        verts = verts.copy()
        verts[mask] = 0.5 * verts[mask] + 0.5 * (
            acc[mask] / cnt[mask, None]
        )
    return verts, faces, colors
