"""Screened-Poisson meshing backend + cleanup (reference
exporter.py:216-325 Poisson/pymeshlab analog)."""

import numpy as np

from gstk_tpu.exporter.poisson import clean_mesh, poisson_indicator, poisson_mesh


def _sphere_tsdf(n=48, r=0.6, trunc=0.08):
    lin = np.linspace(-1, 1, n, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    d = np.sqrt(x * x + y * y + z * z) - r
    tsdf = np.clip(d / trunc, -1, 1).astype(np.float32)
    weights = np.ones_like(tsdf)
    colors = np.ones(tsdf.shape + (3,), np.float32) * 0.5
    return tsdf, weights, colors


def test_poisson_indicator_sign():
    tsdf, w, _ = _sphere_tsdf()
    chi = poisson_indicator(tsdf, w, iters=120)
    n = tsdf.shape[0]
    c = n // 2
    assert chi[c, c, c] < 0  # inside
    assert chi[2, 2, 2] > 0  # outside
    # zero crossing near the true radius along an axis
    line = chi[c, c, :]
    crossings = np.where(np.diff(np.sign(line)) != 0)[0]
    lin = np.linspace(-1, 1, n)
    radii = np.abs(lin[crossings])
    assert np.all(np.abs(radii - 0.6) < 0.08)


def test_poisson_mesh_sphere():
    tsdf, w, colors = _sphere_tsdf()
    n = tsdf.shape[0]
    voxel = 2.0 / (n - 1)
    verts, faces, vcols = poisson_mesh(
        tsdf, w, colors, origin=np.array([-1.0, -1.0, -1.0]),
        voxel_size=voxel, iters=120,
    )
    assert len(verts) > 500 and len(faces) > 500
    radii = np.linalg.norm(verts, axis=1)
    assert abs(np.median(radii) - 0.6) < 0.03
    assert radii.std() < 0.03


def test_clean_mesh_drops_small_components():
    # two tetrahedra: one big-ish (4 verts), one isolated translated copy
    v1 = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32
    )
    f1 = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])
    # tiny component: single triangle far away
    v2 = np.array([[5, 5, 5], [5.1, 5, 5], [5, 5.1, 5]], np.float32)
    f2 = np.array([[4, 5, 6]])
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f2])
    cv, cf, _ = clean_mesh(verts, faces, min_component_frac=0.9)
    assert len(cv) == 4
    assert len(cf) == 4
    assert cf.max() < len(cv)


def test_clean_mesh_smoothing_shrinks_noise():
    rng = np.random.default_rng(0)
    tsdf, w, colors = _sphere_tsdf(n=32)
    verts, faces, vcols = poisson_mesh(
        tsdf, w, colors, origin=np.array([-1.0, -1.0, -1.0]),
        voxel_size=2.0 / 31, iters=80,
    )
    noisy = verts + rng.normal(0, 0.01, verts.shape).astype(np.float32)
    sm, sf, _ = clean_mesh(noisy, faces, vcols, smooth_iters=3)
    r_noisy = np.linalg.norm(noisy, axis=1).std()
    r_smooth = np.linalg.norm(sm, axis=1).std()
    assert r_smooth < r_noisy
