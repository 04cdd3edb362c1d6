"""Exporter tests: Gaussian PLY roundtrip, TSDF fusion + marching tetrahedra."""

import jax
import jax.numpy as jnp
import numpy as np

from gstk_tpu.core.gaussians import init_scene
from gstk_tpu.exporter.gaussian_ply import export_gaussian_ply, load_gaussian_ply
from gstk_tpu.exporter.tsdf import (
    integrate_frames,
    make_volume,
    marching_tetrahedra,
    write_mesh_ply,
)
from gstk_tpu.utils.io import read_ply


def test_gaussian_ply_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(30, 3)).astype(np.float32)
    rgb = rng.uniform(0, 255, (30, 3)).astype(np.float32)
    scene = init_scene(jax.random.PRNGKey(0), 64, (pts, rgb), sh_degree=2)
    n = export_gaussian_ply(tmp_path / "g.ply", scene)
    assert n == 30
    back = load_gaussian_ply(tmp_path / "g.ply")
    assert back.capacity == 30
    np.testing.assert_allclose(np.asarray(back.means), pts, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(back.features_rest), np.asarray(scene.features_rest[:30]),
        atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(back.opacities), np.asarray(scene.opacities[:30]), atol=1e-7
    )
    # header attribute order matches the reference layout
    with open(tmp_path / "g.ply", "rb") as f:
        header = f.read(2000).split(b"end_header")[0].decode()
    names = [
        ln.split()[-1] for ln in header.splitlines() if ln.startswith("property")
    ]
    assert names[:9] == ["x", "y", "z", "nx", "ny", "nz", "f_dc_0", "f_dc_1", "f_dc_2"]
    assert names[-8:] == [
        "opacity", "scale_0", "scale_1", "scale_2",
        "rot_0", "rot_1", "rot_2", "rot_3",
    ]


def test_marching_tetrahedra_sphere():
    # SDF of a sphere radius 8 centered in a 24^3 grid
    n = 24
    g = np.mgrid[0:n, 0:n, 0:n].astype(np.float64)
    center = (n - 1) / 2
    dist = np.sqrt(((g - center) ** 2).sum(axis=0))
    sdf = (dist - 8.0) / 4.0
    verts, faces, _ = marching_tetrahedra(sdf, voxel_size=1.0)
    assert len(verts) > 100 and len(faces) > 100
    r = np.linalg.norm(verts - center, axis=-1)
    np.testing.assert_allclose(r.mean(), 8.0, atol=0.2)
    assert r.std() < 0.2
    assert faces.max() < len(verts)


def test_tsdf_integration_box(tmp_path):
    """Synthetic depth views of a flat wall at z=2 -> reconstructed plane."""
    h = w = 48
    fx = fy = 40.0
    cx, cy = w / 2, h / 2
    depth = np.full((h, w), 2.0, np.float32)
    color = np.full((h, w, 3), 0.5, np.float32)
    w2c = np.eye(4, dtype=np.float32)  # camera at origin, +z forward

    vol = make_volume(origin=(-1.5, -1.5, 0.5), size_xyz=(3, 3, 3), voxel_size=0.05)
    vol = jax.jit(lambda v: integrate_frames(
        v,
        jnp.asarray(depth)[None],
        jnp.asarray(color)[None],
        jnp.asarray([[fx, fy, cx, cy]]),
        jnp.asarray(w2c)[None],
        sdf_trunc=0.15,
    ))(vol)
    tsdf = np.asarray(vol.tsdf)
    weights = np.asarray(vol.weights)
    assert weights.max() > 0
    verts, faces, cols = marching_tetrahedra(
        tsdf, weights, np.asarray(vol.colors),
        origin=(-1.5, -1.5, 0.5), voxel_size=0.05,
    )
    assert len(verts) > 50
    # reconstructed surface sits at z ~ 2
    np.testing.assert_allclose(verts[:, 2].mean(), 2.0, atol=0.05)
    write_mesh_ply(tmp_path / "mesh.ply", verts, faces, cols)
    ply = read_ply(tmp_path / "mesh.ply")
    assert len(ply["vertex"]) == len(verts)
    assert len(ply["face"]) == len(faces)
