"""SceneBox, colormaps, trajectories, equirect, articulated utilities."""

import jax
import jax.numpy as jnp
import numpy as np

from gstk_tpu.core.scene_box import OrientedBox, SceneBox
from gstk_tpu.core.trajectories import (
    interpolate_poses,
    orbit_path,
    poses_to_camera_path,
    quat_to_rotmat_np,
    rotmat_to_quat,
    slerp,
)
from gstk_tpu.extra_toolkit.articulated import (
    prismatic_joint,
    revolute_joint,
    rgbd_to_pointcloud,
)
from gstk_tpu.utils.colormaps import apply_colormap, apply_depth_colormap


def test_scene_box_within():
    box = SceneBox(aabb=jnp.asarray([[-1.0, -1, -1], [1, 1, 1]]))
    pts = jnp.asarray([[0, 0, 0], [2, 0, 0], [-1, -1, -1]])
    np.testing.assert_array_equal(
        np.asarray(box.within(pts)), [True, False, True]
    )
    np.testing.assert_allclose(float(box.get_diagonal_length()), np.sqrt(12.0), rtol=1e-6)


def test_oriented_box_within():
    box = OrientedBox.from_params(
        jnp.asarray([0.0, 0.0, np.pi / 4]),
        jnp.asarray([1.0, 0.0, 0.0]),
        jnp.asarray([2.0, 1.0, 1.0]),
    )
    # center is inside; a point far away is not
    assert bool(box.within(jnp.asarray([[1.0, 0, 0]]))[0])
    assert not bool(box.within(jnp.asarray([[5.0, 5, 5]]))[0])


def test_colormaps(rng):
    x = jnp.asarray(rng.uniform(0, 1, (8, 8)).astype(np.float32))
    img = np.asarray(apply_colormap(x))
    assert img.shape == (8, 8, 3)
    assert img.min() >= 0 and img.max() <= 1
    d = jnp.asarray(rng.uniform(1, 5, (8, 8)).astype(np.float32))
    img2 = np.asarray(apply_depth_colormap(d, accumulation=jnp.ones((8, 8))))
    assert np.isfinite(img2).all()


def test_quat_roundtrip(rng):
    for _ in range(10):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        r = quat_to_rotmat_np(q)
        q2 = rotmat_to_quat(r)
        assert np.allclose(q, q2, atol=1e-6) or np.allclose(q, -q2, atol=1e-6)


def test_slerp_endpoints():
    q0 = np.array([1.0, 0, 0, 0])
    q1 = np.array([np.cos(0.5), np.sin(0.5), 0, 0])
    np.testing.assert_allclose(slerp(q0, q1, 0.0), q0, atol=1e-7)
    np.testing.assert_allclose(slerp(q0, q1, 1.0), q1, atol=1e-7)
    mid = slerp(q0, q1, 0.5)
    np.testing.assert_allclose(np.linalg.norm(mid), 1.0, atol=1e-7)


def test_interpolate_and_camera_path():
    a = np.eye(4)[:3]
    b = np.eye(4)[:3].copy()
    b[:3, 3] = [1, 0, 0]
    poses = interpolate_poses([a, b], steps_per_segment=10)
    assert len(poses) == 11
    np.testing.assert_allclose(poses[5][:3, 3], [0.5, 0, 0], atol=1e-6)
    path = poses_to_camera_path(poses)
    assert len(path["camera_path"]) == 11
    assert len(path["camera_path"][0]["camera_to_world"]) == 16
    orbit = orbit_path(n_frames=12)
    assert len(orbit) == 12


def test_equirect_extraction(rng):
    from gstk_tpu.process_data.equirect import perspective_from_equirect

    eq = (rng.uniform(0, 255, (64, 128, 3))).astype(np.uint8)
    view = perspective_from_equirect(eq, 0.3, 0.1, 90.0, (32, 48))
    assert view.shape == (32, 48, 3)


def test_articulated_joints(rng):
    from gstk_tpu.core.gaussians import init_scene

    pts = rng.uniform(-1, 1, (20, 3)).astype(np.float32)
    rgb = rng.uniform(0, 255, (20, 3)).astype(np.float32)
    scene = init_scene(jax.random.PRNGKey(0), 32, (pts, rgb), sh_degree=0)
    mask = jnp.arange(32) < 10

    moved = prismatic_joint(scene, mask, [0, 0, 1.0], 0.5)
    np.testing.assert_allclose(
        np.asarray(moved.means[:10, 2]), pts[:10, 2] + 0.5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(moved.means[10:20]), pts[10:20], atol=1e-6
    )

    rot = revolute_joint(scene, mask, pivot=[0, 0, 0], axis=[0, 0, 1],
                         angle=np.pi / 2)
    expect = np.stack([-pts[:10, 1], pts[:10, 0], pts[:10, 2]], axis=-1)
    np.testing.assert_allclose(np.asarray(rot.means[:10]), expect, atol=1e-5)
    # quats renormalized stay unit
    q = np.asarray(rot.quats[:10])
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)


def test_rgbd_to_pointcloud():
    depth = np.full((10, 12), 2.0, np.float32)
    rgb = np.zeros((10, 12, 3), np.uint8)
    pts, cols = rgbd_to_pointcloud(depth, rgb, 10.0, 10.0, 6.0, 5.0)
    assert pts.shape == (120, 3)
    np.testing.assert_allclose(pts[:, 2], 2.0)


def test_rgbd_pointcloud_mask_and_normals(rng):
    """pcd_utils parity: mask gates depth; kNN-PCA normals are unit and
    perpendicular to a synthetic plane."""
    from gstk_tpu.extra_toolkit.articulated import (
        estimate_normals,
        rgbd_to_pointcloud,
    )

    depth = np.full((8, 8), 2.0, np.float32)
    rgb = np.zeros((8, 8, 3), np.float32)
    mask = np.zeros((8, 8), np.uint8)
    mask[:4] = 1
    pts, _ = rgbd_to_pointcloud(depth, rgb, 10, 10, 4, 4, mask=mask)
    assert len(pts) == 32  # only masked half survives

    # plane z = 0.3x + 0.1y: normals should align with (-0.3, -0.1, 1)/|.|
    xs, ys = np.meshgrid(np.linspace(0, 1, 20), np.linspace(0, 1, 20))
    plane = np.stack(
        [xs.ravel(), ys.ravel(), 0.3 * xs.ravel() + 0.1 * ys.ravel()],
        axis=-1,
    )
    normals = estimate_normals(plane, k=12)
    expected = np.array([-0.3, -0.1, 1.0])
    expected /= np.linalg.norm(expected)
    dots = np.abs(normals @ expected)
    assert np.all(dots > 0.999)
    np.testing.assert_allclose(np.linalg.norm(normals, axis=-1), 1.0, atol=1e-5)


def test_download_registry_expansion(capsys):
    """Full dataset families + capture catalogs (reference
    download_data.py:202+ / eyeful_tower.py parity)."""
    from gstk_tpu.scripts.download_data import DATASETS, resolve, main

    assert len(DATASETS) >= 10
    assert len(DATASETS["nerfstudio"]["captures"]) == 18
    assert len(DATASETS["phototourism"]["captures"]) == 10
    assert len(DATASETS["eyefultower"]["captures"]) == 11
    # single capture resolution
    pairs = resolve("nerfstudio", "poster")
    assert pairs[0][0] == "poster" and "drive.google" in pairs[0][1]
    # 'all' expands
    assert len(resolve("mill19", "all")) == 2
    # eyefultower prints the s3 sync instruction (no downloader for s3)
    main(["eyefultower", "--capture", "riverview", "--save-dir", "/tmp/dlx"])
    out = capsys.readouterr().out
    assert "aws s3 sync" in out and "riverview" in out
    import pytest

    with pytest.raises(SystemExit, match="unknown capture"):
        resolve("nerfstudio", "nonexistent")
