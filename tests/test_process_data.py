"""process_data tests: COLMAP binary IO roundtrip, transforms conversion,
depth alignment math."""

import json
import struct
from pathlib import Path

import numpy as np
import pytest

from gstk_tpu.process_data.colmap import (
    colmap_to_json,
    export_point_cloud_ply,
    qvec_to_rotmat,
    read_cameras_binary,
    read_images_binary,
    read_points3d_binary,
)
from gstk_tpu.process_data.depth_align import align_mono_depth, align_sensor_depth


def _write_colmap_model(d: Path, rng, n_images=4, n_points=60, w=64, h=48):
    """Write a synthetic COLMAP binary model with consistent geometry."""
    d.mkdir(parents=True, exist_ok=True)
    fx = 60.0
    # cameras.bin: one PINHOLE camera
    with open(d / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, w, h))
        f.write(struct.pack("<4d", fx, fx, w / 2, h / 2))

    # Rejection-sample points so integer pixels are unique in every view —
    # pixel collisions would corrupt the exact-alignment tests below.
    def pixels(p):
        cols = []
        for i in range(n_images):
            t = np.array([0.3 * i - 0.5, 0.0, 0.0])
            c = p + t
            u = (fx * c[:, 0] / c[:, 2] + w / 2).astype(int)
            v = (fx * c[:, 1] / c[:, 2] + h / 2).astype(int)
            cols.append(v * w + u)
        return np.stack(cols)

    pts_list = []
    seen = [set() for _ in range(n_images)]
    while len(pts_list) < n_points:
        p = rng.uniform(-1, 1, (1, 3))
        p[:, 2] += 4.0
        pix = pixels(p)[:, 0]
        if any(pix[i] in seen[i] for i in range(n_images)):
            continue
        for i in range(n_images):
            seen[i].add(pix[i])
        pts_list.append(p[0])
    pts = np.asarray(pts_list)

    images = []
    obs = {pid: [] for pid in range(1, n_points + 1)}
    for i in range(n_images):
        qvec = np.array([1.0, 0, 0, 0])
        tvec = np.array([0.3 * i - 0.5, 0.0, 0.0])
        rot = qvec_to_rotmat(qvec)
        cam_pts = (rot @ pts.T).T + tvec
        uv = np.stack(
            [
                fx * cam_pts[:, 0] / cam_pts[:, 2] + w / 2,
                fx * cam_pts[:, 1] / cam_pts[:, 2] + h / 2,
            ],
            axis=-1,
        )
        vis = (uv[:, 0] >= 0) & (uv[:, 0] < w) & (uv[:, 1] >= 0) & (uv[:, 1] < h)
        xys, pids = [], []
        for pid0 in range(n_points):
            if vis[pid0]:
                obs[pid0 + 1].append((i + 1, len(xys)))
                xys.append(uv[pid0])
                pids.append(pid0 + 1)
        images.append((i + 1, qvec, tvec, f"frame_{i:03d}.jpg", xys, pids))

    with open(d / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", len(images)))
        for im_id, qvec, tvec, name, xys, pids in images:
            f.write(struct.pack("<idddddddi", im_id, *qvec, *tvec, 1))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", len(xys)))
            for xy, pid in zip(xys, pids):
                f.write(struct.pack("<ddq", xy[0], xy[1], pid))

    with open(d / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", n_points))
        for pid0 in range(n_points):
            track = obs[pid0 + 1]
            f.write(
                struct.pack(
                    "<QdddBBBdQ", pid0 + 1, *pts[pid0], 100, 120, 140, 0.5,
                    len(track),
                )
            )
            for im_id, idx in track:
                f.write(struct.pack("<ii", im_id, idx))
    return pts, fx


def test_colmap_binary_roundtrip(tmp_path, rng):
    pts, fx = _write_colmap_model(tmp_path / "sparse", rng)
    cams = read_cameras_binary(tmp_path / "sparse" / "cameras.bin")
    assert cams[1].model == "PINHOLE" and cams[1].width == 64
    imgs = read_images_binary(tmp_path / "sparse" / "images.bin")
    assert len(imgs) == 4
    assert imgs[1].name == "frame_000.jpg"
    assert (imgs[1].point3d_ids > 0).all()
    p3d = read_points3d_binary(tmp_path / "sparse" / "points3D.bin")
    np.testing.assert_allclose(p3d[1].xyz, pts[0], rtol=1e-6)
    assert len(p3d[1].image_ids) >= 1


def test_colmap_to_json(tmp_path, rng):
    _write_colmap_model(tmp_path / "sparse", rng)
    n = colmap_to_json(tmp_path / "sparse", tmp_path)
    assert n == 4
    meta = json.loads((tmp_path / "transforms.json").read_text())
    assert meta["camera_model"] == "OPENCV"
    assert abs(meta["fl_x"] - 60.0) < 1e-6
    assert len(meta["frames"]) == 4
    c2w = np.asarray(meta["frames"][0]["transform_matrix"])
    assert c2w.shape == (4, 4)
    np.testing.assert_allclose(c2w[3], [0, 0, 0, 1], atol=1e-9)
    # rotation orthonormal
    r = c2w[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
    n_pts = export_point_cloud_ply(tmp_path / "sparse", tmp_path / "pc.ply")
    assert n_pts == 60


def test_align_sensor_depth(tmp_path, rng):
    _write_colmap_model(tmp_path / "sparse", rng)
    from gstk_tpu.process_data.colmap import read_model

    cams, imgs, points = read_model(tmp_path / "sparse")
    true_scale = 0.1  # measured = 0.1 * sfm units (keeps mm within (30, 1000) filter)

    def lookup(name):
        # perfect synthetic sensor depth in mm: scale * sfm depth * 1000
        im = next(i for i in imgs.values() if i.name == name)
        rot = qvec_to_rotmat(im.qvec)
        depth = np.zeros((48, 64), np.float64)
        for k, pid in enumerate(im.point3d_ids):
            z = (rot @ points[pid].xyz)[2] + im.tvec[2]
            u, v = im.xys[k].astype(int)
            if 0 <= u < 64 and 0 <= v < 48:
                depth[v, u] = z * true_scale * 1000
        return depth

    scale = align_sensor_depth(imgs, points, lookup, 64, 48)
    # pixel collisions in the synthetic depth map perturb a few ratios
    np.testing.assert_allclose(scale, true_scale, rtol=1e-2)


def test_align_mono_depth(tmp_path, rng):
    _write_colmap_model(tmp_path / "sparse", rng)
    from gstk_tpu.process_data.colmap import read_model

    cams, imgs, points = read_model(tmp_path / "sparse")
    m_true, c_true = 40.0, 10.0  # est/255 = (m z + c)/255

    def lookup(name):
        im = next(i for i in imgs.values() if i.name == name)
        rot = qvec_to_rotmat(im.qvec)
        depth = np.zeros((48, 64), np.float64)
        for k, pid in enumerate(im.point3d_ids):
            z = (rot @ points[pid].xyz)[2] + im.tvec[2]
            u, v = im.xys[k].astype(int)
            if 0 <= u < 64 and 0 <= v < 48:
                depth[v, u] = m_true * z + c_true
        return depth

    scales, shifts = align_mono_depth(imgs, points, lookup, 64, 48)
    assert len(scales) == 4
    for im_id in scales:
        np.testing.assert_allclose(scales[im_id], m_true / 255.0, rtol=5e-2)
        np.testing.assert_allclose(shifts[im_id], c_true / 255.0, rtol=2e-1)


def test_aria_pose_math():
    """Aria conversion core: nearest-pose lookup + axis-flip composition."""
    from gstk_tpu.process_data.aria import (
        AriaCalibration,
        T_ARIA_GSTK,
        camera_to_world,
        frames_to_transforms,
        nearest_pose_index,
    )

    ts = np.array([0.0, 1e9, 2e9, 3e9])
    assert nearest_pose_index(ts, 1.4e9) == 1
    assert nearest_pose_index(ts, 2.6e9) == 3

    # identity device pose + identity extrinsic -> pure axis flip
    twc = camera_to_world(np.eye(4), np.eye(4))
    np.testing.assert_allclose(twc, T_ARIA_GSTK)
    # flipping twice restores handedness; still SE3
    np.testing.assert_allclose(twc[:3, :3] @ twc[:3, :3].T, np.eye(3), atol=1e-12)
    assert abs(np.linalg.det(twc[:3, :3]) - 1.0) < 1e-12

    calib = AriaCalibration(
        fx=610.0, fy=610.0, cx=716.0, cy=716.0,
        distortion_params=np.zeros(12), width=1408, height=1408,
        t_device_camera=np.eye(4),
    )
    out = frames_to_transforms(
        calib,
        [{"file_path": "images/frame_00000.jpg", "t_world_camera": twc,
          "timestamp_ns": 0.0}],
    )
    assert out["camera_model"] == "FISHEYE624"
    assert out["w"] == 1408 and len(out["frames"]) == 1
    assert np.asarray(out["frames"][0]["transform_matrix"]).shape == (4, 4)


def _write_colmap_text_model(d):
    """A hand-written COLMAP *text* model (the format spec, cameras.txt /
    images.txt / points3D.txt) — exercises the text readers + colmap_to_json
    end to end on a realistic fixture."""
    d.mkdir(parents=True, exist_ok=True)
    (d / "cameras.txt").write_text(
        "# Camera list with one line of data per camera:\n"
        "#   CAMERA_ID, MODEL, WIDTH, HEIGHT, PARAMS[]\n"
        "1 OPENCV 96 72 80.0 82.0 48.0 36.0 0.01 -0.005 0.0001 0.0002\n"
    )
    # two images: identity-ish and a 90-deg yaw, each with 2 observations
    (d / "images.txt").write_text(
        "# Image list with two lines of data per image:\n"
        "#   IMAGE_ID, QW, QX, QY, QZ, TX, TY, TZ, CAMERA_ID, NAME\n"
        "#   POINTS2D[] as (X, Y, POINT3D_ID)\n"
        "1 1.0 0.0 0.0 0.0 0.1 -0.2 2.0 1 frame_000.jpg\n"
        "10.0 12.0 1 20.5 30.5 2\n"
        "2 0.7071068 0.0 0.7071068 0.0 -0.3 0.0 2.5 1 frame_001.jpg\n"
        "11.0 13.0 1 -1 -1 -1\n"
    )
    (d / "points3D.txt").write_text(
        "# 3D point list with one line of data per point:\n"
        "#   POINT3D_ID, X, Y, Z, R, G, B, ERROR, TRACK[] as (IMAGE_ID, POINT2D_IDX)\n"
        "1 0.5 -0.25 1.5 200 100 50 0.75 1 0 2 0\n"
        "2 -0.4 0.3 1.8 10 20 30 0.5 1 1\n"
    )


def test_colmap_text_model_and_json(tmp_path):
    from gstk_tpu.process_data.colmap import (
        read_model,
        read_cameras_text,
        read_images_text,
        read_points3d_text,
    )

    d = tmp_path / "sparse"
    _write_colmap_text_model(d)
    cams = read_cameras_text(d / "cameras.txt")
    assert cams[1].model == "OPENCV"
    assert cams[1].width == 96 and cams[1].height == 72
    np.testing.assert_allclose(cams[1].params[:4], [80.0, 82.0, 48.0, 36.0])
    imgs = read_images_text(d / "images.txt")
    assert imgs[1].name == "frame_000.jpg"
    assert imgs[2].qvec[0] == pytest.approx(0.7071068)
    assert list(imgs[1].point3d_ids) == [1, 2]
    pts = read_points3d_text(d / "points3D.txt")
    np.testing.assert_allclose(pts[1].xyz, [0.5, -0.25, 1.5])
    assert list(pts[1].image_ids) == [1, 2]
    # read_model auto-detects text
    c2, i2, p2 = read_model(d)
    assert len(c2) == 1 and len(i2) == 2 and len(p2) == 2

    n = colmap_to_json(d, tmp_path)
    assert n == 2
    meta = json.loads((tmp_path / "transforms.json").read_text())
    assert meta["camera_model"] == "OPENCV"
    assert meta["fl_x"] == pytest.approx(80.0)
    assert len(meta["frames"]) == 2
    c2w = np.asarray(meta["frames"][0]["transform_matrix"])
    r = c2w[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)


def test_run_sfm_error_paths(tmp_path, monkeypatch):
    from gstk_tpu.process_data import pipeline

    monkeypatch.setattr(pipeline, "colmap_available", lambda: False)
    monkeypatch.setattr(pipeline, "hloc_available", lambda: False)
    with pytest.raises(RuntimeError, match="No SfM backend"):
        pipeline.run_sfm(tmp_path, tmp_path / "c")
    with pytest.raises(RuntimeError, match="hloc"):
        pipeline.run_sfm(tmp_path, tmp_path / "c", backend="hloc")
    with pytest.raises(RuntimeError, match="colmap binary"):
        pipeline.run_sfm(tmp_path, tmp_path / "c", backend="colmap")


def test_run_sfm_uses_hloc_when_available(tmp_path, monkeypatch):
    """A fake hloc package proves the integration surface (the call pattern
    of reference hloc_utils.py:15) without the real weights."""
    import sys
    import types

    calls = {}

    def _mod(name, **fns):
        m = types.ModuleType(name)
        for k, v in fns.items():
            setattr(m, k, v)
        return m

    hloc = types.ModuleType("hloc")
    ef = _mod("hloc.extract_features")
    ef.confs = {"superpoint_aachen": {"model": "sp"}}
    ef.main = lambda conf, img_dir, image_list, feature_path: calls.setdefault(
        "features", feature_path
    ) or feature_path
    mf = _mod("hloc.match_features")
    mf.confs = {"superglue": {"model": "sg"}}
    mf.main = lambda conf, pairs, features, matches: calls.setdefault(
        "matches", matches
    ) or matches
    pe = _mod("hloc.pairs_from_exhaustive")
    pe.main = lambda pairs, image_list: calls.setdefault("pairs", pairs)
    rc = _mod("hloc.reconstruction")

    def recon_main(sfm_dir, img_dir, pairs, features, matches, image_list):
        calls["recon"] = sfm_dir
        Path(sfm_dir).mkdir(parents=True, exist_ok=True)

    rc.main = recon_main
    hloc.extract_features = ef
    hloc.match_features = mf
    hloc.pairs_from_exhaustive = pe
    hloc.reconstruction = rc
    for name, mod in [
        ("hloc", hloc), ("hloc.extract_features", ef),
        ("hloc.match_features", mf), ("hloc.pairs_from_exhaustive", pe),
        ("hloc.reconstruction", rc),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)

    from gstk_tpu.process_data import pipeline

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    (img_dir / "frame_000.jpg").write_bytes(b"x")
    out = pipeline.run_sfm(img_dir, tmp_path / "colmap", backend="auto")
    assert calls.keys() == {"features", "pairs", "matches", "recon"}
    assert out == tmp_path / "colmap" / "sparse" / "0"
