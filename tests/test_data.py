"""Data layer tests: PLY roundtrip, dataparser on a fixture dataset,
datamanager caching/undistortion/sampling."""

import json
from pathlib import Path

import numpy as np
import pytest

from gstk_tpu.data.dataparser import DataparserConfig, parse_transforms
from gstk_tpu.data.datamanager import FullImageDatamanager
from gstk_tpu.data.splits import get_split
from gstk_tpu.utils.io import read_ply, read_ply_points, write_ply


def test_ply_roundtrip_binary(tmp_path, rng):
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (100, 3)).astype(np.uint8)
    write_ply(
        tmp_path / "p.ply",
        {
            "vertex": {
                "x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2],
                "red": rgb[:, 0], "green": rgb[:, 1], "blue": rgb[:, 2],
            }
        },
    )
    xyz2, rgb2 = read_ply_points(tmp_path / "p.ply")
    np.testing.assert_allclose(xyz2, xyz)
    np.testing.assert_array_equal(rgb2, rgb)


def test_ply_roundtrip_ascii(tmp_path, rng):
    xyz = rng.normal(size=(10, 3)).astype(np.float32)
    write_ply(
        tmp_path / "p.ply",
        {"vertex": {"x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2]}},
        fmt="ascii",
    )
    out = read_ply(tmp_path / "p.ply")
    np.testing.assert_allclose(out["vertex"]["x"], xyz[:, 0], rtol=1e-5)


def test_splits():
    files = [f"img_{i}.png" for i in range(10)]
    tr, ev = get_split(files, "fraction", fraction=0.9)
    assert len(tr) == 9 and len(ev) == 1
    tr, ev = get_split(files, "interval", interval=5)
    assert list(ev) == [0, 5]
    tr, ev = get_split(files, "all")
    assert len(tr) == len(ev) == 10


def _make_dataset(tmp_path, rng, n_frames=6, w=64, h=48, distortion=False):
    from PIL import Image

    data = tmp_path / "scene"
    (data / "images").mkdir(parents=True)
    frames = []
    for i in range(n_frames):
        img = (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
        Image.fromarray(img).save(data / "images" / f"frame_{i:03d}.png")
        depth = (rng.uniform(500, 3000, (h, w))).astype(np.uint16)
        (data / "depths").mkdir(exist_ok=True)
        Image.fromarray(depth).save(data / "depths" / f"frame_{i:03d}.png")
        ang = i * 0.3
        c2w = np.eye(4)
        c2w[:3, :3] = np.array(
            [
                [np.cos(ang), 0, np.sin(ang)],
                [0, 1, 0],
                [-np.sin(ang), 0, np.cos(ang)],
            ]
        )
        c2w[:3, 3] = [np.sin(ang) * 4, 0.2, np.cos(ang) * 4]
        frame = {
            "file_path": f"images/frame_{i:03d}.png",
            "depth_path": f"depths/frame_{i:03d}.png",
            "transform_matrix": c2w.tolist(),
        }
        frames.append(frame)
    xyz = rng.normal(size=(50, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (50, 3)).astype(np.uint8)
    write_ply(
        data / "sparse.ply",
        {
            "vertex": {
                "x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2],
                "red": rgb[:, 0], "green": rgb[:, 1], "blue": rgb[:, 2],
            }
        },
    )
    meta = {
        "fl_x": 60.0, "fl_y": 60.0, "cx": w / 2, "cy": h / 2,
        "w": w, "h": h,
        "camera_model": "OPENCV",
        "ply_file_path": "sparse.ply",
        "frames": frames,
    }
    if distortion:
        meta["k1"], meta["k2"] = 0.05, -0.01
    with open(data / "transforms.json", "w") as f:
        json.dump(meta, f)
    return data


def test_dataparser(tmp_path, rng):
    data = _make_dataset(tmp_path, rng)
    cfg = DataparserConfig(data=data, eval_mode="interval", eval_interval=3)
    out = parse_transforms(cfg, "train")
    assert len(out.image_filenames) == 4  # 6 frames, every 3rd is eval
    assert out.poses.shape == (4, 3, 4)
    assert out.points3d_xyz.shape == (50, 3)
    # auto-scale: max |translation| == 1
    ev = parse_transforms(cfg, "val")
    all_poses = np.concatenate([out.poses, ev.poses])
    np.testing.assert_allclose(np.abs(all_poses[:, :3, 3]).max(), 1.0, rtol=1e-4)
    assert out.depth_filenames is not None and len(out.depth_filenames) == 4


def test_datamanager_cache_and_sample(tmp_path, rng):
    data = _make_dataset(tmp_path, rng)
    dm = FullImageDatamanager(
        DataparserConfig(data=data, eval_mode="interval", eval_interval=3)
    )
    assert dm.num_train == 4
    assert dm.image_size == (48, 64)
    idx, frame = dm.next_train()
    assert frame.image.shape == (48, 64, 3)
    assert frame.image.dtype == np.float32
    assert 0.0 <= frame.image.min() and frame.image.max() <= 1.0
    assert frame.depth is not None and frame.depth.shape == (48, 64)
    # depth scaled: png mm -> m -> dataparser scale
    assert frame.depth.max() < 3.5 * dm.train_outputs.dataparser_scale
    # epoch covers all cameras exactly once
    seen = {idx}
    for _ in range(3):
        i, _f = dm.next_train()
        seen.add(i)
    assert seen == {0, 1, 2, 3}


def test_datamanager_undistorts(tmp_path, rng):
    data = _make_dataset(tmp_path, rng, distortion=True)
    dm = FullImageDatamanager(
        DataparserConfig(data=data, eval_mode="interval", eval_interval=3)
    )
    _, frame = dm.next_train()
    # ROI crop may shrink the image slightly; intrinsics follow.
    assert frame.image.shape[0] <= 48 and frame.image.shape[1] <= 64
    assert np.isfinite(frame.fx) and frame.fx > 0


def test_datamanager_sharding(tmp_path, rng):
    data = _make_dataset(tmp_path, rng)
    dm0 = FullImageDatamanager(
        DataparserConfig(data=data, eval_mode="interval", eval_interval=3),
        num_shards=2, shard_index=0,
    )
    dm1 = FullImageDatamanager(
        DataparserConfig(data=data, eval_mode="interval", eval_interval=3),
        num_shards=2, shard_index=1,
    )
    assert dm0.num_train + dm1.num_train == 4
