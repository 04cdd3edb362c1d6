"""End-to-end process_data pipeline (skip_colmap path) feeding the dataparser."""

import shutil
from pathlib import Path

import numpy as np

from gstk_tpu.data.dataparser import DataparserConfig, parse_transforms
from gstk_tpu.process_data.pipeline import ProcessConfig, process_images

from tests.test_process_data import _write_colmap_model


def test_pipeline_skip_colmap(tmp_path, rng):
    from PIL import Image

    # raw images named like the COLMAP model expects
    raw = tmp_path / "raw"
    raw.mkdir()
    for i in range(4):
        img = rng.uniform(0, 255, (48, 64, 3)).astype(np.uint8)
        Image.fromarray(img).save(raw / f"frame_{i:03d}.jpg")

    out = tmp_path / "processed"
    # pre-place the COLMAP model (skip_colmap path) with matching names
    _write_colmap_model(out / "colmap" / "sparse" / "0", rng)
    # the fixture model names images frame_000.jpg.. but the pipeline renames
    # copies to frame_00001.jpg; use the model names for images instead
    cfg = ProcessConfig(
        data=raw, output_dir=out, num_downscales=1, skip_colmap=True
    )
    process_images(cfg)

    assert (out / "transforms.json").exists()
    assert (out / "colmap" / "point_cloud.ply").exists()
    assert (out / "images_2").exists()

    # model references images/frame_XXX.jpg; pipeline copied renamed files —
    # rename to match the COLMAP names so parsing sees real files
    for i in range(4):
        src = out / "images" / f"frame_{i + 1:05d}.jpg"
        dst = out / "images" / f"frame_{i:03d}.jpg"
        if src.exists():
            shutil.copy(src, dst)

    parsed = parse_transforms(
        DataparserConfig(data=out, eval_mode="all", downscale_factor=1),
        "train",
    )
    assert len(parsed.image_filenames) == 4
    assert parsed.points3d_xyz is not None and len(parsed.points3d_xyz) == 60
    assert np.isfinite(parsed.poses).all()
