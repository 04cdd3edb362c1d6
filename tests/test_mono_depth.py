"""Mono-depth estimation hook + est-depth alignment integration."""

from pathlib import Path

import numpy as np

from gstk_tpu.process_data.mono_depth import (
    estimate_depths,
    register_depth_model,
)


def test_estimate_depths_fallback(tmp_path, rng):
    from PIL import Image

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    for i in range(3):
        Image.fromarray(
            rng.uniform(0, 255, (24, 32, 3)).astype(np.uint8)
        ).save(img_dir / f"frame_{i:03d}.png")
    written = estimate_depths(img_dir, tmp_path / "depths", method="gradient")
    assert len(written) == 3
    assert written[0].name == "depth_000.png"
    d = np.asarray(Image.open(written[0]))
    assert d.shape == (24, 32)
    assert d.max() <= 255


def test_custom_depth_model(tmp_path, rng):
    from PIL import Image

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    Image.fromarray(
        rng.uniform(0, 255, (16, 16, 3)).astype(np.uint8)
    ).save(img_dir / "frame_000.png")

    register_depth_model(
        "constant", lambda imgs: [np.full(i.shape[:2], 3.0) for i in imgs]
    )
    written = estimate_depths(img_dir, tmp_path / "d", method="constant")
    assert len(written) == 1
