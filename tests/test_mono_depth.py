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
    written = estimate_depths(
        img_dir, tmp_path / "depths", method="gradient", allow_toy=True
    )
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


def test_auto_raises_without_real_model(tmp_path, rng, monkeypatch):
    """method='auto' must fail loudly when only the toy fallback exists
    (round-1 advisory: silent gradient depth poisons co-gs training)."""
    import pytest
    from PIL import Image

    from gstk_tpu.process_data import mono_depth

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    Image.fromarray(
        rng.uniform(0, 255, (24, 32, 3)).astype(np.uint8)
    ).save(img_dir / "frame_000.png")
    monkeypatch.delenv("GSTK_DEPTH_MODEL_DIR", raising=False)
    monkeypatch.setattr(mono_depth, "try_load_depth_anything", lambda: False)
    monkeypatch.setattr(
        mono_depth, "try_load_local_dpt", lambda model_dir=None: False
    )
    with pytest.raises(RuntimeError, match="GSTK_DEPTH_MODEL_DIR"):
        mono_depth.estimate_depths(img_dir, tmp_path / "d", method="auto")
    # explicit gradient without opt-in also fails
    with pytest.raises(RuntimeError, match="allow-toy-depth"):
        mono_depth.estimate_depths(
            img_dir, tmp_path / "d", method="gradient"
        )
    # opt-in works
    written = mono_depth.estimate_depths(
        img_dir, tmp_path / "d", method="auto", allow_toy=True
    )
    assert len(written) == 1


def test_local_dpt_backend(tmp_path, rng):
    """A local transformers DPT checkpoint (random tiny weights) drives the
    real offline depth path end to end (docs/WEIGHTS.md contract)."""
    import pytest

    transformers = pytest.importorskip("transformers")
    import torch
    from PIL import Image

    from gstk_tpu.process_data import mono_depth

    cfg = transformers.DPTConfig(
        hidden_size=32, num_hidden_layers=4, num_attention_heads=2,
        intermediate_size=64, image_size=64, patch_size=16,
        backbone_out_indices=(0, 1, 2, 3),
        neck_hidden_sizes=[16, 16, 16, 16], fusion_hidden_size=16,
    )
    model = transformers.DPTForDepthEstimation(cfg)
    mdir = tmp_path / "dpt"
    model.save_pretrained(mdir)

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    for i in range(2):
        Image.fromarray(
            rng.uniform(0, 255, (64, 64, 3)).astype(np.uint8)
        ).save(img_dir / f"frame_{i:03d}.png")

    assert mono_depth.try_load_local_dpt(mdir)
    written = mono_depth.estimate_depths(
        img_dir, tmp_path / "d", method="local_dpt"
    )
    assert len(written) == 2
    d = np.asarray(Image.open(written[0]))
    assert d.shape == (64, 64)


def test_lpips_conversion_roundtrip(tmp_path):
    """tools/convert_lpips_weights.py: random-weight torch state dicts ->
    npz -> jittable LPIPS; wrong shapes fail loudly."""
    import pytest

    torch = pytest.importorskip("torch")
    import subprocess
    import sys as _sys

    from tools.convert_lpips_weights import VGG_CONVS, HEAD_WIDTHS, main

    g = torch.Generator().manual_seed(0)
    vgg_state = {}
    idx = 0
    for i, (c_out, c_in) in enumerate(VGG_CONVS):
        vgg_state[f"{idx}.weight"] = torch.randn(
            (c_out, c_in, 3, 3), generator=g
        ) * 0.05
        vgg_state[f"{idx}.bias"] = torch.zeros(c_out)
        idx += 2 + (1 if i in (1, 3, 6, 9) else 0)
    lpips_state = {
        f"lin{j}.model.1.weight": torch.rand((1, c, 1, 1), generator=g)
        for j, c in enumerate(HEAD_WIDTHS)
    }
    vgg_p = tmp_path / "vgg.pth"
    lin_p = tmp_path / "lin.pth"
    torch.save(vgg_state, vgg_p)
    torch.save(lpips_state, lin_p)
    out = tmp_path / "w.npz"
    main(["--vgg", str(vgg_p), "--lpips", str(lin_p), "--out", str(out)])

    from gstk_tpu.utils.lpips import load_lpips_params, lpips
    import jax.numpy as jnp

    params = load_lpips_params(out)
    v = float(lpips(params, jnp.zeros((32, 32, 3)), jnp.ones((32, 32, 3))))
    assert np.isfinite(v) and v > 0

    # corrupt a shape -> loud failure
    bad = dict(vgg_state)
    bad["0.weight"] = torch.randn((32, 3, 3, 3), generator=g)
    bad_p = tmp_path / "bad.pth"
    torch.save(bad, bad_p)
    with pytest.raises(SystemExit, match="shape"):
        main(["--vgg", str(bad_p), "--lpips", str(lin_p),
              "--out", str(tmp_path / "x.npz")])
