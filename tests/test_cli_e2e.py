"""Full CLI smoke test: synthetic dataset -> gs-train -> gs-eval -> gs-render
-> gs-export, exercising every user-facing entry point end to end."""

import json
from pathlib import Path

import numpy as np
import pytest

from gstk_tpu.data.synthetic import generate_synthetic_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("synthetic")
    return generate_synthetic_dataset(
        out, n_points=400, n_views=6, img_wh=(64, 48)
    )


def test_cli_cogs_with_depth(dataset, tmp_path):
    """co-gs method trains through the CLI with sensor-depth supervision."""
    from gstk_tpu.scripts import train as train_script

    out_dir = tmp_path / "outputs_cogs"
    train_script.main([
        "co-gs",
        "--data", str(dataset),
        "--output-dir", str(out_dir),
        "--max-num-iterations", "6",
        "--steps-per-save", "6",
        "--steps-per-eval-all-images", "0",
        "--isect-capacity", str(1 << 13),
        "--raster-chunk", "16",
        "--model.sh-degree", "1",
        "--model.depth-loss-start-iteration", "0",
        "--dataparser.eval-mode", "interval",
        "--dataparser.eval-interval", "3",
        "--dataparser.downscale-factor", "1",
    ])
    runs = list(out_dir.glob("*/co-gs"))
    assert runs and (runs[0] / "ckpts").exists()


def test_cli_end_to_end(dataset, tmp_path, monkeypatch):
    # A GSTK_LPIPS_WEIGHTS leak would route BOTH eval runs below through the
    # device path (vacuous parity check); force the second run onto the host
    # loop explicitly instead of relying on the no-weights LPIPS fallback
    # (which, on a networked machine, would download torchvision weights).
    monkeypatch.delenv("GSTK_LPIPS_WEIGHTS", raising=False)
    from gstk_tpu.scripts import eval as eval_script
    from gstk_tpu.scripts import export as export_script
    from gstk_tpu.scripts import render as render_script
    from gstk_tpu.scripts import train as train_script

    out_dir = tmp_path / "outputs"
    train_script.main([
        "gaussian-splatting",
        "--data", str(dataset),
        "--output-dir", str(out_dir),
        "--max-num-iterations", "8",
        "--steps-per-save", "8",
        "--steps-per-eval-all-images", "0",
        "--isect-capacity", str(1 << 13),
        "--raster-chunk", "16",
        "--model.num-downscales", "0",
        "--model.sh-degree", "1",
        "--dataparser.eval-mode", "interval",
        "--dataparser.eval-interval", "3",
        "--dataparser.downscale-factor", "1",
    ])
    run_dirs = list(out_dir.glob("*/gaussian-splatting"))
    assert run_dirs, "no run dir created"
    config_yml = run_dirs[0] / "config.yml"
    assert config_yml.exists()
    assert (run_dirs[0] / "ckpts").exists()

    # gs-eval
    eval_json = tmp_path / "eval.json"
    eval_script.main([
        "--load-config", str(config_yml),
        "--output-path", str(eval_json),
        "--skip-lpips",
    ])
    results = json.loads(eval_json.read_text())
    assert results["results"]["num_images"] == 2
    assert np.isfinite(results["results"]["psnr"])

    # the one-dispatch device eval (--skip-lpips, equal shapes) must agree
    # with the per-image host loop
    eval_json2 = tmp_path / "eval_host.json"
    eval_script.main([
        "--load-config", str(config_yml),
        "--output-path", str(eval_json2),
        "--skip-lpips",
        "--force-host-loop",
    ])
    host = json.loads(eval_json2.read_text())["results"]
    np.testing.assert_allclose(
        results["results"]["psnr"], host["psnr"], rtol=1e-4
    )
    np.testing.assert_allclose(
        results["results"]["ssim"], host["ssim"], atol=1e-4
    )

    # gs-render pose
    render_out = tmp_path / "renders"
    render_script.main([
        "pose",
        "--load-config", str(config_yml),
        "--output-dir", str(render_out),
    ])
    assert (render_out / "poses.json").exists()
    assert len(list((render_out / "rgb").glob("*.png"))) == 4

    # gs-export gaussian-splat + camera-poses + offline-tsdf
    export_out = tmp_path / "exports"
    export_script.main([
        "gaussian-splat",
        "--load-config", str(config_yml),
        "--output-dir", str(export_out),
    ])
    assert (export_out / "gaussians.ply").exists()
    export_script.main([
        "camera-poses",
        "--load-config", str(config_yml),
        "--output-dir", str(export_out),
    ])
    assert (export_out / "train_poses.json").exists()
    export_script.main([
        "offline-tsdf",
        "--load-config", str(config_yml),
        "--output-dir", str(export_out),
        "--voxel-size", "0.05",
        "--volume-size", "3.0",
        "--sdf-trunc", "0.15",
    ])
    assert (export_out / "tsdf_mesh.ply").exists()
    # masked + temporally propagated variant over the rendered train
    # trajectory (the DEVA role: flow-carried fwd/bwd chains + majority
    # vote, exporter/mask_propagation.py) — fresh output dir so the
    # assertion can't be satisfied by the unmasked export above
    masked_out = tmp_path / "exports_masked"
    export_script.main([
        "offline-tsdf",
        "--load-config", str(config_yml),
        "--output-dir", str(masked_out),
        "--voxel-size", "0.05",
        "--volume-size", "3.0",
        "--sdf-trunc", "0.15",
        "--mask-method", "threshold",
        "--propagate-masks",
    ])
    assert (masked_out / "tsdf_mesh.ply").exists()
