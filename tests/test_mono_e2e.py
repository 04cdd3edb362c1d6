"""End-to-end mono-depth co-gs path on a synthesized dataset.

Chains the full robotics-flagship pipeline the r5 hardware run uses:
raytraced dataset (GT depth + sparse.ply) -> tools/make_mono_depth.py
(affine-corrupted mono estimates + align_mono_depth recovery ->
scale/shift in transforms.json) -> co-gs CLI training with the complete
`use_est_depth` loss zoo active (reference depth_gs.py:477-531).
This is the path where a flag/cadence bug costs an hour of single-tenant
TPU (the steps_per_save=0 crash was found exactly here)."""

import importlib.util
import json


from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def test_mono_depth_cogs_end_to_end(tmp_path):
    from gstk_tpu.data.raytraced import generate_raytraced_dataset

    data = tmp_path / "rt"
    generate_raytraced_dataset(data, n_views=6, img_wh=(64, 64),
                               seed_points=800)

    # synthesize the mono variant (runs align_mono_depth internally and
    # refuses on bad recovery)
    spec = importlib.util.spec_from_file_location(
        "make_mono_depth", REPO / "tools" / "make_mono_depth.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mono = tmp_path / "rt_mono"
    rc = mod.main(["--data", str(data), "--out", str(mono), "--seed", "1"])
    assert rc in (0, None)
    frames = json.loads((mono / "transforms.json").read_text())["frames"]
    assert all("scale" in f and "shift" in f for f in frames)

    # co-gs CLI training with the full est-depth loss zoo
    from gstk_tpu.scripts import train as train_script

    out = tmp_path / "out"
    train_script.main([
        "co-gs",
        "--data", str(mono), "--output-dir", str(out),
        "--experiment-name", "mono",
        "--max-num-iterations", "3", "--steps-per-save", "0",
        "--steps-per-eval-all-images", "3", "--steps-per-eval-image", "0",
        "--isect-capacity", "8192", "--max-capacity", "4096",
        "--raster-chunk", "16", "--model.sh-degree", "1",
        "--model.use-est-depth", "True",
        "--model.use-pearson-depth", "True",
        "--model.use-scaled-est-depth", "True",
        "--model.use-depth-regularization", "True",
        "--model.depth-loss-start-iteration", "0",
        "--dataparser.eval-mode", "interval",
        "--dataparser.eval-interval", "3",
        "--data-parallel", "off",
    ])
    metrics = (out / "mono" / "co-gs" / "metrics.jsonl").read_text()
    rows = [json.loads(line) for line in metrics.splitlines()]
    assert any("eval_psnr" in r for r in rows)
    losses = [r["loss"] for r in rows if "loss" in r]
    assert losses and all(np.isfinite(v) for v in losses)
