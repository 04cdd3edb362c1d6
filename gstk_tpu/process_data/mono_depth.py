"""Monocular depth estimation hook (model-gated).

Equivalent of the reference's DepthAnything integration
(``gs_toolkit/process_data/depth_estimation/dpt.py:218``, invoked by
``mono_depth_est``, process_data_utils.py:453-530). Pretrained DPT/DINOv2
weights are not bundled in a zero-egress TPU image, so this module exposes
the same contract with a pluggable backend:

  * ``register_depth_model(name, fn)`` — plug in any images->depth callable
    (e.g. a torch-hub DepthAnything when weights are available);
  * ``estimate_depths(...)`` — runs the selected backend over a directory and
    writes uint16 PNG depth estimates the alignment stage consumes;
  * a ``gradient`` toy fallback keeps the pipeline runnable end-to-end for
    tests (NOT a real depth estimator).
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict, List

import numpy as np

_DEPTH_MODELS: Dict[str, Callable] = {}


def register_depth_model(name: str, fn: Callable) -> None:
    """fn(list of HxWx3 uint8 images) -> list of HxW float depth maps."""
    _DEPTH_MODELS[name] = fn


def try_load_depth_anything() -> bool:
    """Attempt to register DepthAnything via torch.hub (needs network +
    weights; returns False in offline images)."""
    try:
        import torch

        model = torch.hub.load(
            "LiheYoung/Depth-Anything", "DepthAnything_vits14",
            pretrained=True,
        )
        model.eval()

        def run(images):
            outs = []
            with torch.no_grad():
                for img in images:
                    t = (
                        torch.from_numpy(img).float().permute(2, 0, 1)[None]
                        / 255.0
                    )
                    outs.append(model(t)[0].cpu().numpy())
            return outs

        register_depth_model("depth_anything", run)
        return True
    except Exception:
        return False


def try_load_local_dpt(model_dir=None) -> bool:
    """Register a DPT/DepthAnything backend from a *local* transformers
    checkpoint directory (``model_dir`` or $GSTK_DEPTH_MODEL_DIR) — the
    supported way to supply depth weights in an offline image: download
    any DPT-family depth model (e.g. LiheYoung/depth-anything-small-hf)
    elsewhere, copy the directory here, and point the env var at it.
    Runs on CPU via torch; returns False when no directory is set/found.
    """
    import os

    model_dir = model_dir or os.environ.get("GSTK_DEPTH_MODEL_DIR")
    if not model_dir or not Path(model_dir).exists():
        return False
    try:
        import torch
        from transformers import (
            AutoImageProcessor,
            AutoModelForDepthEstimation,
        )

        model = AutoModelForDepthEstimation.from_pretrained(
            model_dir, local_files_only=True
        )
        model.eval()
        try:
            proc = AutoImageProcessor.from_pretrained(
                model_dir, local_files_only=True
            )
        except Exception:
            proc = None

        def run(images):
            outs = []
            with torch.no_grad():
                for img in images:
                    if proc is not None:
                        inputs = proc(images=img, return_tensors="pt")
                        t = inputs["pixel_values"]
                    else:
                        t = (
                            torch.from_numpy(img).float()
                            .permute(2, 0, 1)[None] / 255.0
                        )
                    d = model(pixel_values=t).predicted_depth[0]
                    d = torch.nn.functional.interpolate(
                        d[None, None], size=img.shape[:2], mode="bilinear",
                        align_corners=False,
                    )[0, 0]
                    outs.append(d.cpu().numpy())
            return outs

        register_depth_model("local_dpt", run)
        return True
    except Exception as e:  # pragma: no cover - depends on local weights
        import sys

        print(f"local DPT load failed: {e}", file=sys.stderr)
        return False


def _gradient_fallback(images: List[np.ndarray]) -> List[np.ndarray]:
    """Deterministic placeholder 'depth' (vertical gradient modulated by
    luminance) — keeps the est-depth pipeline executable offline. NOT a
    real depth estimator: selecting it requires an explicit opt-in
    (``allow_toy=True`` / --allow-toy-depth)."""
    outs = []
    for img in images:
        h, w = img.shape[:2]
        lum = img.mean(axis=-1) / 255.0
        grad = np.linspace(1.0, 0.2, h)[:, None] * np.ones((1, w))
        outs.append((grad * (0.5 + 0.5 * lum)).astype(np.float32))
    return outs


register_depth_model("gradient", _gradient_fallback)


def estimate_depths(
    image_dir: Path,
    out_dir: Path,
    method: str = "auto",
    allow_toy: bool = False,
) -> List[Path]:
    """Estimate depth for every image; write scaled uint16 PNGs named
    depth_*.png (the layout align_mono_depth expects).

    ``method="auto"`` resolves, in order: an already-registered real model,
    torch-hub DepthAnything (needs network), a local transformers DPT
    checkpoint ($GSTK_DEPTH_MODEL_DIR). If none exists it RAISES — training
    co-gs against the toy gradient silently would poison the depth losses
    (round-1 advisory); pass ``allow_toy=True`` to opt into the
    placeholder for smoke tests.
    """
    from PIL import Image

    if method == "auto":
        if "depth_anything" in _DEPTH_MODELS or try_load_depth_anything():
            method = "depth_anything"
        elif "local_dpt" in _DEPTH_MODELS or try_load_local_dpt():
            method = "local_dpt"
        elif allow_toy:
            method = "gradient"
        else:
            raise RuntimeError(
                "No real monocular depth model is available: torch-hub "
                "DepthAnything needs network access, and no local "
                "checkpoint was found. Set GSTK_DEPTH_MODEL_DIR to a "
                "transformers DPT/DepthAnything checkpoint directory "
                "(see docs/WEIGHTS.md), register one via "
                "register_depth_model(), or pass allow_toy=True / "
                "--allow-toy-depth to knowingly use the placeholder "
                "gradient (unusable for training)."
            )
    if method == "gradient" and not allow_toy:
        raise RuntimeError(
            "The 'gradient' depth backend is a test placeholder; pass "
            "allow_toy=True / --allow-toy-depth to use it knowingly."
        )
    if method not in _DEPTH_MODELS:
        raise ValueError(
            f"unknown depth model '{method}'; register one via "
            "register_depth_model"
        )
    files = sorted(
        p for p in Path(image_dir).iterdir()
        if p.suffix.lower() in (".jpg", ".jpeg", ".png")
    )
    images = [np.asarray(Image.open(p).convert("RGB")) for p in files]
    depths = _DEPTH_MODELS[method](images)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    written = []
    for p, d in zip(files, depths):
        d = np.asarray(d, np.float32)
        d = (d - d.min()) / max(float(d.max() - d.min()), 1e-9) * 255.0
        name = p.stem.replace("frame_", "depth_") + ".png"
        out = out_dir / name
        Image.fromarray(d.astype(np.uint16)).save(out)
        written.append(out)
    return written
