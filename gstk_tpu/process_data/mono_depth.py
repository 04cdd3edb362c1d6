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


def _gradient_fallback(images: List[np.ndarray]) -> List[np.ndarray]:
    """Deterministic placeholder 'depth' (vertical gradient modulated by
    luminance) — keeps the est-depth pipeline executable offline."""
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
) -> List[Path]:
    """Estimate depth for every image; write scaled uint16 PNGs named
    depth_*.png (the layout align_mono_depth expects)."""
    from PIL import Image

    if method == "auto":
        method = (
            "depth_anything"
            if "depth_anything" in _DEPTH_MODELS or try_load_depth_anything()
            else "gradient"
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
