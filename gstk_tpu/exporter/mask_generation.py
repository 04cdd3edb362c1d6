"""Text-prompted object masking for TSDF export (model-gated).

Equivalent of the reference ``exporter/mask_generater.py:24`` which chains
GroundingDINO (text -> boxes) + SAM (boxes -> masks) + DEVA (video
propagation) to isolate an object before TSDF fusion. Those pretrained
models require downloaded weights unavailable in a zero-egress TPU image, so
this module defines the same interface with:

  * a registry hook (``register_mask_model``) so a weights-equipped
    deployment can plug the heavy pipeline in unchanged, and
  * lightweight built-in fallbacks (``threshold`` on rendered accumulation,
    ``box`` crop) that keep the offline-tsdf pipeline functional everywhere.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import numpy as np

_MASK_MODELS: Dict[str, Callable] = {}


def register_mask_model(name: str, fn: Callable) -> None:
    """Register a mask generator: fn(images, prompt) -> list of (H,W) bool."""
    _MASK_MODELS[name] = fn


def generate_masks(
    images: List[np.ndarray],
    prompt: Optional[str] = None,
    method: str = "threshold",
    accumulations: Optional[List[np.ndarray]] = None,
    threshold: float = 0.5,
    box: Optional[tuple] = None,
) -> List[np.ndarray]:
    """Produce per-frame masks.

    method: a registered model name (e.g. "grounded_sam" when available), or
    one of the built-ins: "threshold" (accumulation > threshold), "box"
    (normalized (x0, y0, x1, y1) crop), "none".
    """
    if method in _MASK_MODELS:
        return _MASK_MODELS[method](images, prompt)
    if method == "none":
        return [np.ones(img.shape[:2], bool) for img in images]
    if method == "threshold":
        if accumulations is None:
            raise ValueError("threshold masking needs accumulation maps")
        return [acc > threshold for acc in accumulations]
    if method == "box":
        if box is None:
            raise ValueError("box masking needs a (x0,y0,x1,y1) box")
        out = []
        for img in images:
            h, w = img.shape[:2]
            m = np.zeros((h, w), bool)
            x0, y0, x1, y1 = box
            m[int(y0 * h) : int(y1 * h), int(x0 * w) : int(x1 * w)] = True
            out.append(m)
        return out
    raise ValueError(
        f"unknown mask method '{method}'; text-prompted segmentation "
        "(GroundingDINO+SAM) requires registering a model via "
        "register_mask_model — pretrained weights are not bundled."
    )
