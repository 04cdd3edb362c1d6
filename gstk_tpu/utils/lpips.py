"""LPIPS perceptual metric in JAX (VGG16 backbone, learned linear heads).

Equivalent of the reference's eval-time LPIPS
(``gs_toolkit/models/vanilla_gs.py:964-1009`` uses
``torchmetrics...LearnedPerceptualImagePatchSimilarity``). Implemented as a
pure-JAX function over a parameter pytree so it runs on TPU inside jitted
eval loops; the pretrained weights are NOT bundled (zero-egress build) —
load them with :func:`load_lpips_params` from either

  * an ``.npz`` with keys ``conv{i}_w``/``conv{i}_b`` (13 VGG16 convs,
    OIHW) and ``lin{j}_w`` (5 LPIPS 1x1 heads, (C,)), or
  * torchvision+lpips checkpoints via :func:`params_from_torch` when torch
    and the weight files are available locally.

Architecture (LPIPS v0.1, VGG variant): images in [0,1] are scaled/shifted
by the ImageNet normalization, run through VGG16 features, tapped after
relu1_2, relu2_2, relu3_3, relu4_3, relu5_3; each tap is channel-unit-
normalized, squared-diffed, weighted by a non-negative 1x1 conv, spatially
averaged, and summed over taps.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, pool_before) per conv layer
_VGG_PLAN = [
    (64, False), (64, False),
    (128, True), (128, False),
    (256, True), (256, False), (256, False),
    (512, True), (512, False), (512, False),
    (512, True), (512, False), (512, False),
]
# conv indices (0-based) after which LPIPS taps features (relu1_2, relu2_2,
# relu3_3, relu4_3, relu5_3)
_TAPS = [1, 3, 6, 9, 12]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def random_lpips_params(key, in_ch: int = 3) -> Dict[str, jax.Array]:
    """Random-weight parameter pytree with the correct shapes (testing /
    shape-checking only — NOT a perceptual metric)."""
    params = {}
    c_in = in_ch
    for i, (c_out, _) in enumerate(_VGG_PLAN):
        key, k1 = jax.random.split(key)
        params[f"conv{i}_w"] = (
            jax.random.normal(k1, (c_out, c_in, 3, 3)) * 0.05
        )
        params[f"conv{i}_b"] = jnp.zeros((c_out,))
        c_in = c_out
    for j, conv_i in enumerate(_TAPS):
        params[f"lin{j}_w"] = jnp.abs(
            jax.random.normal(jax.random.fold_in(key, j),
                              (_VGG_PLAN[conv_i][0],))
        ) / _VGG_PLAN[conv_i][0]
    return params


def load_lpips_params(path) -> Dict[str, jax.Array]:
    """Load the parameter pytree from an .npz (see module docstring)."""
    data = np.load(path)
    return {k: jnp.asarray(data[k]) for k in data.files}


def params_from_torch(vgg_state, lpips_state) -> Dict[str, np.ndarray]:
    """Convert torchvision ``vgg16().features.state_dict()`` + an lpips
    ``lin`` state dict ({'lin{j}.model.1.weight': (1,C,1,1)}) to the npz
    layout."""
    out = {}
    conv_keys = sorted(
        {k.split(".")[0] for k in vgg_state if k.endswith(".weight")},
        key=int,
    )
    for i, k in enumerate(conv_keys):
        out[f"conv{i}_w"] = np.asarray(vgg_state[f"{k}.weight"])
        out[f"conv{i}_b"] = np.asarray(vgg_state[f"{k}.bias"])
    for j in range(len(_TAPS)):
        w = np.asarray(lpips_state[f"lin{j}.model.1.weight"])
        out[f"lin{j}_w"] = w.reshape(-1)
    return out


def _vgg_features(params, x: jax.Array) -> List[jax.Array]:
    """x: (H, W, 3) normalized; returns tapped feature maps (H', W', C)."""
    feats = []
    h = x[None]  # NHWC
    for i, (c_out, pool) in enumerate(_VGG_PLAN):
        if pool:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID",
            )
        w = params[f"conv{i}_w"]  # OIHW
        h = jax.lax.conv_general_dilated(
            h, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "OIHW", "NHWC"),
        ) + params[f"conv{i}_b"]
        h = jax.nn.relu(h)
        if i in _TAPS:
            feats.append(h[0])
    return feats


def lpips(params, img0: jax.Array, img1: jax.Array) -> jax.Array:
    """LPIPS distance between two (H, W, 3) images in [0, 1]."""
    def norm_in(x):
        x = x * 2.0 - 1.0
        return (x - _SHIFT) / _SCALE

    f0 = _vgg_features(params, norm_in(img0))
    f1 = _vgg_features(params, norm_in(img1))
    total = jnp.zeros(())
    for j, (a, b) in enumerate(zip(f0, f1)):
        na = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
        nb = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
        d = (na - nb) ** 2  # (H', W', C)
        total = total + jnp.mean(
            jnp.sum(d * params[f"lin{j}_w"], axis=-1)
        )
    return total
