"""Loss functions: L1, SSIM, and the depth-supervision loss zoo.

TPU-native ports of the reference losses:
  * SSIM matching pytorch_msssim defaults used by the reference models
    (vanilla_gs.py:177 ``SSIM(data_range=1.0, size_average=True, channel=3)``):
    11x11 Gaussian window, sigma 1.5, K1=0.01, K2=0.03 — implemented as
    depthwise ``lax.conv`` so XLA maps it onto the conv/MXU units.
  * Depth losses from ``gs_toolkit/utils/losses.py``: L2/L1 on valid depth,
    global/local Pearson correlation, total variation, edge-aware smoothing.
All functions are pure and differentiable.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def l1(pred: jax.Array, gt: jax.Array) -> jax.Array:
    return jnp.abs(pred - gt).mean()


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _band_matrix(n: int, win: np.ndarray) -> np.ndarray:
    """Banded matrix B (n, n-size+1) with B[j+k, j] = win[k]: valid-mode
    1D correlation as a matmul. Grouped depthwise convs lower poorly on TPU;
    a dense (H, n)@(n, n-10) contraction rides the MXU instead."""
    size = win.shape[0]
    out = np.zeros((n, n - size + 1), np.float32)
    for k in range(size):
        out[k : k + n - size + 1, :][
            np.arange(n - size + 1), np.arange(n - size + 1)
        ] = win[k]
    return out


# SSIM filter backend: "matmul" = dense banded MXU contractions (spends
# ~win_size/1 extra FLOPs but rides the MXU in 2 big ops); "taps" = VPU
# shifted-slice weighted sums (exact FLOP count, one fusion per axis).
# Hardware A/B toggle (env GSTK_SSIM_FILTER overrides) — docs/PERFORMANCE.md.
import os as _os

_SSIM_FILTER = _os.environ.get("GSTK_SSIM_FILTER", "matmul")


def _filter2d_separable(img: jax.Array, win: np.ndarray) -> jax.Array:
    """Depthwise separable valid-mode filtering. img (H, W, C).

    matmul backend: banded (H,W)@(W,V) contractions at precision HIGH
    (3-pass bf16 split, ~2^-21) not HIGHEST (6-pass): images live in
    [0, 1] and SSIM's constants (c1=1e-4) sit far above the split
    residual, so the extra 3 passes bought nothing but time.

    taps backend: the band matrix is 11 diagonals — the dense contraction
    wastes W/11 ~ 73x FLOPs. A valid-mode tap sum is ``sum_k win[k] *
    img[:, k:k+V]``: static slices of one buffer, which XLA fuses into a
    single VPU loop per axis with no relayouts (the failure mode that
    motivated the matmul form was per-channel-group fusion overhead, not
    slicing)."""
    if _SSIM_FILTER == "taps":
        size = win.shape[0]
        v = img.shape[1] - size + 1
        x = sum(
            float(win[k]) * jax.lax.slice_in_dim(img, k, k + v, axis=1)
            for k in range(size)
        )
        u = x.shape[0] - size + 1
        return sum(
            float(win[k]) * jax.lax.slice_in_dim(x, k, k + u, axis=0)
            for k in range(size)
        )
    h, w = img.shape[0], img.shape[1]
    bw = jnp.asarray(_band_matrix(w, win))
    bh = jnp.asarray(_band_matrix(h, win))
    x = jnp.einsum("hwc,wv->hvc", img, bw, precision=jax.lax.Precision.HIGH)
    return jnp.einsum(
        "hvc,hu->uvc", x, bh, precision=jax.lax.Precision.HIGH
    )


def ssim(
    pred: jax.Array,
    gt: jax.Array,
    data_range: float = 1.0,
    win_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Mean SSIM over an (H, W, C) image pair (pytorch_msssim semantics)."""
    win = _gaussian_window(win_size, sigma)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    # ONE stacked 5C-channel filter pass instead of five C-channel passes:
    # same MACs, but two large banded matmuls ride the MXU far better than
    # thirty small fusions (the per-fusion launch/relayout overhead was
    # most of the measured SSIM cost at 800x800).
    c = pred.shape[-1]
    stacked = jnp.concatenate(
        [pred, gt, pred * pred, gt * gt, pred * gt], axis=-1
    )
    f = _filter2d_separable(stacked, win)
    mu_x, mu_y = f[..., 0:c], f[..., c : 2 * c]
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_xx = f[..., 2 * c : 3 * c] - mu_xx
    sigma_yy = f[..., 3 * c : 4 * c] - mu_yy
    sigma_xy = f[..., 4 * c : 5 * c] - mu_xy

    cs = (2 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    ssim_map = ((2 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs
    return ssim_map.mean()


def total_variation(x: jax.Array) -> jax.Array:
    """TV loss on an (H, W) or (H, W, C) map (reference utils/losses.py:203)."""
    dh = jnp.abs(x[1:, ...] - x[:-1, ...]).mean()
    dw = jnp.abs(x[:, 1:, ...] - x[:, :-1, ...]).mean()
    return dh + dw


def depth_l1(pred: jax.Array, gt: jax.Array, valid: Optional[jax.Array] = None):
    """Mean L1 over valid (nonzero) GT depth (reference depth_gs.py:532-538)."""
    if valid is None:
        valid = gt > 0
    valid = valid.astype(pred.dtype)
    denom = jnp.maximum(valid.sum(), 1.0)
    return (jnp.abs(pred - gt) * valid).sum() / denom


def pearson_corr_loss(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """1 - Pearson correlation between flattened maps
    (reference utils/losses.py:12-24 global Pearson)."""
    a = pred.reshape(-1)
    b = gt.reshape(-1)
    a = a - a.mean()
    b = b - b.mean()
    denom = jnp.sqrt((a * a).sum() * (b * b).sum()) + 1e-8
    return 1.0 - (a * b).sum() / denom


def local_pearson_loss(
    pred: jax.Array, gt: jax.Array, box_size: int = 64, n_boxes: int = 8,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """Patchwise Pearson loss on random boxes (reference utils/losses.py:27-46)."""
    h, w = pred.shape[:2]
    if key is None:
        key = jax.random.PRNGKey(0)
    kx, ky = jax.random.split(key)
    x0 = jax.random.randint(kx, (n_boxes,), 0, max(w - box_size, 1))
    y0 = jax.random.randint(ky, (n_boxes,), 0, max(h - box_size, 1))

    def box_loss(x, y):
        p = jax.lax.dynamic_slice(pred, (y, x), (box_size, box_size))
        g = jax.lax.dynamic_slice(gt, (y, x), (box_size, box_size))
        return pearson_corr_loss(p, g)

    return jax.vmap(box_loss)(x0, y0).mean()


def log_depth_gradient_loss(
    pred_depth: jax.Array, gt_depth: jax.Array, gt_img: jax.Array,
    mono_scale: jax.Array, mono_shift: jax.Array,
) -> jax.Array:
    """Scale/shift-corrected log-L1 with image-gradient weighting
    (reference depth_gs.py:492-519): logl1 = log(1 + |gt - (s*pred + c)|),
    weighted by exp(-|dI|) along x and y."""
    scaled = mono_scale * pred_depth + mono_shift
    logl1 = jnp.log1p(jnp.abs(gt_depth - scaled))
    gx = jnp.exp(-jnp.abs(gt_img[:, :-1, :] - gt_img[:, 1:, :]).mean(-1))
    gy = jnp.exp(-jnp.abs(gt_img[:-1, :, :] - gt_img[1:, :, :]).mean(-1))
    return (gx * logl1[:, :-1]).mean() + (gy * logl1[:-1, :]).mean()


def local_planar_loss(
    depth: jax.Array,
    fx, fy, cx, cy,
    key: jax.Array,
    patch_size: int = 32,
    n_patches: int = 16,
) -> jax.Array:
    """Planarity prior: least-squares plane fit over random depth patches,
    penalizing point-to-plane distances.

    Differentiable re-design of the reference's RANSAC plane regression
    (utils/losses.py:86-195, invoked via CogsPipeline.add_planar_loss,
    cogs_pipeline.py:60-77): RANSAC's argmax inlier selection doesn't
    differentiate or vectorize on TPU, so we fit each patch's plane in closed
    form (smallest eigenvector of the centered covariance) — the same prior,
    XLA-friendly."""
    h, w = depth.shape
    kx, ky = jax.random.split(key)
    x0 = jax.random.randint(kx, (n_patches,), 0, max(w - patch_size, 1))
    y0 = jax.random.randint(ky, (n_patches,), 0, max(h - patch_size, 1))
    jj, ii = jnp.meshgrid(jnp.arange(patch_size), jnp.arange(patch_size))

    def patch_loss(px, py):
        d = jax.lax.dynamic_slice(depth, (py, px), (patch_size, patch_size))
        u = (px + jj - cx) / fx
        v = (py + ii - cy) / fy
        pts = jnp.stack([u * d, v * d, d], axis=-1).reshape(-1, 3)
        c = pts.mean(axis=0)
        centered = pts - c
        cov = centered.T @ centered / pts.shape[0]
        # smallest eigenvector = plane normal
        w_, v_ = jnp.linalg.eigh(cov + 1e-12 * jnp.eye(3))
        normal = v_[:, 0]
        dist = jnp.abs(centered @ normal)
        return dist.mean()

    return jax.vmap(patch_loss)(x0, y0).mean()


def sparse_opacity_loss(opacities_sigmoid: jax.Array, alive: jax.Array) -> jax.Array:
    """Entropy-style sparsity on opacities: push toward 0 or 1.

    The reference computes log(op) + log(1-op) on the *logit* parameters
    (depth_gs.py:463-468) which is NaN for logits outside (0,1) — clearly
    intended for sigmoid space; we apply it there."""
    op = jnp.clip(opacities_sigmoid, 1e-6, 1.0 - 1e-6)
    term = jnp.log(op) + jnp.log(1.0 - op)
    term = jnp.where(alive, term, 0.0)
    return term.sum() / jnp.maximum(alive.sum(), 1)


def edge_aware_smooth_loss(depth: jax.Array, image: jax.Array) -> jax.Array:
    """Edge-weighted depth smoothness: depth gradients are penalized less
    across image edges (stands in for the reference's canny-masked
    nearMean_map smoothing, utils/losses.py:49-84, in a differentiable form)."""
    dd_x = jnp.abs(depth[:, 1:] - depth[:, :-1])
    dd_y = jnp.abs(depth[1:, :] - depth[:-1, :])
    di_x = jnp.abs(image[:, 1:, :] - image[:, :-1, :]).mean(-1)
    di_y = jnp.abs(image[1:, :, :] - image[:-1, :, :]).mean(-1)
    return (dd_x * jnp.exp(-di_x)).mean() + (dd_y * jnp.exp(-di_y)).mean()
