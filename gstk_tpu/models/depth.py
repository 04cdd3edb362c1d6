"""Depth-supervised Gaussian Splatting ("co-gs") — loss assembly.

TPU-native equivalent of ``DepthGSModel`` (``gs_toolkit/models/depth_gs.py``).
The render path is identical to vanilla (depth is always composited as the
4th channel here), so this module only adds the depth-loss zoo, with the
reference's iteration gates expressed as traced indicators so one compiled
step serves all steps:

  * sensor path: masked depth L1 over nonzero GT (depth_gs.py:532-538);
  * mono-depth path (use_est_depth): local Pearson patches, scale/shift
    corrected log-L1 with image-gradient weighting, edge-aware depth
    regularization, TV (depth_gs.py:477-531);
  * sparse opacity entropy every 100 steps (depth_gs.py:463-468 — applied in
    sigmoid space; the reference evaluates log() on raw logits, a latent NaN);
  * planar prior via least-squares local plane fits (CogsPipeline's
    add_planar_loss, cogs_pipeline.py:60-77; see utils/losses.py for the
    RANSAC->closed-form redesign).

Deviation note: the reference's `main_loss` drops the SSIM term via a
stray-statement bug (depth_gs.py:446-449) and adds `depth_l1` unweighted;
we keep vanilla's correct (1-λ)L1+λ(1-SSIM) and weight depth terms by
``depth_lambda``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from gstk_tpu.core.gaussians import GaussianScene
from gstk_tpu.models.vanilla import VanillaConfig
from gstk_tpu.utils import losses


@dataclasses.dataclass(frozen=True)
class DepthConfig(VanillaConfig):
    """co-gs hyperparameters (depth_gs.py:39-145)."""

    num_downscales: int = 0
    stop_screen_size_at: int = 8000
    stop_split_at: int = 25_000
    use_sparse_loss: bool = False
    sparse_lambda: float = 0.1
    use_depth_loss: bool = True
    depth_lambda: float = 0.1
    depth_loss_start_iteration: int = 6_000
    depth_loss_stop_iteration: int = 25_000
    use_est_depth: bool = False
    use_pearson_depth: bool = False
    mono_depth_l1_start_iteration: int = 15_000
    use_scaled_est_depth: bool = False
    local_patch_size: int = 128
    use_depth_regularization: bool = False
    using_planar_loss: bool = False
    planar_loss_start_iteration: int = 10_000
    using_tv_loss: bool = False


def depth_loss_terms(
    cfg: DepthConfig,
    step: jax.Array,
    pred_depth: jax.Array,
    gt_depth: Optional[jax.Array],
    gt_img: jax.Array,
    scene: GaussianScene,
    key: jax.Array,
    mask: Optional[jax.Array] = None,
    mono_scale: Optional[jax.Array] = None,
    mono_shift: Optional[jax.Array] = None,
    camera=None,
) -> Dict[str, jax.Array]:
    """Extra loss terms beyond the vanilla RGB loss. All iteration gates are
    traced (multiplicative indicators) so the step compiles once."""
    out: Dict[str, jax.Array] = {}
    zero = jnp.zeros(())

    if cfg.use_sparse_loss:
        gate = (step % 100 == 0).astype(jnp.float32)
        out["sparse_loss"] = (
            cfg.sparse_lambda
            * gate
            * losses.sparse_opacity_loss(
                jax.nn.sigmoid(scene.opacities[:, 0]), scene.alive
            )
        )

    if gt_depth is None or not cfg.use_depth_loss:
        return out

    if mask is not None:
        m = mask.astype(pred_depth.dtype)
        pred_depth = pred_depth * m
        gt_depth = gt_depth * m

    in_window = (step > cfg.depth_loss_start_iteration).astype(jnp.float32)
    before_stop = (step < cfg.depth_loss_stop_iteration).astype(jnp.float32)

    if cfg.use_est_depth:
        kp, kpl = jax.random.split(key)
        if cfg.use_pearson_depth:
            out["depth_local_pearson"] = (
                in_window
                * before_stop
                * losses.local_pearson_loss(
                    pred_depth, gt_depth,
                    box_size=min(cfg.local_patch_size, min(pred_depth.shape) - 1),
                    key=kp,
                )
            )
        if cfg.use_scaled_est_depth and mono_scale is not None:
            out["log_depth"] = in_window * losses.log_depth_gradient_loss(
                pred_depth, gt_depth, gt_img, mono_scale, mono_shift
            )
        if cfg.use_depth_regularization:
            out["depth_reg_loss"] = in_window * losses.edge_aware_smooth_loss(
                pred_depth, gt_img
            )
        if cfg.using_tv_loss:
            tv_gate = (step < 20_000).astype(jnp.float32)
            out["tv_loss"] = in_window * tv_gate * losses.total_variation(
                pred_depth
            )
    else:
        out["depth_l1"] = (
            cfg.depth_lambda * in_window * losses.depth_l1(pred_depth, gt_depth)
        )

    if cfg.using_planar_loss and camera is not None:
        gate = (step > cfg.planar_loss_start_iteration).astype(jnp.float32)
        out["planar_loss"] = gate * 10.0 * losses.local_planar_loss(
            pred_depth, camera.fx, camera.fy, camera.cx, camera.cy,
            key, patch_size=min(cfg.local_patch_size, min(pred_depth.shape) // 2),
        )
    return out
