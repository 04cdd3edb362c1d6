"""Vanilla 3D Gaussian Splatting model — functional render + loss.

TPU-native equivalent of the reference ``GaussianSplattingModel``
(``gs_toolkit/models/vanilla_gs.py:108-1009``). The torch model is a stateful
nn.Module; here the model is a pair of pure functions over the
:class:`~gstk_tpu.core.gaussians.GaussianScene` pytree so the whole train
step jits and shard_maps:

  * :func:`render_scene` — projection + SH + one fused rasterization pass.
    The reference rasterizes twice (RGB then depths-as-colors,
    vanilla_gs.py:822-855); we concatenate depth as a 4th channel and
    composite once — same math, half the rasterization work.
  * :func:`rgb_loss` — (1-λ)·L1 + λ·(1-SSIM) with optional mask and
    PhysGaussian scale regularization (vanilla_gs.py:900-947).

Hyperparameters mirror ``GaussianSplattingModelConfig`` (vanilla_gs.py:39-105).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from gstk_tpu.core.cameras import Camera, camera_matrices
from gstk_tpu.core.gaussians import GaussianScene
from gstk_tpu.ops.projection import project_gaussians
from gstk_tpu.ops.rasterize import RasterizeConfig, rasterize
from gstk_tpu.ops.sh import spherical_harmonics
from gstk_tpu.utils import losses
from gstk_tpu.utils.math import normalize


@dataclasses.dataclass(frozen=True)
class VanillaConfig:
    """Static model hyperparameters (reference vanilla_gs.py:39-105)."""

    warmup_length: int = 500
    refine_every: int = 100
    resolution_schedule: int = 2000
    background_color: str = "random"  # random | black | white
    num_downscales: int = 2
    cull_alpha_thresh: float = 0.1
    cull_scale_thresh: float = 0.5
    continue_cull_post_densification: bool = True
    reset_alpha_every: int = 30
    densify_grad_thresh: float = 0.0002
    densify_size_thresh: float = 0.01
    n_split_samples: int = 2
    sh_degree_interval: int = 1000
    cull_screen_size: float = 0.15
    split_screen_size: float = 0.05
    stop_screen_size_at: int = 4000
    random_init: bool = False
    num_random: int = 50000
    random_scale: float = 10.0
    ssim_lambda: float = 0.2
    stop_split_at: int = 10_000
    sh_degree: int = 3
    use_scale_regularization: bool = False
    max_gauss_ratio: float = 10.0
    rasterize_mode: str = "classic"  # classic | antialiased


def active_sh_degree(cfg: VanillaConfig, step: jax.Array) -> jax.Array:
    """SH degree schedule (vanilla_gs.py:804): step//interval, capped."""
    return jnp.minimum(step // cfg.sh_degree_interval, cfg.sh_degree)


def downscale_factor(cfg: VanillaConfig, step: int) -> int:
    """Coarse-to-fine factor (vanilla_gs.py:647-657). Host-side (static)."""
    return 2 ** max(cfg.num_downscales - int(step) // cfg.resolution_schedule, 0)


def render_scene(
    scene: GaussianScene,
    camera: Camera,
    img_height: int,
    img_width: int,
    *,
    sh_degree: int,
    background: jax.Array,
    config: VanillaConfig = VanillaConfig(),
    raster_config: RasterizeConfig = RasterizeConfig(),
    xys_offset: Optional[jax.Array] = None,
    crop_box=None,
) -> Dict[str, jax.Array]:
    """Render one camera view. Returns rgb/depth/alpha/background plus the
    densification signals (radii, visibility).

    ``sh_degree`` is the *active* degree (static int — the schedule changes it
    only every sh_degree_interval steps, so retraces are rare and cached).
    ``xys_offset`` is an optional (C, 2) zero array; gradients w.r.t. it give
    the screen-space positional gradient used by adaptive density control
    (replaces the reference's ``xys.retain_grad()``, vanilla_gs.py:797).
    """
    means = scene.means
    quats = normalize(scene.quats)
    scales = jnp.exp(scene.scales)
    viewmat, fullmat = camera_matrices(camera, img_height, img_width)

    proj = project_gaussians(
        means, scales, 1.0, quats, viewmat, fullmat,
        camera.fx, camera.fy, camera.cx, camera.cy,
        img_height, img_width, raster_config.block_width,
    )
    # Dead lanes never enter binning/compositing; an optional crop box
    # (core.scene_box.SceneBox/OrientedBox) filters eval renders the same way
    # (reference vanilla_gs.py:703-718).
    alive = scene.alive
    if crop_box is not None:
        alive = alive & crop_box.within(means)
    radii = jnp.where(alive, proj.radii, 0)
    num_tiles_hit = jnp.where(alive, proj.num_tiles_hit, 0)

    if sh_degree > 0 or config.sh_degree > 0:
        coeffs = jnp.concatenate(
            [scene.features_dc[:, None, :], scene.features_rest], axis=1
        )
        viewdirs = normalize(
            jax.lax.stop_gradient(means)
            - jax.lax.stop_gradient(camera.position)[None, :]
        )
        rgbs = spherical_harmonics(int(sh_degree), viewdirs, coeffs)
        rgbs = jnp.maximum(rgbs + 0.5, 0.0)
    else:
        rgbs = jax.nn.sigmoid(scene.features_dc)

    opac = jax.nn.sigmoid(scene.opacities)[:, 0]
    if config.rasterize_mode == "antialiased":
        opac = opac * proj.compensation
    elif config.rasterize_mode != "classic":
        raise ValueError(f"Unknown rasterize_mode {config.rasterize_mode}")
    opac = jnp.where(alive, opac, 0.0)

    xys = proj.xys if xys_offset is None else proj.xys + xys_offset

    # One fused pass: RGB + depth as a 4th channel (depth background = 0).
    colors4 = jnp.concatenate([rgbs, proj.depths[:, None]], axis=-1)
    bg4 = jnp.concatenate([background, jnp.zeros(1, background.dtype)])
    img4, alpha, raster_info = rasterize(
        xys, proj.depths, radii, proj.conics, num_tiles_hit,
        colors4, opac, img_height, img_width,
        background=bg4, config=raster_config, return_info=True,
    )
    rgb = jnp.minimum(img4[..., :3], 1.0)
    depth_acc = img4[..., 3]
    # Reference: depth / alpha where alpha > 0 else max depth
    # (vanilla_gs.py:855).
    fill = jax.lax.stop_gradient(jnp.max(depth_acc))
    depth = jnp.where(alpha > 0, depth_acc / jnp.maximum(alpha, 1e-10), fill)

    return {
        "rgb": rgb,
        "depth": depth,
        "alpha": alpha,
        "background": background,
        "radii": radii,
        "visible": radii > 0,
        "num_intersects": raster_info["num_intersects"],
    }


def composite_gt_with_background(image: jax.Array, background: jax.Array):
    """RGBA ground truth over the train background (vanilla_gs.py:870-878)."""
    if image.shape[-1] == 4:
        a = image[..., 3:4]
        return a * image[..., :3] + (1.0 - a) * background
    return image


def rgb_loss(
    pred: jax.Array,
    gt: jax.Array,
    scene: GaussianScene,
    config: VanillaConfig,
    mask: Optional[jax.Array] = None,
    apply_scale_reg: bool = False,
) -> Dict[str, jax.Array]:
    """(1-λ) L1 + λ (1-SSIM) (+ optional PhysGaussian scale reg)."""
    if mask is not None:
        m = mask.astype(pred.dtype)
        if m.ndim == 2:
            m = m[..., None]
        pred = pred * m
        gt = gt * m
    ll1 = losses.l1(pred, gt)
    simloss = 1.0 - losses.ssim(gt, pred)
    out = {
        "main_loss": (1.0 - config.ssim_lambda) * ll1
        + config.ssim_lambda * simloss,
    }
    if config.use_scale_regularization and apply_scale_reg:
        scale_exp = jnp.exp(scene.scales)
        ratio = jnp.max(scale_exp, axis=-1) / jnp.maximum(
            jnp.min(scale_exp, axis=-1), 1e-12
        )
        reg = jnp.maximum(ratio, config.max_gauss_ratio) - config.max_gauss_ratio
        # Only alive lanes contribute; normalize by alive count like the
        # reference's mean over live Gaussians (vanilla_gs.py:934-941).
        reg = jnp.where(scene.alive, reg, 0.0)
        denom = jnp.maximum(scene.num_alive.astype(reg.dtype), 1.0)
        out["scale_reg"] = 0.1 * reg.sum() / denom
    else:
        out["scale_reg"] = jnp.zeros(())
    return out
