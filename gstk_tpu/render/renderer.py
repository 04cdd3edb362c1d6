"""Offline renderer: checkpoint -> (pose in, rgb/depth out).

Equivalent of the reference ``Renderer`` (``gs_toolkit/render/renderer.py:11-90``)
which wraps ``eval_setup`` + ``model.get_outputs_for_camera``: load a trained
scene from a checkpoint, then render arbitrary camera poses. Render functions
are jit-cached per image size.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from gstk_tpu.core.cameras import Camera
from gstk_tpu.core.gaussians import GaussianScene
from gstk_tpu.models.vanilla import VanillaConfig, render_scene
from gstk_tpu.ops.rasterize import RasterizeConfig
from gstk_tpu.train.checkpoint import latest_checkpoint, load_scene, peek_meta


class Renderer:
    def __init__(
        self,
        checkpoint: Union[str, Path],
        model_config: VanillaConfig = VanillaConfig(),
        raster_config: Optional[RasterizeConfig] = None,
        background=(0.0, 0.0, 0.0),
        precision: str = "exact",
    ):
        """``precision`` sets the render-only forward-kernel mode
        (ops/rasterize.RasterizeConfig.kernel_precision). "exact" is the
        default: offline renders feed eval parity and mm-quantized depth
        (a "fast" depth carries ~2^-9 relative error — centimeters at
        room scale). "high"/"fast" suit preview/throughput renders."""
        from gstk_tpu.utils.runtime import enable_persistent_compile_cache

        enable_persistent_compile_cache()
        path = Path(checkpoint)
        if path.is_dir():
            found = latest_checkpoint(path)
            if found is None:
                found = latest_checkpoint(path / "ckpts")
            if found is None:
                raise FileNotFoundError(f"no checkpoint under {path}")
            path = found
        self.scene, self.step = load_scene(path)
        self.model_config = model_config
        # The trainer persists the GROWN rasterizer shape (isect_capacity,
        # bands) with every checkpoint (train/checkpoint.py save extras): a
        # densified scene can need more bands than resolution-based
        # auto-banding provides, and truncated intersections silently wreck
        # offline eval (observed PSNR 20.1 -> 15.2 on the 15k checkpoint).
        self._meta_bands = 0
        self._meta_isect = 0
        # Active (ramp-clamped) SH degree at save time; default to the model
        # config for checkpoints predating the field. Rendering with
        # cfg.sh_degree instead would only match when inactive rest
        # coefficients are still exactly zero.
        self.sh_degree = model_config.sh_degree
        try:
            meta = peek_meta(path)
            self._meta_bands = int(meta.get("bands", 0))
            self._meta_isect = int(meta.get("isect_capacity", 0))
            self.sh_degree = int(meta.get("sh_degree", self.sh_degree))
        except Exception:
            pass
        if raster_config is None:
            # full per-band budget + auto-banding; bands=0 resolves per
            # render size in _render_fn, floored at the checkpoint's
            # trained band count, and the per-band capacity floors at the
            # checkpoint's grown capacity (the trainer runs to 2^21 before
            # banding — a 2^20 default would truncate intersections and
            # silently wreck offline eval: observed 22.93 -> 21.37 PSNR on
            # the 240-view 15k checkpoint).
            raster_config = RasterizeConfig(
                isect_capacity=max(1 << 20, self._meta_isect), bands=0,
                kernel_precision=precision,
                # Forward-only rendering measured faster with the
                # transposed attr table at the trained-scene operating
                # points (r5 hardware matrix, docs/PERFORMANCE.md:
                # 56.8 -> 62.4 M rays/s exact @800x800/104k; >=400k
                # capacity picks it via "auto" anyway). Caveat: at very
                # high intersections-per-Gaussian (e.g. the synthetic 4K
                # scene at ~46 isects/gaussian) the column-pack cost
                # dominates and "auto"/wide wins — pass an explicit
                # raster_config there. Values are identical between
                # layouts (both exact f32).
                attr_layout="transposed",
                forward_only=True,
            )
        elif precision != "exact" and raster_config.kernel_precision != precision:
            # An explicit raster_config must not silently discard a
            # non-default precision request (advisor r4): thread it in.
            import dataclasses

            raster_config = dataclasses.replace(
                raster_config, kernel_precision=precision
            )
        self.raster_config = raster_config
        self.background = jnp.asarray(background, jnp.float32)
        self._cache: Dict = {}

    def _raster_for(self, h: int, w: int) -> RasterizeConfig:
        """Resolve the per-size rasterizer config: auto bands from the pixel
        count, floored at the band count the checkpoint trained with."""
        rc = self.raster_config
        bands = rc.bands
        if bands == 0:  # auto (matches ops/rasterize.py)
            bands = max(1, -(-h * w // 640_000))
            # bands=0 means "auto", not an explicit band choice: the
            # checkpoint floor applies to any auto-banded config (a caller
            # tweaking only capacity must not silently lose the floor and
            # re-expose intersection truncation). Explicit bands >= 1 opt
            # out of the floor.
            bands = max(bands, self._meta_bands)
        if bands != rc.bands:
            import dataclasses

            rc = dataclasses.replace(rc, bands=bands)
        return rc

    def _render_fn(self, h: int, w: int, has_crop: bool):
        key = (h, w, has_crop)
        if key not in self._cache:
            cfg = self.model_config
            raster_cfg = self._raster_for(h, w)

            def fn(scene: GaussianScene, camera: Camera, crop_box=None):
                return render_scene(
                    scene, camera, h, w,
                    sh_degree=self.sh_degree, background=self.background,
                    config=cfg, raster_config=raster_cfg,
                    crop_box=crop_box,
                )

            self._cache[key] = jax.jit(fn)
        return self._cache[key]

    def get_output_from_pose(
        self, c2w: np.ndarray, fx: float, fy: float, cx: float, cy: float,
        height: int, width: int, crop_box=None,
    ) -> Dict[str, np.ndarray]:
        """Render one pose ((3,4) or (4,4) OpenGL c2w). Returns numpy rgb
        (H,W,3), depth (H,W), accumulation (H,W). ``crop_box`` is an optional
        SceneBox/OrientedBox filtering the Gaussians (the reference's
        get_outputs_for_camera obb_box, vanilla_gs.py:949)."""
        c2w = np.asarray(c2w, np.float32)
        camera = Camera(
            fx=jnp.float32(fx), fy=jnp.float32(fy),
            cx=jnp.float32(cx), cy=jnp.float32(cy),
            c2w=jnp.asarray(c2w[:3, :4]),
        )
        fn = self._render_fn(height, width, crop_box is not None)
        if crop_box is not None:
            out = fn(self.scene, camera, crop_box)
        else:
            out = fn(self.scene, camera)
        return {
            "rgb": np.asarray(out["rgb"]),
            "depth": np.asarray(out["depth"]),
            "accumulation": np.asarray(out["alpha"]),
        }
