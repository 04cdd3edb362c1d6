from gstk_tpu.models.vanilla import VanillaConfig, render_scene, rgb_loss
from gstk_tpu.models.depth import DepthConfig, depth_loss_terms
from gstk_tpu.models.surface import SurfaceConfig

__all__ = [
    "VanillaConfig",
    "DepthConfig",
    "SurfaceConfig",
    "render_scene",
    "rgb_loss",
    "depth_loss_terms",
]
