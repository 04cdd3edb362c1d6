from gstk_tpu.models.vanilla import VanillaConfig, render_scene, rgb_loss

__all__ = ["VanillaConfig", "render_scene", "rgb_loss"]
