from gstk_tpu.render.renderer import Renderer

__all__ = ["Renderer"]
