from gstk_tpu.configs.methods import method_configs

__all__ = ["method_configs"]
