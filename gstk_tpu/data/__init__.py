from gstk_tpu.data.dataparser import (
    DataparserConfig,
    DataparserOutputs,
    parse_transforms,
)
from gstk_tpu.data.datamanager import FullImageDatamanager

__all__ = [
    "DataparserConfig",
    "DataparserOutputs",
    "parse_transforms",
    "FullImageDatamanager",
]
