"""Surface-constrained Gaussian Splatting ("surface-gs").

TPU-native equivalent of ``SurfaceGSModel``
(``gs_toolkit/models/surface_gs.py:108-1010``), which is vanilla with
(a) fixed means (``means.requires_grad = False``) and (b) the grad-driven
densification stats disabled. Here that is a config: the train step freezes
the ``means`` group, and an infinite densify threshold disables split/dup
while alpha/size culling continues (the reference's cull-only refinement
path).
"""

from __future__ import annotations

import dataclasses

from gstk_tpu.models.vanilla import VanillaConfig


@dataclasses.dataclass(frozen=True)
class SurfaceConfig(VanillaConfig):
    freeze_means: bool = True
    # no grad-driven densification: splits/dups never trigger
    densify_grad_thresh: float = float("inf")


FROZEN_GROUPS = ("means",)
