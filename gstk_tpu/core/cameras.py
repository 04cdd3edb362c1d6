"""Camera pytree for the splat render path.

TPU-native replacement for the reference ``Cameras`` TensorDataclass
(``gs_toolkit/cameras/cameras.py:62``) in the rasterization path. The
reference class carries ray-generation machinery for its NeRF-legacy paths;
the splat renderer only needs intrinsics + extrinsics + static image size, so
this is a lean, jit-friendly NamedTuple: all floats are traced arrays, while
height/width are static Python ints (XLA needs static image shapes).

Conventions (must match the reference model, vanilla_gs.py:722-742):
  * ``c2w`` is camera-to-world, OpenGL convention (+x right, +y up, -z
    forward) as produced by nerfstudio-style ``transforms.json``.
  * The world-to-camera view matrix flips y/z (diag(1,-1,-1)) into the
    OpenCV/gsplat convention before inverting.
  * The full projection is an OpenGL frustum with near=0.001, far=1000
    (vanilla_gs.py:742, utils/comms.py:103).
"""

from __future__ import annotations

import enum
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gstk_tpu.utils.math import projection_matrix


class CameraModel(enum.Enum):
    """Supported camera models (reference: cameras/cameras.py:30-60)."""

    PERSPECTIVE = "perspective"
    FISHEYE = "fisheye"
    EQUIRECTANGULAR = "equirectangular"


class Camera(NamedTuple):
    """One pinhole camera. All array fields are shaped () or (3, 4)."""

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    c2w: jax.Array  # (3, 4) OpenGL camera-to-world

    @property
    def position(self) -> jax.Array:
        return self.c2w[:3, 3]

    def scaled(self, factor: float) -> "Camera":
        """Rescale intrinsics (coarse-to-fine; reference
        cameras.py:1176 rescale_output_resolution)."""
        return self._replace(
            fx=self.fx * factor,
            fy=self.fy * factor,
            cx=self.cx * factor,
            cy=self.cy * factor,
        )


def view_matrix(c2w: jax.Array) -> jax.Array:
    """OpenGL c2w (3,4) -> OpenCV world-to-camera (4,4).

    Analytic inverse with the gsplat y/z flip (vanilla_gs.py:726-739)."""
    R = c2w[:3, :3] * jnp.asarray([1.0, -1.0, -1.0])[None, :]
    t = c2w[:3, 3:4]
    R_inv = R.T
    t_inv = -R_inv @ t
    top = jnp.concatenate([R_inv, t_inv], axis=1)
    bottom = jnp.asarray([[0.0, 0.0, 0.0, 1.0]], top.dtype)
    return jnp.concatenate([top, bottom], axis=0)


def camera_matrices(
    camera: Camera, img_height: int, img_width: int
) -> Tuple[jax.Array, jax.Array]:
    """Build (viewmat (4,4), fullmat = projmat @ viewmat (4,4))."""
    viewmat = view_matrix(camera.c2w)
    fovx = 2.0 * jnp.arctan(0.5 * img_width / camera.fx)
    fovy = 2.0 * jnp.arctan(0.5 * img_height / camera.fy)
    projmat = projection_matrix(0.001, 1000.0, fovx, fovy)
    return viewmat, projmat @ viewmat
