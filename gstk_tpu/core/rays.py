"""Per-pixel camera rays + scene colliders.

Equivalent of the reference's ray machinery used outside the splat hot path
(``gs_toolkit/cameras/cameras.py:344`` generate_rays,
``gs_toolkit/cameras/rays.py`` RayBundle,
``gs_toolkit/model_components/scene_colliders.py``): pixel ray generation for
point-cloud backprojection/colliders, and AABB / sphere / near-far colliders
returning per-ray [near, far] ranges. Pure jnp.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from gstk_tpu.core.cameras import Camera


class RayBundle(NamedTuple):
    origins: jax.Array  # (..., 3)
    directions: jax.Array  # (..., 3) unit
    nears: Optional[jax.Array] = None  # (...,)
    fars: Optional[jax.Array] = None


def generate_rays(
    camera: Camera, img_height: int, img_width: int
) -> RayBundle:
    """World-space rays through every pixel center (OpenGL c2w convention:
    camera looks along -z)."""
    ys, xs = jnp.meshgrid(
        jnp.arange(img_height, dtype=jnp.float32),
        jnp.arange(img_width, dtype=jnp.float32),
        indexing="ij",
    )
    x_c = (xs + 0.5 - camera.cx) / camera.fx
    y_c = (ys + 0.5 - camera.cy) / camera.fy
    dirs_cam = jnp.stack([x_c, -y_c, -jnp.ones_like(x_c)], axis=-1)
    dirs_world = dirs_cam @ camera.c2w[:3, :3].T
    dirs_world = dirs_world / jnp.linalg.norm(
        dirs_world, axis=-1, keepdims=True
    )
    origins = jnp.broadcast_to(camera.c2w[:3, 3], dirs_world.shape)
    return RayBundle(origins=origins, directions=dirs_world)


def aabb_collider(
    rays: RayBundle, aabb: jax.Array, near_plane: float = 0.0
) -> RayBundle:
    """Slab-test AABB intersection (scene_colliders.py AABBBoxCollider)."""
    inv = 1.0 / jnp.where(
        jnp.abs(rays.directions) < 1e-10, 1e-10, rays.directions
    )
    t0 = (aabb[0] - rays.origins) * inv
    t1 = (aabb[1] - rays.origins) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    nears = jnp.maximum(tmin, near_plane)
    fars = jnp.maximum(tmax, nears + 1e-6)
    return rays._replace(nears=nears, fars=fars)


def sphere_collider(
    rays: RayBundle, center, radius: float, near_plane: float = 0.0
) -> RayBundle:
    """Ray-sphere intersection (scene_colliders.py SphereCollider)."""
    oc = rays.origins - jnp.asarray(center)
    b = jnp.sum(oc * rays.directions, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius * radius
    disc = jnp.maximum(b * b - c, 0.0)
    sq = jnp.sqrt(disc)
    nears = jnp.maximum(-b - sq, near_plane)
    fars = jnp.maximum(-b + sq, nears + 1e-6)
    return rays._replace(nears=nears, fars=fars)


def near_far_collider(
    rays: RayBundle, near: float, far: float
) -> RayBundle:
    """Constant [near, far] (scene_colliders.py NearFarCollider)."""
    shape = rays.origins.shape[:-1]
    return rays._replace(
        nears=jnp.full(shape, near), fars=jnp.full(shape, far)
    )
