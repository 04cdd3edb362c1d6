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


def _spherical_dirs(theta: jax.Array, phi: jax.Array) -> jax.Array:
    """Local camera directions from spherical angles (reference
    cameras.py:578-1118 equirect convention: +y up, theta=0 looks along
    -z, right-handed minus sign on theta)."""
    return jnp.stack(
        [
            -jnp.sin(theta) * jnp.sin(phi),
            jnp.cos(phi),
            -jnp.cos(theta) * jnp.sin(phi),
        ],
        axis=-1,
    )


def generate_equirect_rays(
    camera: Camera, img_height: int, img_width: int
) -> RayBundle:
    """Equirectangular panorama rays: theta spans +/-pi across the width,
    phi spans [0, pi] down the height (reference cameras.py EQUIRECTANGULAR
    branch: fx = fy = height = width/2 convention)."""
    ys, xs = jnp.meshgrid(
        jnp.arange(img_height, dtype=jnp.float32) + 0.5,
        jnp.arange(img_width, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    u = (xs - img_width / 2.0) / img_width  # [-1/2, 1/2]
    v = (ys - img_height / 2.0) / img_height
    theta = -2.0 * jnp.pi * u
    # reference applies the OpenCV->OpenGL flip (coord1 *= -1) before
    # phi = pi*(0.5 - coord1)  =>  phi = pi*(0.5 + v) in raw row coords
    phi = jnp.pi * (0.5 + v)
    dirs_cam = _spherical_dirs(theta, phi)
    dirs_world = dirs_cam @ camera.c2w[:3, :3].T
    origins = jnp.broadcast_to(camera.c2w[:3, 3], dirs_world.shape)
    return RayBundle(origins=origins, directions=dirs_world)


def generate_ods_rays(
    camera: Camera,
    img_height: int,
    img_width: int,
    eye: str = "left",
    ipd: float = 0.064,
) -> RayBundle:
    """Omni-directional stereo: equirect directions with per-column ray
    origins on a horizontal IPD circle (reference cameras.py
    _compute_rays_for_omnidirectional_stereo)."""
    rays = generate_equirect_rays(camera, img_height, img_width)
    xs = jnp.arange(img_width, dtype=jnp.float32) + 0.5
    u = (xs - img_width / 2.0) / img_width
    ods_theta = -2.0 * jnp.pi * u  # (W,)
    sign = 1.0 if eye == "right" else -1.0
    # circle in local camera coords: x-axis * cos + (-z axis) * sin
    local = sign * (ipd / 2.0) * jnp.stack(
        [jnp.cos(ods_theta), jnp.zeros_like(ods_theta), -jnp.sin(ods_theta)],
        axis=-1,
    )  # (W, 3)
    world_off = local @ camera.c2w[:3, :3].T
    origins = camera.c2w[:3, 3] + world_off  # (W, 3)
    origins = jnp.broadcast_to(origins[None], rays.directions.shape)
    return rays._replace(origins=origins)


def generate_vr180_rays(
    camera: Camera,
    img_height: int,
    img_width: int,
    eye: str = "left",
    ipd: float = 0.064,
) -> RayBundle:
    """VR180: half-sphere equirect (theta in +/-pi/2) with a fixed
    interocular offset along the camera x axis (reference cameras.py
    _compute_rays_for_vr180)."""
    ys, xs = jnp.meshgrid(
        jnp.arange(img_height, dtype=jnp.float32) + 0.5,
        jnp.arange(img_width, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    u = (xs - img_width / 2.0) / img_width
    v = (ys - img_height / 2.0) / img_height
    theta = -jnp.pi * u  # +/- pi/2 across the width
    phi = jnp.pi * (0.5 + v)
    dirs_cam = _spherical_dirs(theta, phi)
    dirs_world = dirs_cam @ camera.c2w[:3, :3].T
    sign = 1.0 if eye == "right" else -1.0
    off = sign * (ipd / 2.0) * camera.c2w[:3, 0]
    origins = jnp.broadcast_to(
        camera.c2w[:3, 3] + off, dirs_world.shape
    )
    return RayBundle(origins=origins, directions=dirs_world)


def generate_orthographic_rays(
    camera: Camera, img_height: int, img_width: int
) -> RayBundle:
    """Orthophoto rays: parallel -z directions, origins on the image-plane
    grid scaled by 1/f (reference cameras.py ORTHOPHOTO branch)."""
    ys, xs = jnp.meshgrid(
        jnp.arange(img_height, dtype=jnp.float32) + 0.5,
        jnp.arange(img_width, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    x_c = (xs - camera.cx) / camera.fx
    y_c = -(ys - camera.cy) / camera.fy
    grid = jnp.stack([x_c, y_c, jnp.zeros_like(x_c)], axis=-1)
    origins = grid @ camera.c2w[:3, :3].T + camera.c2w[:3, 3]
    d = -camera.c2w[:3, 2]
    d = d / jnp.linalg.norm(d)
    dirs = jnp.broadcast_to(d, origins.shape)
    return RayBundle(origins=origins, directions=dirs)


def generate_fisheye624_rays(
    camera: Camera,
    img_height: int,
    img_width: int,
    distortion_params: jax.Array,  # (12,) [k0..k5 p0 p1 s0..s3]
) -> RayBundle:
    """Fisheye624 rays via the Newton unprojection
    (gstk_tpu.core.fisheye624; reference cameras.py FISHEYE624 branch)."""
    from gstk_tpu.core.fisheye624 import fisheye624_unproject

    ys, xs = jnp.meshgrid(
        jnp.arange(img_height, dtype=jnp.float32) + 0.5,
        jnp.arange(img_width, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    uv = jnp.stack([xs, ys], axis=-1)
    params = jnp.concatenate(
        [
            jnp.stack([camera.fx, camera.fy, camera.cx, camera.cy]),
            jnp.asarray(distortion_params, jnp.float32),
        ]
    )
    d_cv = fisheye624_unproject(uv, params)
    # OpenCV (+z forward, +y down) -> OpenGL camera space
    dirs_cam = d_cv * jnp.asarray([1.0, -1.0, -1.0])
    dirs_world = dirs_cam @ camera.c2w[:3, :3].T
    dirs_world = dirs_world / jnp.linalg.norm(
        dirs_world, axis=-1, keepdims=True
    )
    origins = jnp.broadcast_to(camera.c2w[:3, 3], dirs_world.shape)
    return RayBundle(origins=origins, directions=dirs_world)
