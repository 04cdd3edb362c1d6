"""Ray generation + collider tests."""

import jax.numpy as jnp
import numpy as np

from gstk_tpu.core.cameras import Camera
from gstk_tpu.core.rays import (
    aabb_collider,
    generate_rays,
    near_far_collider,
    sphere_collider,
)


def _cam():
    c2w = np.eye(4)[:3].astype(np.float32)
    c2w[:3, 3] = [0, 0, 5.0]
    return Camera(
        fx=jnp.float32(50.0), fy=jnp.float32(50.0),
        cx=jnp.float32(32.0), cy=jnp.float32(24.0),
        c2w=jnp.asarray(c2w),
    )


def test_generate_rays():
    rays = generate_rays(_cam(), 48, 64)
    assert rays.origins.shape == (48, 64, 3)
    np.testing.assert_allclose(np.asarray(rays.origins[0, 0]), [0, 0, 5.0])
    norms = np.linalg.norm(np.asarray(rays.directions), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-6)
    # central pixel looks along -z
    center = np.asarray(rays.directions[24, 32])
    assert center[2] < -0.99


def test_aabb_collider():
    rays = generate_rays(_cam(), 48, 64)
    box = jnp.asarray([[-1.0, -1, -1], [1, 1, 1]])
    out = aabb_collider(rays, box)
    # central ray: camera z=5 -> box [ -1, 1 ]: near=4, far=6
    np.testing.assert_allclose(float(out.nears[24, 32]), 4.0, atol=0.02)
    np.testing.assert_allclose(float(out.fars[24, 32]), 6.0, atol=0.02)


def test_sphere_collider():
    rays = generate_rays(_cam(), 48, 64)
    out = sphere_collider(rays, (0.0, 0.0, 0.0), 1.0)
    np.testing.assert_allclose(float(out.nears[24, 32]), 4.0, atol=0.02)
    np.testing.assert_allclose(float(out.fars[24, 32]), 6.0, atol=0.02)


def test_near_far():
    rays = generate_rays(_cam(), 8, 8)
    out = near_far_collider(rays, 0.1, 10.0)
    np.testing.assert_allclose(float(out.nears[0, 0]), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(out.fars[0, 0]), 10.0, rtol=1e-6)
