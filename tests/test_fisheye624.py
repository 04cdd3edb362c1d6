"""Fisheye624 + omnidirectional camera math (reference
camera_utils.py:664-960, cameras.py:578-1118 parity)."""

import numpy as np
import jax.numpy as jnp

from gstk_tpu.core.cameras import Camera
from gstk_tpu.core.fisheye624 import (
    fisheye624_project,
    fisheye624_unproject,
)
from gstk_tpu.core.rays import (
    generate_equirect_rays,
    generate_fisheye624_rays,
    generate_ods_rays,
    generate_orthographic_rays,
    generate_vr180_rays,
)

# a realistic Aria-like parameter set
PARAMS = np.array(
    [240.0, 242.0, 320.0, 240.0,          # fx fy cx cy
     0.35, -0.1, 0.02, -0.003, 0.0005, -0.0001,  # k0..k5
     1e-3, -5e-4,                          # p0 p1
     2e-4, -1e-4, 3e-4, -2e-4],            # s0..s3
    np.float32,
)


def test_project_zero_distortion_matches_equidistant():
    """With all distortion zero, the model reduces to the equidistant
    fisheye: pix = f * atan(r) * (a, b)/r + c."""
    params = PARAMS.copy()
    params[4:] = 0.0
    pts = np.array([[0.3, -0.2, 1.0], [0.0, 0.0, 2.0], [-1.0, 0.5, 0.5]],
                   np.float32)
    uv = np.asarray(fisheye624_project(jnp.asarray(pts), jnp.asarray(params)))
    a, b = pts[:, 0] / pts[:, 2], pts[:, 1] / pts[:, 2]
    r = np.sqrt(a * a + b * b)
    th = np.arctan(r)
    scale = np.where(r < 1e-9, 1.0, th / np.maximum(r, 1e-9))
    exp_u = 240.0 * a * scale + 320.0
    exp_v = 242.0 * b * scale + 240.0
    np.testing.assert_allclose(uv[:, 0], exp_u, rtol=1e-5)
    np.testing.assert_allclose(uv[:, 1], exp_v, rtol=1e-5)


def test_project_hand_value():
    """Hand-computed value for the on-axis and a known off-axis point."""
    uv = np.asarray(fisheye624_project(
        jnp.asarray([[0.0, 0.0, 1.0]]), jnp.asarray(PARAMS)
    ))
    np.testing.assert_allclose(uv[0], [320.0, 240.0], atol=1e-5)

    # off-axis point, full model, computed with the documented formulas
    x, y, z = 0.4, -0.25, 1.2
    a, b = x / z, y / z
    r = np.hypot(a, b)
    th = np.arctan(r)
    k = PARAMS[4:10]
    th_d = th + sum(k[i] * th ** (3 + 2 * i) for i in range(6))
    xr, yr = th_d * a / r, th_d * b / r
    rd2 = xr * xr + yr * yr
    p0, p1 = PARAMS[10], PARAMS[11]
    s0, s1, s2, s3 = PARAMS[12:16]
    u = xr + (2 * xr * xr + rd2) * p0 + 2 * xr * yr * p1 + s0 * rd2 + s1 * rd2 ** 2
    v = yr + (2 * yr * yr + rd2) * p1 + 2 * xr * yr * p0 + s2 * rd2 + s3 * rd2 ** 2
    expected = [240.0 * u + 320.0, 242.0 * v + 240.0]
    got = np.asarray(fisheye624_project(
        jnp.asarray([[x, y, z]]), jnp.asarray(PARAMS)
    ))[0]
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_unproject_roundtrip():
    rng = np.random.default_rng(0)
    # points within a ~75 deg half-FOV: the radial polynomial (like the
    # real Aria calibrations it models) is only monotonic over the lens FOV
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    pts[:, 2] = 1.0
    pts[:, :2] = np.clip(pts[:, :2], -1.8, 1.8)
    uv = fisheye624_project(jnp.asarray(pts), jnp.asarray(PARAMS))
    dirs = np.asarray(fisheye624_unproject(uv, jnp.asarray(PARAMS)))
    # direction parallel to the original point
    pn = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    np.testing.assert_allclose(dirs, pn, atol=2e-4)


def _cam(w=64, h=32):
    return Camera(
        fx=jnp.float32(w / 2), fy=jnp.float32(h),
        cx=jnp.float32(w / 2), cy=jnp.float32(h / 2),
        c2w=jnp.asarray(np.eye(4, dtype=np.float32)[:3]),
    )


def test_equirect_rays_cover_sphere():
    cam = _cam()
    rays = generate_equirect_rays(cam, 32, 64)
    d = np.asarray(rays.directions)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # center pixel looks along -z (theta=0, phi=pi/2)
    np.testing.assert_allclose(d[16, 32], [0, 0, -1], atol=0.1)
    # full sphere coverage: mean direction ~ 0
    assert np.linalg.norm(d.reshape(-1, 3).mean(0)) < 0.05
    # reference vertical convention: top row points up (+y)
    assert d[0, :, 1].mean() > 0.9


def test_ods_origins_on_ipd_circle():
    cam = _cam()
    for eye, sign in (("left", -1.0), ("right", 1.0)):
        rays = generate_ods_rays(cam, 32, 64, eye=eye, ipd=0.064)
        o = np.asarray(rays.origins)
        r = np.linalg.norm(o[0], axis=-1)
        np.testing.assert_allclose(r, 0.032, atol=1e-6)
        # origins vary per column, constant per row
        assert np.allclose(o[0], o[-1])
        assert not np.allclose(o[0, 0], o[0, 32])


def test_vr180_rays():
    cam = _cam()
    left = generate_vr180_rays(cam, 32, 64, eye="left")
    right = generate_vr180_rays(cam, 32, 64, eye="right")
    ol = np.asarray(left.origins)[0, 0]
    orr = np.asarray(right.origins)[0, 0]
    np.testing.assert_allclose(orr - ol, [0.064, 0, 0], atol=1e-6)
    d = np.asarray(left.directions)
    # half sphere: all z <= small positive
    assert (d[..., 2] < 1e-3).mean() > 0.99


def test_orthographic_rays_parallel():
    cam = _cam()
    rays = generate_orthographic_rays(cam, 32, 64)
    d = np.asarray(rays.directions).reshape(-1, 3)
    np.testing.assert_allclose(d, np.tile([[0, 0, -1.0]], (d.shape[0], 1)),
                               atol=1e-6)
    o = np.asarray(rays.origins)
    assert not np.allclose(o[0, 0], o[0, -1])


def test_fisheye624_rays_center():
    cam = Camera(
        fx=jnp.float32(240.0), fy=jnp.float32(242.0),
        cx=jnp.float32(320.0), cy=jnp.float32(240.0),
        c2w=jnp.asarray(np.eye(4, dtype=np.float32)[:3]),
    )
    rays = generate_fisheye624_rays(cam, 480, 640, jnp.asarray(PARAMS[4:]))
    d = np.asarray(rays.directions)
    np.testing.assert_allclose(
        np.linalg.norm(d, axis=-1), 1.0, atol=1e-5
    )
    # principal-point ray looks along -z (OpenGL)
    np.testing.assert_allclose(d[240, 320], [0, 0, -1], atol=5e-3)
