"""Exact-output tile culling (projection.tight_extents).

The tight footprint may only DROP tiles where every pixel's alpha is below
the 1/255 compositing cutoff (forward.cu:329-340) — images and gradients
must be bit-for-bit unaffected. These tests pin:
  * the geometry (ellipse AABB vs the reference 3-sigma square),
  * opacity awareness (op < 1/255 culls outright; op == 1/255 keeps),
  * conservativeness (every pixel with alpha >= 1/255 stays covered),
  * end-to-end image equality with culling on vs off (jax path).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gstk_tpu.ops.projection import project_gaussians, tight_extents, tile_bbox
from gstk_tpu.ops.rasterize import RasterizeConfig, rasterize
from tests._scenes import make_camera, make_gaussians


def test_isotropic_full_opacity_matches_radius():
    # isotropic conic 1/s^2 * I, opacity 1: sigma_cut = ln(255) = 5.54 > 4.5
    # so the 3-sigma radius is binding and the extent clips to it exactly
    s = 4.0
    conics = jnp.asarray([[1 / s**2, 0.0, 1 / s**2]], jnp.float32)
    radii = jnp.asarray([np.ceil(3 * s)], jnp.float32)
    ext = tight_extents(conics, jnp.asarray([1.0 - 1e-7]), radii)
    np.testing.assert_allclose(np.asarray(ext), [[12.0, 12.0]], rtol=1e-6)


def test_anisotropic_minor_axis_shrinks():
    # sx >> sy: the square uses 3*sx in BOTH axes; the tight extent keeps
    # ~3.3*sy (= sqrt(2 ln 255) * sy at op=1) on the minor axis
    sx, sy = 16.0, 2.0
    conics = jnp.asarray([[1 / sx**2, 0.0, 1 / sy**2]], jnp.float32)
    radii = jnp.asarray([np.ceil(3 * sx)], jnp.float32)
    ext = np.asarray(tight_extents(conics, jnp.asarray([0.99]), radii))[0]
    assert ext[0] == 48.0  # clipped to the reference radius
    assert 6.0 < ext[1] < 7.5  # sqrt(2*ln(255*0.99))*2 = 6.66


def test_low_opacity_shrinks_and_subcutoff_culls():
    s = 4.0
    conics = jnp.asarray([[1 / s**2, 0.0, 1 / s**2]] * 3, jnp.float32)
    radii = jnp.asarray([12.0, 12.0, 12.0], jnp.float32)
    ops = jnp.asarray([0.05, 1.0 / 255.0, 1.0 / 256.0])
    ext = np.asarray(tight_extents(conics, ops, radii))
    # op=0.05: sigma_cut = ln(12.75) = 2.55 -> extent ~ sqrt(2*2.55)*4 = 9.0
    assert 8.5 < ext[0, 0] < 9.5
    # op exactly at the cutoff: center pixel still composites -> tiny extent
    assert 0 < ext[1, 0] < 0.1
    # below the cutoff: culled outright
    assert ext[2, 0] == 0.0 and ext[2, 1] == 0.0


def test_conservative_every_visible_pixel_covered(rng=None):
    rng = np.random.default_rng(11)
    n = 300
    cam = make_camera()
    means, scales, quats, colors, opacities = make_gaussians(rng, n)
    proj = project_gaussians(
        jnp.asarray(means), jnp.asarray(scales), 1.0, jnp.asarray(quats),
        jnp.asarray(cam["viewmat"]), jnp.asarray(cam["fullmat"]),
        cam["fx"], cam["fy"], cam["cx"], cam["cy"], cam["img_h"], cam["img_w"],
    )
    op = np.asarray(opacities)
    ext = np.asarray(
        tight_extents(proj.conics, jnp.asarray(op), proj.radii.astype(jnp.float32))
    )
    tb = ((cam["img_w"] + 15) // 16, (cam["img_h"] + 15) // 16)
    tmin, tmax = tile_bbox(proj.xys, jnp.asarray(ext), tb, 16)
    tmin, tmax = np.asarray(tmin), np.asarray(tmax)
    xys = np.asarray(proj.xys)
    conics = np.asarray(proj.conics)
    radii = np.asarray(proj.radii)
    # brute force: every pixel with alpha >= 1/255 inside the reference
    # square must lie in a tile the tight bbox keeps
    checked = 0
    for i in range(n):
        if radii[i] <= 0:
            continue
        x0 = int(max(np.floor(xys[i, 0] - radii[i]), 0))
        x1 = int(min(np.ceil(xys[i, 0] + radii[i]), cam["img_w"] - 1))
        y0 = int(max(np.floor(xys[i, 1] - radii[i]), 0))
        y1 = int(min(np.ceil(xys[i, 1] + radii[i]), cam["img_h"] - 1))
        if x1 < x0 or y1 < y0:
            continue
        px, py = np.meshgrid(np.arange(x0, x1 + 1), np.arange(y0, y1 + 1))
        dx = xys[i, 0] - px
        dy = xys[i, 1] - py
        ca, cb, cc = conics[i]
        sig = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
        alpha = op[i] * np.exp(-sig)
        vy, vx = np.nonzero((sig >= 0) & (alpha >= 1.0 / 255.0))
        if vy.size == 0:
            continue
        tx = (px[vy, vx] // 16).astype(np.int64)
        ty = (py[vy, vx] // 16).astype(np.int64)
        assert tx.min() >= tmin[i, 0] and tx.max() < tmax[i, 0], i
        assert ty.min() >= tmin[i, 1] and ty.max() < tmax[i, 1], i
        checked += 1
    assert checked > 50


def test_image_identical_with_and_without_culling():
    rng = np.random.default_rng(5)
    cam = make_camera()
    means, scales, quats, colors, opacities = make_gaussians(rng, 800)
    proj = project_gaussians(
        jnp.asarray(means), jnp.asarray(scales), 1.0, jnp.asarray(quats),
        jnp.asarray(cam["viewmat"]), jnp.asarray(cam["fullmat"]),
        cam["fx"], cam["fy"], cam["cx"], cam["cy"], cam["img_h"], cam["img_w"],
    )
    args = (
        proj.xys, proj.depths, proj.radii, proj.conics, proj.num_tiles_hit,
        jnp.asarray(colors), jnp.asarray(opacities),
    )
    kw = dict(img_height=cam["img_h"], img_width=cam["img_w"],
              background=jnp.zeros(3))
    img_t, a_t, info_t = rasterize(
        *args, **kw, return_info=True,
        config=RasterizeConfig(isect_capacity=1 << 15, backend="jax"),
    )
    img_o, a_o, info_o = rasterize(
        *args, **kw, return_info=True,
        config=RasterizeConfig(
            isect_capacity=1 << 15, backend="jax", tight_culling=False
        ),
    )
    assert int(info_t["num_intersects"]) < int(info_o["num_intersects"])
    # exact in exact arithmetic; in f32 the jax path's fixed-size chunks
    # regroup once zero-contribution entries vanish, which reorders the
    # per-chunk sums (measured max diff ~2e-7 — pure rounding)
    np.testing.assert_allclose(
        np.asarray(img_t), np.asarray(img_o), atol=2e-5, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(a_t), np.asarray(a_o), atol=2e-5, rtol=0
    )


def test_gradients_identical_with_and_without_culling():
    rng = np.random.default_rng(7)
    cam = make_camera()
    means, scales, quats, colors, opacities = make_gaussians(rng, 300)
    proj = project_gaussians(
        jnp.asarray(means), jnp.asarray(scales), 1.0, jnp.asarray(quats),
        jnp.asarray(cam["viewmat"]), jnp.asarray(cam["fullmat"]),
        cam["fx"], cam["fy"], cam["cx"], cam["cy"], cam["img_h"], cam["img_w"],
    )

    def loss(xys, conics, cols, ops, cfg):
        img, alpha = rasterize(
            xys, proj.depths, proj.radii, conics, proj.num_tiles_hit,
            cols, ops, img_height=cam["img_h"], img_width=cam["img_w"],
            background=jnp.zeros(3), config=cfg,
        )
        return jnp.sum(img * img) + jnp.sum(alpha)

    args = (proj.xys, proj.conics, jnp.asarray(colors), jnp.asarray(opacities))
    g_t = jax.grad(loss, argnums=(0, 1, 2, 3))(
        *args, RasterizeConfig(isect_capacity=1 << 15, backend="jax")
    )
    g_o = jax.grad(loss, argnums=(0, 1, 2, 3))(
        *args,
        RasterizeConfig(
            isect_capacity=1 << 15, backend="jax", tight_culling=False
        ),
    )
    for a, b in zip(g_t, g_o):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, rtol=1e-4, atol=1e-5 * max(1.0, np.abs(b).max())
        )
