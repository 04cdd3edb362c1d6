"""Multi-band rasterization: bands > 1 must match the single-band result
exactly (same per-band binning/compositing semantics, stitched), including
gradients — the scale-out path past the 2^20 sort ceiling."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gstk_tpu.ops.projection import project_gaussians
from gstk_tpu.ops.rasterize import RasterizeConfig, rasterize

from tests._scenes import make_camera, make_gaussians


@pytest.mark.parametrize("backend", ["jax", "pallas_interpret"])
def test_bands_match_single(rng, backend):
    cam = make_camera(img_w=64, img_h=96)
    means, scales, quats, colors, opacities = make_gaussians(rng, 150)
    proj = project_gaussians(
        jnp.asarray(means), jnp.asarray(scales), 1.0, jnp.asarray(quats),
        jnp.asarray(cam["viewmat"]), jnp.asarray(cam["fullmat"]),
        cam["fx"], cam["fy"], cam["cx"], cam["cy"], cam["img_h"], cam["img_w"],
    )
    w_img = jnp.asarray(
        np.random.default_rng(1).normal(size=(96, 64, 3)).astype(np.float32)
    )

    def run(bands):
        cfg = RasterizeConfig(
            chunk_size=16, isect_capacity=1 << 12, backend=backend,
            bands=bands,
        )

        def loss(xys, conics, cols, opac):
            img, alpha = rasterize(
                xys, proj.depths, proj.radii, conics, proj.num_tiles_hit,
                cols, opac, img_height=96, img_width=64,
                background=jnp.asarray([0.3, 0.1, 0.2]), config=cfg,
            )
            return jnp.sum(img * w_img) + 0.5 * jnp.sum(alpha), (img, alpha)

        (val, (img, alpha)), grads = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3), has_aux=True
        )(proj.xys, proj.conics, jnp.asarray(colors), jnp.asarray(opacities))
        return val, img, alpha, grads

    v1, img1, a1, g1 = run(1)
    v3, img3, a3, g3 = run(3)
    np.testing.assert_allclose(np.asarray(img3), np.asarray(img1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a3), np.asarray(a1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(v3), float(v1), rtol=1e-5)
    # gradient tolerance matches test_raster_pallas_bwd: the bf16
    # multi-pass kernel grads carry ~2^-16 relative noise and band
    # splitting changes summation order
    for a, b in zip(g3, g1):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, rtol=2e-3, atol=1e-4 * max(1.0, np.abs(b).max())
        )


def test_bands_auto_selects_multiple():
    cfg = RasterizeConfig(bands=0)
    # auto banding kicks in via rasterize() internals; just check the rule
    assert max(1, -(-1920 * 1080 // 640_000)) == 4
    assert cfg.bands == 0


def test_band_capacity_covers_dense_scene(rng):
    """A scene whose intersections overflow a tiny capacity in one band
    fits when split across bands (per-band budget)."""
    cam = make_camera(img_w=64, img_h=96)
    means, scales, quats, colors, opacities = make_gaussians(rng, 400)
    scales = (scales * 3.0).astype(np.float32)  # fat splats -> many isects
    proj = project_gaussians(
        jnp.asarray(means), jnp.asarray(scales), 1.0, jnp.asarray(quats),
        jnp.asarray(cam["viewmat"]), jnp.asarray(cam["fullmat"]),
        cam["fx"], cam["fy"], cam["cx"], cam["cy"], cam["img_h"], cam["img_w"],
    )
    total = int(jnp.sum(proj.num_tiles_hit))
    cap = 1 << 11
    assert total > cap, "scene not dense enough for the test"

    def render(bands, capacity):
        cfg = RasterizeConfig(
            chunk_size=16, isect_capacity=capacity, backend="jax",
            bands=bands,
        )
        img, alpha, info = rasterize(
            proj.xys, proj.depths, proj.radii, proj.conics,
            proj.num_tiles_hit, jnp.asarray(colors), jnp.asarray(opacities),
            img_height=96, img_width=64, config=cfg, return_info=True,
        )
        return img, int(info["num_intersects"])

    ref, _ = render(1, 1 << 14)  # big enough single-band reference
    img6, per_band = render(6, cap)
    assert per_band <= cap
    np.testing.assert_allclose(np.asarray(img6), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
