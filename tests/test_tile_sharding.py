"""Tile-sharded rendering on the virtual CPU mesh == single-device result."""

import jax
import jax.numpy as jnp
import numpy as np

from gstk_tpu.ops.projection import project_gaussians
from gstk_tpu.ops.rasterize import RasterizeConfig, rasterize
from gstk_tpu.parallel.tile_sharding import make_tile_mesh, rasterize_tile_sharded

from tests._scenes import make_camera, make_gaussians


def test_tile_sharded_matches_single(rng):
    assert jax.device_count() >= 4
    cam = make_camera(img_w=128, img_h=64)
    means, scales, quats, colors, opacities = make_gaussians(rng, 300)
    proj = project_gaussians(
        jnp.asarray(means), jnp.asarray(scales), 1.0, jnp.asarray(quats),
        jnp.asarray(cam["viewmat"]), jnp.asarray(cam["fullmat"]),
        cam["fx"], cam["fy"], cam["cx"], cam["cy"], cam["img_h"], cam["img_w"],
    )
    cfg = RasterizeConfig(chunk_size=16, isect_capacity=1 << 13, backend="jax")
    bg = jnp.asarray([0.1, 0.2, 0.3])
    args = (
        proj.xys, proj.depths, proj.radii, proj.conics, proj.num_tiles_hit,
        jnp.asarray(colors), jnp.asarray(opacities),
    )
    ref_img, ref_alpha = rasterize(
        *args, img_height=64, img_width=128, background=bg, config=cfg
    )
    mesh = make_tile_mesh(4)
    img, alpha = rasterize_tile_sharded(
        *args, img_height=64, img_width=128, mesh=mesh, background=bg,
        config=cfg,
    )
    np.testing.assert_allclose(
        np.asarray(img), np.asarray(ref_img), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(alpha), np.asarray(ref_alpha), rtol=1e-5, atol=1e-6
    )
