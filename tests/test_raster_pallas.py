"""Pallas tile-compositing kernels vs the numpy oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gstk_tpu.ops.binning import bin_gaussians
from gstk_tpu.ops.oracle import rasterize_np
from gstk_tpu.ops.projection import project_gaussians
from gstk_tpu.ops.raster_pallas import (
    ATTR_W,
    CHUNK,
    composite_tiles_fwd,
)

from tests._scenes import make_camera, make_gaussians


def _prep(rng, n=300, img_w=64, img_h=48, opaque=False):
    cam = make_camera(img_w=img_w, img_h=img_h)
    means, scales, quats, colors, opacities = make_gaussians(rng, n)
    if opaque:
        opacities = np.full(n, 0.999, np.float32)
    proj = project_gaussians(
        jnp.asarray(means), jnp.asarray(scales), 1.0, jnp.asarray(quats),
        jnp.asarray(cam["viewmat"]), jnp.asarray(cam["fullmat"]),
        cam["fx"], cam["fy"], cam["cx"], cam["cy"], cam["img_h"], cam["img_w"],
    )
    tiles = ((img_w + 15) // 16, (img_h + 15) // 16)
    isect = bin_gaussians(
        proj.xys, proj.depths, proj.radii, proj.num_tiles_hit,
        tiles, 16, 1 << 13,
    )
    num_tiles = tiles[0] * tiles[1]
    # entry-major 128-lane (cap + CHUNK, ATTR_W) SORTED attribute layout
    # (unpadded ranges; boundary blocks are masked in-kernel)
    gids = jnp.concatenate(
        [isect.gaussian_ids, jnp.full((CHUNK,), n, jnp.int32)]
    )
    gid = jnp.minimum(gids, n - 1)
    attr = jnp.zeros((gids.shape[0], ATTR_W), jnp.float32)
    attr = attr.at[:, 0:2].set(proj.xys[gid])
    attr = attr.at[:, 2:5].set(proj.conics[gid])
    attr = attr.at[:, 5].set(jnp.asarray(opacities)[gid])
    attr = attr.at[:, 6:9].set(jnp.asarray(colors)[gid])
    real = (gids < n)[:, None]
    attr = jnp.where(real, attr, 0.0)
    return cam, proj, colors, opacities, tiles, isect, attr


def _untile(packed, tiles, img_h, img_w, ch):
    tiles_x, tiles_y = tiles
    img = np.asarray(packed)[:, 0:ch, :].transpose(0, 2, 1)
    img = img.reshape(tiles_y, tiles_x, 16, 16, ch)
    img = img.transpose(0, 2, 1, 3, 4).reshape(tiles_y * 16, tiles_x * 16, ch)
    t = np.asarray(packed)[:, ch, :]
    t = t.reshape(tiles_y, tiles_x, 16, 16).transpose(0, 2, 1, 3)
    t = t.reshape(tiles_y * 16, tiles_x * 16)
    return img[:img_h, :img_w], t[:img_h, :img_w]


@pytest.mark.parametrize("opaque", [False, True])
def test_pallas_fwd_matches_oracle(rng, opaque):
    cam, proj, colors, opacities, tiles, isect, attr = _prep(
        rng, opaque=opaque
    )
    packed = composite_tiles_fwd(
        attr, isect.tile_bins, tiles, 16, ch=3, interpret=True
    )
    img, final_t = _untile(packed, tiles, cam["img_h"], cam["img_w"], 3)

    from gstk_tpu.ops.oracle import bin_gaussians_np

    gids, _, bins = bin_gaussians_np(
        np.asarray(proj.xys), np.asarray(proj.depths), np.asarray(proj.radii),
        tiles, 16,
    )
    ref_img, ref_t = rasterize_np(
        cam["img_h"], cam["img_w"], gids, bins,
        np.asarray(proj.xys), np.asarray(proj.conics), colors, opacities,
        np.zeros(3, np.float32),
    )
    np.testing.assert_allclose(final_t, ref_t, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(img, ref_img, rtol=1e-3, atol=1e-4)


def test_pad_tile_ranges_invariants(rng):
    from gstk_tpu.ops.binning import pad_tile_ranges

    _, proj, _, _, tiles, isect, _ = _prep(rng)
    num_tiles = tiles[0] * tiles[1]
    padded = pad_tile_ranges(isect, num_tiles, CHUNK, sentinel=proj.xys.shape[0])
    bins = np.asarray(padded.tile_bins)
    assert np.all(bins[:, 0] % CHUNK == 0)
    counts_orig = np.asarray(isect.tile_bins[:, 1] - isect.tile_bins[:, 0])
    counts_new = bins[:, 1] - bins[:, 0]
    np.testing.assert_array_equal(counts_new, counts_orig)
    # entries preserved in order per tile
    n = proj.xys.shape[0]
    old_gids = np.asarray(isect.gaussian_ids)
    new_gids = np.asarray(padded.gaussian_ids)
    old_bins = np.asarray(isect.tile_bins)
    for t in range(len(bins)):
        np.testing.assert_array_equal(
            new_gids[bins[t, 0] : bins[t, 1]],
            old_gids[old_bins[t, 0] : old_bins[t, 1]],
        )


def test_transposed_attr_layout_parity(rng):
    """attr_layout='transposed' (the large-N attr-major table,
    RasterizeConfig.attr_layout) must match 'wide' exactly in image and
    gradients through the full custom-VJP path (interpret mode)."""
    from gstk_tpu.ops.rasterize import RasterizeConfig, rasterize

    cam = make_camera(img_w=64, img_h=48)
    means, scales, quats, colors, opacities = make_gaussians(rng, 300)
    proj = project_gaussians(
        jnp.asarray(means), jnp.asarray(scales), 1.0, jnp.asarray(quats),
        jnp.asarray(cam["viewmat"]), jnp.asarray(cam["fullmat"]),
        cam["fx"], cam["fy"], cam["cx"], cam["cy"], cam["img_h"], cam["img_w"],
    )
    results = {}
    for layout in ("wide", "transposed"):
        cfg = RasterizeConfig(
            isect_capacity=1 << 13, backend="pallas_interpret",
            attr_layout=layout,
        )

        def loss(xys, conics, cols, opac):
            img, alpha = rasterize(
                xys, proj.depths, proj.radii, conics, proj.num_tiles_hit,
                cols, opac, img_height=48, img_width=64,
                background=jnp.zeros(3), config=cfg,
            )
            return jnp.sum(img * 0.7) + jnp.sum(alpha * 0.3), img

        (val, img), grads = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3), has_aux=True
        )(proj.xys, proj.conics, jnp.asarray(colors), jnp.asarray(opacities))
        results[layout] = (float(val), np.asarray(img), grads)

    v_w, img_w_, g_w = results["wide"]
    v_t, img_t, g_t = results["transposed"]
    # identical math modulo the wide path's in-kernel arrival transpose
    # (a ~2^-21 3-term bf16 MXU reconstruction; the transposed layout is
    # exact f32) -> near-float-equality tolerances
    assert abs(v_w - v_t) <= 1e-4 * max(1.0, abs(v_w))
    np.testing.assert_allclose(img_t, img_w_, rtol=1e-4, atol=1e-5)
    for a, b in zip(g_t, g_w):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3,
            atol=1e-4 * max(1.0, float(np.abs(np.asarray(b)).max())),
        )
