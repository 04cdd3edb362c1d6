"""Pallas backward kernel vs the pure-JAX path (interpret mode on CPU).

The jax path's VJP is itself validated against naive autodiff
(test_rasterize.py), so agreement here gives transitive gradient parity.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gstk_tpu.ops.projection import project_gaussians
from gstk_tpu.ops.rasterize import RasterizeConfig, rasterize

from tests._scenes import make_camera, make_gaussians


def _setup(rng, n=120, img_w=64, img_h=48, opaque=False):
    cam = make_camera(img_w=img_w, img_h=img_h)
    means, scales, quats, colors, opacities = make_gaussians(rng, n)
    if opaque:
        opacities = np.full(n, 0.99, np.float32)
    proj = project_gaussians(
        jnp.asarray(means), jnp.asarray(scales), 1.0, jnp.asarray(quats),
        jnp.asarray(cam["viewmat"]), jnp.asarray(cam["fullmat"]),
        cam["fx"], cam["fy"], cam["cx"], cam["cy"], cam["img_h"], cam["img_w"],
    )
    return cam, proj, colors, opacities


def _loss(cam, proj, cfg, w_img, w_alpha):
    def loss(xys, conics, cols, opac, bg):
        img, alpha = rasterize(
            xys, proj.depths, proj.radii, conics, proj.num_tiles_hit,
            cols, opac, img_height=cam["img_h"], img_width=cam["img_w"],
            background=bg, config=cfg,
        )
        return jnp.sum(img * w_img) + jnp.sum(alpha * w_alpha), (img, alpha)

    return loss


@pytest.mark.parametrize("opaque", [False, True])
def test_pallas_grads_match_jax_path(rng, opaque):
    cam, proj, colors, opacities = _setup(rng, opaque=opaque)
    w_img = jnp.asarray(
        np.random.default_rng(1).normal(size=(cam["img_h"], cam["img_w"], 3))
    ).astype(jnp.float32)
    w_alpha = jnp.asarray(
        np.random.default_rng(2).normal(size=(cam["img_h"], cam["img_w"]))
    ).astype(jnp.float32)
    args = (
        proj.xys, proj.conics, jnp.asarray(colors), jnp.asarray(opacities),
        jnp.asarray([0.2, 0.4, 0.1], jnp.float32),
    )

    results = {}
    for backend in ("jax", "pallas_interpret"):
        cfg = RasterizeConfig(
            chunk_size=32, isect_capacity=1 << 13, backend=backend
        )
        loss = _loss(cam, proj, cfg, w_img, w_alpha)
        (val, (img, alpha)), grads = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3, 4), has_aux=True
        )(*args)
        results[backend] = (float(val), np.asarray(img), grads)

    v_jax, img_jax, g_jax = results["jax"]
    v_pal, img_pal, g_pal = results["pallas_interpret"]
    np.testing.assert_allclose(img_pal, img_jax, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(v_pal, v_jax, rtol=1e-4)
    for name, a, b in zip(
        ["xys", "conics", "colors", "opacities", "bg"], g_jax, g_pal
    ):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(b)), name
        np.testing.assert_allclose(
            b, a, rtol=2e-3, atol=1e-4 * max(1.0, np.abs(a).max()),
            err_msg=name,
        )
