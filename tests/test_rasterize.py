"""Rasterizer forward parity vs numpy oracle + VJP finite-difference checks.

This is the BASELINE.md north-star parity config in miniature: same compositing
semantics as the reference CUDA kernel (alpha clamp 0.999, 1/255 cutoff,
T<=1e-4 break), checked image-allclose and gradient-allclose.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gstk_tpu.ops.oracle import bin_gaussians_np, rasterize_np
from gstk_tpu.ops.projection import project_gaussians
from gstk_tpu.ops.rasterize import RasterizeConfig, rasterize

from tests._scenes import make_camera, make_gaussians


def _setup(rng, n=300, img_w=64, img_h=48):
    cam = make_camera(img_w=img_w, img_h=img_h)
    means, scales, quats, colors, opacities = make_gaussians(rng, n)
    proj = project_gaussians(
        jnp.asarray(means), jnp.asarray(scales), 1.0, jnp.asarray(quats),
        jnp.asarray(cam["viewmat"]), jnp.asarray(cam["fullmat"]),
        cam["fx"], cam["fy"], cam["cx"], cam["cy"], cam["img_h"], cam["img_w"],
    )
    return cam, proj, colors, opacities


@pytest.mark.parametrize("chunk", [7, 32])
def test_forward_matches_oracle(rng, chunk):
    cam, proj, colors, opacities = _setup(rng)
    background = np.array([0.1, 0.2, 0.3], np.float32)

    cfg = RasterizeConfig(chunk_size=chunk, isect_capacity=1 << 13)
    img, alpha = jax.jit(
        lambda *a: rasterize(
            *a, img_height=cam["img_h"], img_width=cam["img_w"],
            background=jnp.asarray(background), config=cfg,
        )
    )(
        proj.xys, proj.depths, proj.radii, proj.conics, proj.num_tiles_hit,
        jnp.asarray(colors), jnp.asarray(opacities),
    )

    tiles = ((cam["img_w"] + 15) // 16, (cam["img_h"] + 15) // 16)
    gids, _, bins = bin_gaussians_np(
        np.asarray(proj.xys), np.asarray(proj.depths), np.asarray(proj.radii),
        tiles, 16,
    )
    ref_img, ref_t = rasterize_np(
        cam["img_h"], cam["img_w"], gids, bins,
        np.asarray(proj.xys), np.asarray(proj.conics), colors, opacities,
        background,
    )
    np.testing.assert_allclose(np.asarray(img), ref_img, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(alpha), 1.0 - ref_t, rtol=1e-4, atol=1e-4)


def test_saturated_scene_early_exit(rng):
    """Opaque wall of Gaussians: alpha ~1 everywhere, loop must terminate."""
    cam, proj, colors, _ = _setup(rng, n=400)
    opacities = np.full(400, 0.999, np.float32)
    cfg = RasterizeConfig(chunk_size=16, isect_capacity=1 << 13)
    img, alpha = rasterize(
        proj.xys, proj.depths, proj.radii, proj.conics, proj.num_tiles_hit,
        jnp.asarray(colors), jnp.asarray(opacities),
        img_height=cam["img_h"], img_width=cam["img_w"],
        background=jnp.zeros(3), config=cfg,
    )
    assert np.all(np.isfinite(np.asarray(img)))
    assert float(jnp.max(alpha)) <= 1.0 + 1e-6


def test_empty_scene_is_background(rng):
    cam = make_camera()
    n = 8
    cfg = RasterizeConfig(isect_capacity=256)
    bg = jnp.asarray([0.25, 0.5, 0.75])
    img, alpha = rasterize(
        jnp.zeros((n, 2)), jnp.zeros((n,)), jnp.zeros((n,), jnp.int32),
        jnp.zeros((n, 3)), jnp.zeros((n,), jnp.int32),
        jnp.zeros((n, 3)), jnp.zeros((n,)),
        img_height=cam["img_h"], img_width=cam["img_w"],
        background=bg, config=cfg,
    )
    np.testing.assert_allclose(
        np.asarray(img), np.broadcast_to(np.asarray(bg), (48, 64, 3)), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(alpha), 0.0, atol=1e-6)


def _loss_fn(cam, proj_nd, cfg, weights):
    """Scalar loss over image+alpha as a function of rasterizer inputs."""
    w_img, w_alpha = weights

    def loss(xys, conics, colors, opacities, background):
        img, alpha = rasterize(
            xys, proj_nd["depths"], proj_nd["radii"], conics,
            proj_nd["num_tiles_hit"], colors, opacities,
            img_height=cam["img_h"], img_width=cam["img_w"],
            background=background, config=cfg,
        )
        return jnp.sum(img * w_img) + jnp.sum(alpha * w_alpha)

    return loss


@pytest.mark.parametrize("chunk", [8, 32])
def test_vjp_matches_naive_autodiff(rng, chunk):
    """Custom VJP vs plain autodiff of a naive differentiable re-implementation
    with identical (stop-gradient) mask semantics. This is the strong gradient
    parity check; finite differences can't be used blindly here because the
    CUDA-semantics thresholds (1/255 alpha cutoff, 1e-4 T break) are treated
    as non-differentiable, exactly like the reference backward kernel."""
    from tests._naive_diff import composite_naive
    from gstk_tpu.ops.oracle import bin_gaussians_np

    cam, proj, colors, opacities = _setup(rng, n=60, img_w=48, img_h=32)
    cfg = RasterizeConfig(chunk_size=chunk, isect_capacity=1 << 12)
    proj_nd = dict(
        depths=proj.depths, radii=proj.radii, num_tiles_hit=proj.num_tiles_hit
    )
    w_img = jnp.asarray(
        np.random.default_rng(1).normal(size=(cam["img_h"], cam["img_w"], 3))
    ).astype(jnp.float32)
    w_alpha = jnp.asarray(
        np.random.default_rng(2).normal(size=(cam["img_h"], cam["img_w"]))
    ).astype(jnp.float32)
    loss = _loss_fn(cam, proj_nd, cfg, (w_img, w_alpha))

    tiles = ((cam["img_w"] + 15) // 16, (cam["img_h"] + 15) // 16)
    gids, _, bins = bin_gaussians_np(
        np.asarray(proj.xys), np.asarray(proj.depths), np.asarray(proj.radii),
        tiles, 16,
    )
    gids_j, bins_j = jnp.asarray(gids), jnp.asarray(bins)

    def loss_naive(xys, conics, cols, opac, bg):
        img, alpha = composite_naive(
            xys, conics, cols, opac, gids_j, bins_j,
            cam["img_h"], cam["img_w"], bg,
        )
        return jnp.sum(img * w_img) + jnp.sum(alpha * w_alpha)

    args = (
        jnp.asarray(proj.xys), jnp.asarray(proj.conics),
        jnp.asarray(colors), jnp.asarray(opacities),
        jnp.asarray([0.3, 0.1, 0.2], jnp.float32),
    )
    assert np.allclose(float(loss(*args)), float(loss_naive(*args)), rtol=1e-5)
    grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))(*args)
    grads_ref = jax.grad(loss_naive, argnums=(0, 1, 2, 3, 4))(*args)
    for name, g, gr in zip(["xys", "conics", "colors", "opac", "bg"], grads, grads_ref):
        g, gr = np.asarray(g), np.asarray(gr)
        assert np.all(np.isfinite(g)), name
        np.testing.assert_allclose(
            g, gr, rtol=1e-3, atol=1e-4 * max(1.0, np.abs(gr).max()),
            err_msg=name,
        )


def test_vjp_colors_bg_match_fd(rng):
    """Central-difference check on args that don't interact with thresholds."""
    cam, proj, colors, opacities = _setup(rng, n=40, img_w=48, img_h=32)
    cfg = RasterizeConfig(chunk_size=16, isect_capacity=1 << 12)
    proj_nd = dict(
        depths=proj.depths, radii=proj.radii, num_tiles_hit=proj.num_tiles_hit
    )
    w_img = jnp.ones((cam["img_h"], cam["img_w"], 3))
    w_alpha = jnp.zeros((cam["img_h"], cam["img_w"]))
    loss = jax.jit(_loss_fn(cam, proj_nd, cfg, (w_img, w_alpha)))
    args = [
        jnp.asarray(proj.xys), jnp.asarray(proj.conics),
        jnp.asarray(colors), jnp.asarray(opacities),
        jnp.asarray([0.3, 0.1, 0.2], jnp.float32),
    ]
    grads = jax.jit(jax.grad(loss, argnums=(2, 4)))(*args)
    for ai, g in zip([2, 4], grads):
        arr = np.asarray(args[ai])
        g = np.asarray(g)
        order = np.argsort(-np.abs(g).reshape(-1))[:5]
        for idx in order:
            eps = 1e-2
            fp = arr.reshape(-1).copy(); fp[idx] += eps
            fm = arr.reshape(-1).copy(); fm[idx] -= eps
            ap = args.copy(); ap[ai] = jnp.asarray(fp.reshape(arr.shape))
            am = args.copy(); am[ai] = jnp.asarray(fm.reshape(arr.shape))
            fd = (float(loss(*ap)) - float(loss(*am))) / (2 * eps)
            np.testing.assert_allclose(
                g.reshape(-1)[idx], fd, rtol=1e-3, atol=1e-4,
                err_msg=f"arg {ai} flat index {idx}",
            )


def test_grads_chunk_invariant(rng):
    """Gradients must not depend on the chunking of the compositing loop."""
    cam, proj, colors, opacities = _setup(rng, n=80, img_w=48, img_h=32)
    proj_nd = dict(
        depths=proj.depths, radii=proj.radii, num_tiles_hit=proj.num_tiles_hit
    )
    w_img = jnp.ones((cam["img_h"], cam["img_w"], 3))
    w_alpha = jnp.ones((cam["img_h"], cam["img_w"]))
    args = (
        jnp.asarray(proj.xys), jnp.asarray(proj.conics),
        jnp.asarray(colors), jnp.asarray(opacities), jnp.zeros(3),
    )
    gs = []
    for chunk in (5, 32):
        cfg = RasterizeConfig(chunk_size=chunk, isect_capacity=1 << 12)
        loss = _loss_fn(cam, proj_nd, cfg, (w_img, w_alpha))
        gs.append(jax.grad(loss, argnums=(0, 1, 2, 3))(*args))
    for a, b in zip(gs[0], gs[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_nd_channels_fall_back_to_jax_path(rng):
    """>7-channel rasterization (the reference's ND kernel path,
    rasterize.py:145-148) routes to the portable compositing loop even when
    the pallas backend is requested."""
    import jax


    cam = make_camera(img_w=48, img_h=32)
    means, scales, quats, _, opac = make_gaussians(rng, n=60)
    colors = rng.uniform(0, 1, (60, 10)).astype(np.float32)
    proj = project_gaussians(
        jnp.asarray(means), jnp.asarray(scales), 1.0, jnp.asarray(quats),
        jnp.asarray(cam["viewmat"]), jnp.asarray(cam["fullmat"]),
        cam["fx"], cam["fy"], cam["cx"], cam["cy"], 32, 48,
    )
    cfg = RasterizeConfig(
        chunk_size=16, isect_capacity=1 << 12, backend="pallas_interpret"
    )
    img, alpha = rasterize(
        proj.xys, proj.depths, proj.radii, proj.conics, proj.num_tiles_hit,
        jnp.asarray(colors), jax.nn.sigmoid(jnp.zeros(60) + 2.0), 32, 48,
        config=cfg,
    )
    assert img.shape == (32, 48, 10)
    assert np.all(np.isfinite(np.asarray(img)))
    assert float(jnp.max(alpha)) > 0.1


@pytest.mark.parametrize(
    "precision,max_tol,mean_tol", [("high", 2e-2, 1e-3), ("fast", 2e-2, 1e-3)]
)
def test_render_precision_modes(rng, precision, max_tol, mean_tol):
    """Render-only kernel precision modes stay close to exact. Worst-pixel
    deviation is dominated by benign 1/255-cutoff inclusion flips (the
    flipped entry contributes <= alpha_cutoff * weight); MEAN deviation is
    the quality metric and stays below 8-bit output quantization."""
    cam, proj, colors, opacities = _setup(rng)
    args = (
        proj.xys, proj.depths, proj.radii, proj.conics, proj.num_tiles_hit,
        jnp.asarray(colors), jnp.asarray(opacities),
    )
    kw = dict(img_height=cam["img_h"], img_width=cam["img_w"])
    base = RasterizeConfig(isect_capacity=1 << 13, backend="pallas_interpret")
    img0, a0 = rasterize(*args, **kw, config=base)
    cfg = dataclasses.replace(base, kernel_precision=precision)
    img1, a1 = rasterize(*args, **kw, config=cfg)
    assert float(jnp.max(jnp.abs(img1 - img0))) < max_tol
    assert float(jnp.mean(jnp.abs(img1 - img0))) < mean_tol
    assert float(jnp.mean(jnp.abs(a1 - a0))) < mean_tol


def test_nonexact_precision_refuses_grad(rng):
    cam, proj, colors, opacities = _setup(rng)
    cfg = RasterizeConfig(
        isect_capacity=1 << 13, backend="pallas_interpret",
        kernel_precision="fast",
    )

    def loss(op):
        img, _ = rasterize(
            proj.xys, proj.depths, proj.radii, proj.conics,
            proj.num_tiles_hit, jnp.asarray(colors), op,
            img_height=cam["img_h"], img_width=cam["img_w"], config=cfg,
        )
        return jnp.sum(img)

    with pytest.raises(ValueError, match="render-only"):
        jax.grad(loss)(jnp.asarray(opacities))


def test_reorder_pack8_bitexact_vs_col(rng, monkeypatch):
    """The r5 8-pack backward reorder (fast-path row gather + lane-group
    select) must be BIT-identical to the attr-major column gather it
    replaces — it is pure data movement with a 0/1 select."""
    import importlib

    rmod = importlib.import_module('gstk_tpu.ops.rasterize')

    cam, proj, colors, opacities = _setup(rng, n=400)
    cfg = RasterizeConfig(
        isect_capacity=1 << 13, backend="pallas_interpret", chunk_size=16
    )

    def grads(use_pack8):
        monkeypatch.setattr(rmod, "_REORDER_PACK8", use_pack8)

        def loss(xys, conics, cols, op):
            img, alpha = rasterize(
                xys, proj.depths, proj.radii, conics, proj.num_tiles_hit,
                cols, op, img_height=cam["img_h"], img_width=cam["img_w"],
                config=cfg,
            )
            return jnp.sum(img * img) + jnp.sum(alpha)

        return jax.grad(loss, argnums=(0, 1, 2, 3))(
            proj.xys, proj.conics, jnp.asarray(colors),
            jnp.asarray(opacities),
        )

    g8 = grads(True)
    gc = grads(False)
    for a, b in zip(g8, gc):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_forward_only_matches_and_refuses_grad(rng):
    """forward_only drops backward-only sort payloads: images identical,
    differentiation refuses loudly."""
    cam, proj, colors, opacities = _setup(rng)
    args = (
        proj.xys, proj.depths, proj.radii, proj.conics, proj.num_tiles_hit,
        jnp.asarray(colors), jnp.asarray(opacities),
    )
    kw = dict(img_height=cam["img_h"], img_width=cam["img_w"])
    base = RasterizeConfig(isect_capacity=1 << 13, backend="pallas_interpret")
    cfg = dataclasses.replace(base, forward_only=True)
    img0, a0 = rasterize(*args, **kw, config=base)
    img1, a1 = rasterize(*args, **kw, config=cfg)
    np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))

    def loss(op):
        img, _ = rasterize(*args[:-1], op, **kw, config=cfg)
        return jnp.sum(img)

    with pytest.raises(ValueError, match="forward_only"):
        jax.grad(loss)(jnp.asarray(opacities))
