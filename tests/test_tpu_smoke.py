"""Real-TPU smoke tests (skipped on CPU; conftest pins tests to CPU, so these
run only via `JAX_PLATFORMS=tpu pytest tests/test_tpu_smoke.py` — handy for
validating the compiled Pallas path on hardware)."""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="requires a TPU device"
)


def test_pallas_raster_fwd_bwd_on_tpu():
    import jax.numpy as jnp

    from tests._scenes import make_camera, make_gaussians
    from gstk_tpu.ops.projection import project_gaussians
    from gstk_tpu.ops.rasterize import RasterizeConfig, rasterize

    rng = np.random.default_rng(0)
    cam = make_camera(img_w=128, img_h=96)
    means, scales, quats, colors, opacities = make_gaussians(rng, 2000)
    proj = project_gaussians(
        jnp.asarray(means), jnp.asarray(scales), 1.0, jnp.asarray(quats),
        jnp.asarray(cam["viewmat"]), jnp.asarray(cam["fullmat"]),
        cam["fx"], cam["fy"], cam["cx"], cam["cy"], cam["img_h"], cam["img_w"],
    )
    results = {}
    for backend in ("pallas", "jax"):
        cfg = RasterizeConfig(
            chunk_size=32, isect_capacity=1 << 15, backend=backend
        )

        def loss(xys, conics, cols, opac):
            img, alpha = rasterize(
                xys, proj.depths, proj.radii, conics, proj.num_tiles_hit,
                cols, opac, img_height=96, img_width=128,
                background=jnp.zeros(3), config=cfg,
            )
            return jnp.sum(img * 0.5) + jnp.sum(alpha), img

        (val, img), grads = jax.jit(
            jax.value_and_grad(loss, argnums=(0, 1, 2, 3), has_aux=True)
        )(proj.xys, proj.conics, jnp.asarray(colors), jnp.asarray(opacities))
        results[backend] = (float(val), np.asarray(img), grads)

    v_p, img_p, g_p = results["pallas"]
    v_j, img_j, g_j = results["jax"]
    np.testing.assert_allclose(img_p, img_j, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(v_p, v_j, rtol=1e-4)
    for a, b in zip(g_p, g_j):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, rtol=5e-3, atol=1e-3 * max(1.0, np.abs(b).max())
        )


def test_train_step_on_tpu():
    import jax.numpy as jnp

    from gstk_tpu.core.cameras import Camera
    from gstk_tpu.core.gaussians import init_scene
    from gstk_tpu.models.vanilla import VanillaConfig
    from gstk_tpu.ops.rasterize import RasterizeConfig
    from gstk_tpu.train.optim import OptimizerConfig
    from gstk_tpu.train.step import init_train_state, make_train_step

    rng = np.random.default_rng(0)
    pts = rng.uniform(-2, 2, (3000, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-8, -2, 3000)
    rgb = rng.uniform(0, 255, (3000, 3)).astype(np.float32)
    scene = init_scene(jax.random.PRNGKey(0), 4096, (pts, rgb), sh_degree=1)
    cam = Camera(
        fx=jnp.float32(150.0), fy=jnp.float32(150.0),
        cx=jnp.float32(64.0), cy=jnp.float32(64.0),
        c2w=jnp.asarray(np.eye(4)[:3].astype(np.float32)),
    )
    step = jax.jit(
        make_train_step(
            VanillaConfig(sh_degree=1, background_color="black"),
            RasterizeConfig(chunk_size=32, isect_capacity=1 << 16),
            OptimizerConfig(), 128, 128, sh_degree=1,
        )
    )
    state = init_train_state(scene)
    gt = jnp.zeros((128, 128, 3))
    state, metrics = step(state, cam, gt, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    state, metrics = step(state, cam, gt, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["psnr"]))
