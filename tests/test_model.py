"""GaussianScene + render_scene integration tests."""

import jax
import jax.numpy as jnp
import numpy as np

from gstk_tpu.core.cameras import Camera
from gstk_tpu.core.gaussians import GaussianScene, grow_scene, init_scene
from gstk_tpu.models.vanilla import VanillaConfig, render_scene
from gstk_tpu.ops.rasterize import RasterizeConfig

H, W = 48, 64


def _camera():
    c2w = np.eye(4)[:3].astype(np.float32)
    # OpenGL: camera looks along -z; put it at z=+5 looking toward origin.
    c2w[:3, 3] = [0, 0, 5.0]
    return Camera(
        fx=jnp.float32(60.0), fy=jnp.float32(60.0),
        cx=jnp.float32(W / 2), cy=jnp.float32(H / 2),
        c2w=jnp.asarray(c2w),
    )


def _scene(rng, n=200, capacity=256):
    pts = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    rgb = rng.uniform(0, 255, (n, 3)).astype(np.float32)
    return init_scene(jax.random.PRNGKey(0), capacity, (pts, rgb), sh_degree=3)


def test_init_scene(rng):
    scene = _scene(rng)
    assert scene.capacity == 256
    assert int(scene.num_alive) == 200
    assert scene.features_rest.shape == (256, 15, 3)
    # opacity init: sigmoid(logit(0.1)) == 0.1
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(scene.opacities[:200, 0])), 0.1, atol=1e-6
    )


def test_render_shapes_and_ranges(rng):
    scene = _scene(rng)
    cfg = RasterizeConfig(chunk_size=16, isect_capacity=1 << 13)
    out = render_scene(
        scene, _camera(), H, W, sh_degree=0,
        background=jnp.zeros(3), raster_config=cfg,
    )
    assert out["rgb"].shape == (H, W, 3)
    assert out["depth"].shape == (H, W)
    assert out["alpha"].shape == (H, W)
    rgb = np.asarray(out["rgb"])
    alpha = np.asarray(out["alpha"])
    assert np.all(np.isfinite(rgb)) and rgb.min() >= 0 and rgb.max() <= 1
    assert alpha.min() >= 0 and alpha.max() <= 1 + 1e-6
    assert alpha.max() > 0.3  # something rendered
    d = np.asarray(out["depth"])
    assert np.all(d > 0)  # camera at z=5 looking at points near origin


def test_dead_lanes_do_not_render(rng):
    scene = _scene(rng)
    cfg = RasterizeConfig(chunk_size=16, isect_capacity=1 << 13)
    out_full = render_scene(
        scene, _camera(), H, W, sh_degree=0,
        background=jnp.zeros(3), raster_config=cfg,
    )
    # Kill half the gaussians; the image must change, and corrupting dead
    # lanes' params must NOT change the output.
    alive2 = np.asarray(scene.alive).copy()
    alive2[:100] = False
    scene2 = scene._replace(alive=jnp.asarray(alive2))
    out_half = render_scene(
        scene2, _camera(), H, W, sh_degree=0,
        background=jnp.zeros(3), raster_config=cfg,
    )
    assert not np.allclose(np.asarray(out_full["rgb"]), np.asarray(out_half["rgb"]))

    corrupted = scene2._replace(
        means=scene2.means.at[:100].set(1e6),
        scales=scene2.scales.at[:100].set(30.0),
    )
    out_corrupt = render_scene(
        corrupted, _camera(), H, W, sh_degree=0,
        background=jnp.zeros(3), raster_config=cfg,
    )
    np.testing.assert_allclose(
        np.asarray(out_half["rgb"]), np.asarray(out_corrupt["rgb"]), atol=1e-6
    )


def test_grow_scene(rng):
    scene = _scene(rng, n=100, capacity=128)
    big = grow_scene(scene, 512)
    assert big.capacity == 512
    assert int(big.num_alive) == 100
    np.testing.assert_allclose(
        np.asarray(big.means[:128]), np.asarray(scene.means), atol=0
    )


def test_sh_degree_changes_output(rng):
    scene = _scene(rng)
    # give some non-trivial rest coefficients
    scene = scene._replace(
        features_rest=jnp.asarray(
            rng.normal(0, 0.3, scene.features_rest.shape).astype(np.float32)
        )
    )
    cfg = RasterizeConfig(chunk_size=16, isect_capacity=1 << 13)
    outs = [
        np.asarray(
            render_scene(
                scene, _camera(), H, W, sh_degree=d,
                background=jnp.zeros(3), raster_config=cfg,
            )["rgb"]
        )
        for d in (0, 3)
    ]
    assert not np.allclose(outs[0], outs[1])
