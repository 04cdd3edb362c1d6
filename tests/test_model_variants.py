"""co-gs (depth) and surface-gs model variants."""

import jax
import jax.numpy as jnp
import numpy as np

from gstk_tpu.models.depth import DepthConfig
from gstk_tpu.models.surface import SurfaceConfig
from gstk_tpu.models.vanilla import render_scene
from gstk_tpu.ops.rasterize import RasterizeConfig
from gstk_tpu.train.optim import OptimizerConfig
from gstk_tpu.train.step import init_train_state, make_train_step

from tests.test_train import _cameras, _gt_scene

H, W = 40, 56
RASTER = RasterizeConfig(chunk_size=16, isect_capacity=1 << 12)


def _setup(rng):
    gt_scene = _gt_scene(rng)
    cam = _cameras(1)[0]
    out = render_scene(
        gt_scene, cam, H, W, sh_degree=0,
        background=jnp.zeros(3), raster_config=RASTER,
    )
    return gt_scene, cam, out["rgb"], out["depth"]


def test_depth_model_sensor_l1(rng):
    gt_scene, cam, gt_rgb, gt_depth = _setup(rng)
    cfg = DepthConfig(
        background_color="black", sh_degree=0,
        use_depth_loss=True, depth_loss_start_iteration=0,
    )
    step_fn = jax.jit(
        make_train_step(cfg, RASTER, OptimizerConfig(), H, W, sh_degree=0)
    )
    state = init_train_state(gt_scene)
    state = state._replace(step=jnp.int32(10))  # inside depth window
    state2, metrics = step_fn(
        state, cam, gt_rgb, jax.random.PRNGKey(0), None, gt_depth
    )
    assert np.isfinite(float(metrics["loss"]))
    # means received gradient updates
    assert not np.allclose(
        np.asarray(state2.scene.means), np.asarray(state.scene.means)
    )


def test_depth_model_mono_losses(rng):
    gt_scene, cam, gt_rgb, gt_depth = _setup(rng)
    cfg = DepthConfig(
        background_color="black", sh_degree=0,
        use_depth_loss=True, depth_loss_start_iteration=0,
        use_est_depth=True, use_pearson_depth=True,
        use_scaled_est_depth=True, use_depth_regularization=True,
        using_tv_loss=True, using_planar_loss=True,
        planar_loss_start_iteration=0, local_patch_size=16,
    )
    step_fn = jax.jit(
        make_train_step(cfg, RASTER, OptimizerConfig(), H, W, sh_degree=0)
    )
    state = init_train_state(gt_scene)._replace(step=jnp.int32(100))
    state2, metrics = step_fn(
        state, cam, gt_rgb, jax.random.PRNGKey(0), None, gt_depth,
        jnp.float32(1.1), jnp.float32(0.05),
    )
    assert np.isfinite(float(metrics["loss"]))


def test_surface_model_freezes_means(rng):
    gt_scene, cam, gt_rgb, _ = _setup(rng)
    cfg = SurfaceConfig(background_color="black", sh_degree=0)
    step_fn = jax.jit(
        make_train_step(
            cfg, RASTER, OptimizerConfig(), H, W, sh_degree=0,
            frozen_groups=("means",),
        )
    )
    state = init_train_state(gt_scene)
    s = state
    for i in range(3):
        s, metrics = step_fn(s, cam, gt_rgb * 0.5, jax.random.PRNGKey(i))
    np.testing.assert_array_equal(
        np.asarray(s.scene.means), np.asarray(state.scene.means)
    )
    # but other params do move
    assert not np.allclose(
        np.asarray(s.scene.features_dc), np.asarray(state.scene.features_dc)
    )
