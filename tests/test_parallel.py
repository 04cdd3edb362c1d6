"""Data-parallel train step on a virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from gstk_tpu.core.gaussians import init_scene
from gstk_tpu.models.vanilla import VanillaConfig, render_scene
from gstk_tpu.ops.rasterize import RasterizeConfig
from gstk_tpu.parallel.mesh import DATA_AXIS, data_parallel_train_step, get_mesh
from gstk_tpu.train.optim import OptimizerConfig
from gstk_tpu.train.step import init_train_state, make_train_step

from tests.test_train import _cameras, _gt_scene

H, W = 40, 56
RASTER = RasterizeConfig(chunk_size=16, isect_capacity=1 << 12)


def _stack_cameras(cams):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)


def test_data_parallel_step_runs_and_matches_serial(rng):
    n_dev = min(4, jax.device_count())
    assert jax.device_count() >= 4, "conftest should provide 8 CPU devices"
    mesh = get_mesh(n_dev)

    gt_scene = _gt_scene(rng)
    cams = _cameras(n_dev)
    gt_imgs = jnp.stack(
        [
            render_scene(
                gt_scene, c, H, W, sh_degree=0,
                background=jnp.zeros(3), raster_config=RASTER,
            )["rgb"]
            for c in cams
        ]
    )
    start = gt_scene._replace(opacities=jnp.zeros_like(gt_scene.opacities))
    model_cfg = VanillaConfig(background_color="black", sh_degree=0)

    step_dp = make_train_step(
        model_cfg, RASTER, OptimizerConfig(), H, W, sh_degree=0,
        axis_name=DATA_AXIS,
    )
    wrapped = jax.jit(data_parallel_train_step(step_dp, mesh))

    state = init_train_state(start)
    keys = jnp.stack([jax.random.PRNGKey(5)] * n_dev)  # same background
    new_state, metrics = wrapped(state, _stack_cameras(cams), gt_imgs, keys)
    assert np.isfinite(float(metrics["loss"]))
    # Parameters changed
    assert not np.allclose(
        np.asarray(new_state.scene.means), np.asarray(state.scene.means)
    )

    # Serial equivalent: average gradients over the same 4 cameras == DP.
    # We verify DP vis_counts equal the sum of per-camera visibilities.
    step_1 = make_train_step(
        model_cfg, RASTER, OptimizerConfig(), H, W, sh_degree=0
    )
    vis_total = np.zeros(start.capacity, np.float32)
    for i in range(n_dev):
        s1 = init_train_state(start)
        s1b, _ = jax.jit(step_1)(s1, cams[i], gt_imgs[i], jax.random.PRNGKey(5))
        vis_total += np.asarray(s1b.refine.vis_counts)
    np.testing.assert_allclose(
        np.asarray(new_state.refine.vis_counts), vis_total, atol=0
    )


def test_dp_psnr_improves_over_steps(rng):
    n_dev = min(4, jax.device_count())
    mesh = get_mesh(n_dev)
    gt_scene = _gt_scene(rng)
    cams = _cameras(n_dev)
    gt_imgs = jnp.stack(
        [
            render_scene(
                gt_scene, c, H, W, sh_degree=0,
                background=jnp.zeros(3), raster_config=RASTER,
            )["rgb"]
            for c in cams
        ]
    )
    start = gt_scene._replace(
        features_dc=gt_scene.features_dc
        + jnp.asarray(rng.normal(0, 1.5, gt_scene.features_dc.shape), jnp.float32),
    )
    model_cfg = VanillaConfig(background_color="black", sh_degree=0)
    step_dp = make_train_step(
        model_cfg, RASTER, OptimizerConfig(), H, W, sh_degree=0,
        axis_name=DATA_AXIS,
    )
    wrapped = jax.jit(data_parallel_train_step(step_dp, mesh))
    state = init_train_state(start)
    cam_batch = _stack_cameras(cams)
    key = jax.random.PRNGKey(0)
    first = last = None
    for i in range(25):
        key, k = jax.random.split(key)
        keys = jax.random.split(k, n_dev)
        state, metrics = wrapped(state, cam_batch, gt_imgs, keys)
        if i == 0:
            first = float(metrics["psnr"])
        last = float(metrics["psnr"])
    assert last > first + 2.0, (first, last)


def test_gauss_sharded_render_matches_replicated(rng):
    """N-sharded projection + all-gather matches the single-device render."""
    import jax
    import jax.numpy as jnp

    from gstk_tpu.core.cameras import Camera
    from gstk_tpu.core.gaussians import init_scene
    from gstk_tpu.models.vanilla import VanillaConfig, render_scene
    from gstk_tpu.ops.rasterize import RasterizeConfig
    from gstk_tpu.parallel.gaussian_sharding import (
        make_gauss_mesh,
        render_scene_gauss_sharded,
        shard_scene,
    )

    H, W = 40, 56
    raster = RasterizeConfig(chunk_size=16, isect_capacity=1 << 13)
    pts = rng.uniform(-1.5, 1.5, (100, 3)).astype(np.float32)
    rgb = rng.uniform(0, 255, (100, 3)).astype(np.float32)
    scene = init_scene(jax.random.PRNGKey(0), 128, (pts, rgb), sh_degree=1)
    cam_c2w = np.zeros((3, 4), np.float32)
    cam_c2w[:3, :3] = np.eye(3)
    cam_c2w[:3, 3] = [0, 0, 4.0]
    cam = Camera(
        fx=jnp.float32(50.0), fy=jnp.float32(50.0),
        cx=jnp.float32(W / 2), cy=jnp.float32(H / 2),
        c2w=jnp.asarray(cam_c2w),
    )
    cfg = VanillaConfig(sh_degree=1)
    ref = render_scene(
        scene, cam, H, W, sh_degree=1, background=jnp.zeros(3),
        config=cfg, raster_config=raster,
    )
    mesh = make_gauss_mesh(8)
    sharded = shard_scene(scene, mesh)
    out = jax.jit(
        lambda s, c: render_scene_gauss_sharded(
            s, c, H, W, sh_degree=1, background=jnp.zeros(3), mesh=mesh,
            config=cfg, raster_config=raster,
        )
    )(sharded, cam)
    np.testing.assert_allclose(
        np.asarray(out["rgb"]), np.asarray(ref["rgb"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["alpha"]), np.asarray(ref["alpha"]), atol=1e-5
    )


def test_gauss_sharded_training_matches_replicated(rng):
    """The unchanged train step under GSPMD with capacity-sharded state
    produces bit-identical parameters to the replicated step."""
    import jax
    import jax.numpy as jnp

    from tests.test_train import _gt_scene, _cameras, H, W, RASTER
    from gstk_tpu.models.vanilla import VanillaConfig, render_scene
    from gstk_tpu.parallel.gaussian_sharding import (
        make_gauss_mesh,
        shard_train_state,
    )
    from gstk_tpu.train.optim import OptimizerConfig
    from gstk_tpu.train.step import init_train_state, make_train_step

    scene = _gt_scene(rng)
    cams = _cameras(2)
    cfg = VanillaConfig(background_color="black", sh_degree=0)
    gt = render_scene(
        scene, cams[0], H, W, sh_degree=0, config=cfg,
        background=jnp.zeros(3), raster_config=RASTER,
    )["rgb"]
    step = jax.jit(
        make_train_step(cfg, RASTER, OptimizerConfig(), H, W, sh_degree=0)
    )
    key = jax.random.PRNGKey(0)
    ref, ref_m = step(init_train_state(scene), cams[1], gt, key)

    mesh = make_gauss_mesh(8)
    sharded = shard_train_state(init_train_state(scene), mesh)
    out, m = step(sharded, cams[1], gt, key)
    assert float(m["loss"]) == float(ref_m["loss"])
    for k, v in ref.scene.params().items():
        np.testing.assert_array_equal(
            np.asarray(out.scene.params()[k]), np.asarray(v), err_msg=k
        )
    # state stays sharded across the step (no silent re-replication)
    assert "gauss" in str(out.scene.means.sharding)


def test_2d_mesh_dp_x_gauss_sharding(rng):
    """Camera data-parallelism (shard_map over 'data') composed with
    gaussian parameter sharding (GSPMD over 'gauss') on a 2x4 mesh matches
    the plain replicated data-parallel step."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tests.test_train import _gt_scene, _cameras, H, W, RASTER
    from gstk_tpu.models.vanilla import VanillaConfig, render_scene
    from gstk_tpu.train.optim import OptimizerConfig
    from gstk_tpu.train.step import init_train_state, make_train_step

    scene = _gt_scene(rng)
    start = scene._replace(
        features_dc=scene.features_dc
        + jnp.asarray(rng.normal(0, 1.0, scene.features_dc.shape), jnp.float32)
    )
    cams = _cameras(2)
    cfg = VanillaConfig(background_color="black", sh_degree=0)
    gts = jnp.stack([
        render_scene(
            scene, c, H, W, sh_degree=0, config=cfg,
            background=jnp.zeros(3), raster_config=RASTER,
        )["rgb"]
        for c in cams
    ])
    cameras = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    step = make_train_step(
        cfg, RASTER, OptimizerConfig(), H, W, sh_degree=0, axis_name="data"
    )

    def inner(state, cam, gt, key):
        cam = jax.tree.map(lambda x: x[0], cam)
        return step(state, cam, gt[0], key[0])

    def run(mesh, place_state):
        wrapped = jax.shard_map(
            inner, mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P("data")),
            out_specs=(P(), P()),
            check_vma=False,
            axis_names={"data"},
        )
        s0 = jax.tree.map(place_state, init_train_state(start))
        return jax.jit(wrapped)(s0, cameras, gts, keys)

    # reference: 1D data mesh, replicated params
    mesh1 = Mesh(np.asarray(jax.devices()[:2]), ("data",))
    rep = lambda x: jax.device_put(x, NamedSharding(mesh1, P()))
    ref_state, ref_m = run(mesh1, rep)

    # 2D: data x gauss, params sharded on 'gauss'
    mesh2 = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("data", "gauss"))
    cap = scene.capacity

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == cap:
            return jax.device_put(x, NamedSharding(mesh2, P("gauss")))
        return jax.device_put(x, NamedSharding(mesh2, P()))

    out_state, m = run(mesh2, place)
    np.testing.assert_allclose(
        float(m["loss"]), float(ref_m["loss"]), rtol=1e-6
    )
    for k, v in ref_state.scene.params().items():
        np.testing.assert_allclose(
            np.asarray(out_state.scene.params()[k]), np.asarray(v),
            atol=1e-6, err_msg=k,
        )
    assert "gauss" in str(out_state.scene.means.sharding)


def test_dp_threads_mono_depth_scale(rng):
    """ADVICE r1: under data parallelism a DepthConfig with
    use_scaled_est_depth must receive mono_scale/mono_shift through the
    shard_map wrapper — the scaled log-depth loss silently vanished before."""
    from gstk_tpu.models.depth import DepthConfig

    n_dev = 2
    mesh = get_mesh(n_dev)
    gt_scene = _gt_scene(rng)
    cams = _cameras(n_dev)
    gts, depths = [], []
    for c in cams:
        out = render_scene(
            gt_scene, c, H, W, sh_degree=0,
            background=jnp.zeros(3), raster_config=RASTER,
            config=VanillaConfig(),
        )
        gts.append(out["rgb"])
        depths.append(jnp.ones((H, W), jnp.float32))
    gts, depths = jnp.stack(gts), jnp.stack(depths)

    cfg = DepthConfig(
        background_color="black", sh_degree=0, use_est_depth=True,
        use_scaled_est_depth=True, depth_loss_start_iteration=0,
        mono_depth_l1_start_iteration=0,
    )
    step = make_train_step(
        cfg, RASTER, OptimizerConfig(), H, W, sh_degree=0,
        axis_name=DATA_AXIS,
    )
    wrapped = jax.jit(data_parallel_train_step(step, mesh))
    state = init_train_state(gt_scene)
    # step counter past the gates
    state = state._replace(step=jnp.int32(10))
    keys = jnp.stack([jax.random.PRNGKey(5)] * n_dev)
    mscales = jnp.asarray([2.0, 2.0], jnp.float32)
    mshifts = jnp.asarray([0.1, 0.1], jnp.float32)

    _, m_without = wrapped(
        state, _stack_cameras(cams), gts, keys, None, depths
    )
    _, m_with = wrapped(
        state, _stack_cameras(cams), gts, keys, None, depths,
        mono_scales=mscales, mono_shifts=mshifts,
    )
    # the scaled log-L1 term only enters when mono_scale is threaded through
    assert float(m_with["loss"]) != float(m_without["loss"])
