"""Render-only (forward) throughput at the bench operating point.

Context for the external fwd-only baseline (3DGS paper ~130 fps @1080p
on RTX 3090): this measures the full render path (projection + binning
+ fused RGB+depth compositing) without backward/Adam.
"""
import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from gstk_tpu.core.cameras import Camera
from gstk_tpu.core.gaussians import init_scene
from gstk_tpu.models.vanilla import VanillaConfig, render_scene
from gstk_tpu.ops.rasterize import RasterizeConfig

n = 100_000; cap = 104 * 1024; img = 800
rng = np.random.default_rng(0)
pts = rng.uniform(-3, 3, (cap, 3)).astype(np.float32)
pts[:, 2] = rng.uniform(-9.0, -2.0, cap)
rgb = rng.uniform(0, 255, (cap, 3)).astype(np.float32)
scene = init_scene(jax.random.PRNGKey(0), cap, (pts, rgb), sh_degree=3)
tight = rng.uniform(-4.5, -2.5, (cap, 3)).astype(np.float32)
op = rng.uniform(0.3, 0.9, cap)
scene = scene._replace(
    scales=scene.scales.at[:].set(jnp.asarray(tight)),
    opacities=scene.opacities.at[:, 0].set(jnp.asarray(np.log(op/(1-op)).astype(np.float32))))
cam = Camera(fx=jnp.float32(1111.0), fy=jnp.float32(1111.0),
             cx=jnp.float32(400.0), cy=jnp.float32(400.0),
             c2w=jnp.asarray(np.eye(4)[:3].astype(np.float32)))
import os

layouts = os.environ.get("BENCH_LAYOUTS", "auto").split(",")
for layout in layouts:
    for prec in ("exact", "high", "fast"):
        fn = jax.jit(lambda s, c, p=prec, la=layout: render_scene(
            s, c, img, img, sh_degree=3, background=jnp.zeros(3),
            config=VanillaConfig(sh_degree=3),
            raster_config=RasterizeConfig(
                chunk_size=32, isect_capacity=3 << 18, kernel_precision=p,
                attr_layout=la, forward_only=True)))
        out = jax.block_until_ready(fn(scene, cam))
        iters = 100
        # Distinct args per iteration: identical pending (executable, args)
        # dispatches through the tunneled runtime can collapse into one
        # execution and report ~0 ms/frame (observed r5; bench.py is
        # immune because its args change every step). A 1e-3 px cx jiggle
        # forces real executions without perturbing the workload.
        cams = [cam._replace(cx=jnp.float32(400.0 + 1e-3 * i))
                for i in range(iters)]
        jax.block_until_ready(cams)
        t0 = time.perf_counter()
        for i in range(iters):
            out = fn(scene, cams[i])
        jax.block_until_ready(out["rgb"])
        dt = (time.perf_counter() - t0) / iters
        tag = prec if layout == "auto" else f"{prec},{layout}"
        print(f"render-only[{tag}]: {dt*1e3:.2f} ms/frame = "
              f"{img*img/dt/1e6:.1f} M rays/s = {1/dt:.1f} fps "
              f"@800x800, 100k gaussians")
