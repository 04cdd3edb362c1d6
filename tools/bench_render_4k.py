"""4K banded-render capability benchmark: 3840x2160, 300k Gaussians,
~13.7M intersections through auto-banding (13 bands of <=2^20), fused
RGB+depth — hardware evidence that banding scales far past the 1080p
smoke test."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo/tests")
from _scenes import make_camera, make_gaussians
from gstk_tpu.ops.projection import project_gaussians
from gstk_tpu.ops.rasterize import RasterizeConfig, rasterize

W, H = 3840, 2160
rng = np.random.default_rng(3)
cam = make_camera(img_w=W, img_h=H)
means, scales, quats, colors, opacities = make_gaussians(rng, 300_000)
scales = (scales * 0.08).astype(np.float32)
proj = project_gaussians(
    jnp.asarray(means), jnp.asarray(scales), 1.0, jnp.asarray(quats),
    jnp.asarray(cam["viewmat"]), jnp.asarray(cam["fullmat"]),
    cam["fx"], cam["fy"], cam["cx"], cam["cy"], H, W)
total = int(np.asarray(jnp.sum(proj.num_tiles_hit)))
import os
prec = os.environ.get("BENCH_PRECISION", "exact")
cfg = RasterizeConfig(isect_capacity=1 << 20, backend="pallas", bands=0,
                      kernel_precision=prec, forward_only=True)
fn = jax.jit(lambda *a: rasterize(
    *a, img_height=H, img_width=W, background=jnp.zeros(4),
    config=cfg, return_info=True))
args = (proj.xys, proj.depths, proj.radii, proj.conics, proj.num_tiles_hit,
        jnp.concatenate([jnp.asarray(colors), proj.depths[:, None]], -1),
        jnp.asarray(opacities))
img, alpha, info = jax.block_until_ready(fn(*args))
assert np.isfinite(np.asarray(img)).all()
iters = 20
t0 = time.perf_counter()
for _ in range(iters):
    img, alpha, info = fn(*args)
jax.block_until_ready(img)
dt = (time.perf_counter() - t0) / iters
print(f"4K ({W}x{H}) banded render [{prec}]: total isects {total}, per-band max "
      f"{int(info['num_intersects'])}, {dt*1e3:.1f} ms/frame = "
      f"{1/dt:.1f} fps = {W*H/dt/1e6:.1f} M rays/s")
