"""End-to-end demo on a synthetic scene: train, eval, export, mesh.

Run: python examples/train_synthetic.py [--steps 300] [--out /tmp/gstk_demo]

Builds a random colored-point scene, renders ground-truth views with a
"teacher" scene, trains a fresh model on them, reports PSNR, and exports a
splat PLY — the whole framework exercised without any dataset on disk.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

# allow running from anywhere without installation
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--out", type=Path, default=Path("/tmp/gstk_demo"))
    parser.add_argument("--n-gaussians", type=int, default=2000)
    parser.add_argument("--res", type=int, default=128)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from gstk_tpu.core.cameras import Camera
    from gstk_tpu.core.gaussians import init_scene
    from gstk_tpu.exporter.gaussian_ply import export_gaussian_ply
    from gstk_tpu.models.vanilla import VanillaConfig, render_scene
    from gstk_tpu.ops.rasterize import RasterizeConfig
    from gstk_tpu.train.optim import OptimizerConfig
    from gstk_tpu.train.step import init_train_state, make_train_step

    H = W = args.res
    rng = np.random.default_rng(0)
    raster = RasterizeConfig(chunk_size=32, isect_capacity=1 << 17)

    # teacher scene
    pts = rng.uniform(-1.5, 1.5, (args.n_gaussians, 3)).astype(np.float32)
    rgb = rng.uniform(30, 225, (args.n_gaussians, 3)).astype(np.float32)
    teacher = init_scene(
        jax.random.PRNGKey(7), 1 << 12, (pts, rgb), sh_degree=0
    )
    teacher = teacher._replace(
        opacities=jnp.full_like(teacher.opacities, 1.5),
        scales=teacher.scales + 0.3,
    )

    def camera(angle):
        c, s = np.cos(angle), np.sin(angle)
        rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        c2w = np.zeros((3, 4), np.float32)
        c2w[:3, :3] = rot
        c2w[:3, 3] = rot @ np.array([0, 0, 5.0], np.float32)
        return Camera(
            fx=jnp.float32(W * 0.9), fy=jnp.float32(W * 0.9),
            cx=jnp.float32(W / 2), cy=jnp.float32(H / 2),
            c2w=jnp.asarray(c2w),
        )

    cams = [camera(a) for a in np.linspace(-0.5, 0.5, 8)]
    print("Rendering ground truth views...")
    gts = [
        render_scene(
            teacher, c, H, W, sh_degree=0,
            background=jnp.zeros(3), raster_config=raster,
        )["rgb"]
        for c in cams
    ]

    # student: same geometry, perturbed appearance
    student = teacher._replace(
        features_dc=teacher.features_dc
        + jnp.asarray(rng.normal(0, 1.5, teacher.features_dc.shape), jnp.float32),
        opacities=jnp.zeros_like(teacher.opacities),
    )
    cfg = VanillaConfig(background_color="black", sh_degree=0)
    step_fn = jax.jit(
        make_train_step(cfg, raster, OptimizerConfig(), H, W, sh_degree=0),
        donate_argnums=(0,),
    )
    state = init_train_state(student)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    for i in range(args.steps):
        key, k = jax.random.split(key)
        j = i % len(cams)
        state, metrics = step_fn(state, cams[j], gts[j], k)
        if i % 50 == 0 or i == args.steps - 1:
            print(
                f"step {i:4d}  loss {float(metrics['loss']):.4f}  "
                f"psnr {float(metrics['psnr']):.2f}"
            )
    dt = time.time() - t0
    print(f"{args.steps} steps in {dt:.1f}s "
          f"({args.steps * H * W / dt / 1e6:.2f} Mrays/s)")

    args.out.mkdir(parents=True, exist_ok=True)
    n = export_gaussian_ply(args.out / "trained.ply", state.scene)
    print(f"Exported {n} gaussians to {args.out / 'trained.ply'}")


if __name__ == "__main__":
    main()
