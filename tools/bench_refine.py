"""Device-truth cost of one refine() pass at training operating points.

Round-4 context: the candidate->slot scatter formulation ran 1-4 s per
refine at the 1M-capacity operating point (trainer profiler logs) and its
2^21-capacity compile OOM'd (12 GB (N,15,3) scatter temp). The rewrite
(train/strategy.py) is scatter-free: per-segment compaction + free-rank
prefix + parent gathers. This bench measures wall-clock steady state of
the jitted refine at growing capacities (dispatch overhead ~30-40 ms
through the tunnel dominates single calls; we time a batch).

Usage: python tools/bench_refine.py [--caps 1048576 2097152]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--caps", type=int, nargs="+",
                    default=[1 << 20, 1 << 21])
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gstk_tpu.core.gaussians import init_scene
    from gstk_tpu.models.vanilla import VanillaConfig
    from gstk_tpu.train.optim import init_adam
    from gstk_tpu.train.strategy import RefineState, refine

    cfg = VanillaConfig(warmup_length=0, refine_every=100,
                        reset_alpha_every=30)
    for cap in args.caps:
        n = int(cap * 0.9)
        rng = np.random.default_rng(0)
        pts = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
        rgb = rng.uniform(0, 255, (n, 3)).astype(np.float32)
        scene = init_scene(jax.random.PRNGKey(0), cap, (pts, rgb),
                           sh_degree=3)
        adam = init_adam(scene.params())
        rs = RefineState(
            xys_grad_norm=jnp.asarray(
                rng.uniform(0, 1e-3, cap).astype(np.float32)),
            vis_counts=jnp.ones((cap,), jnp.float32),
            max_2dsize=jnp.asarray(
                rng.uniform(0, 0.1, cap).astype(np.float32)),
        )
        fn = jax.jit(lambda s, a, r, k: refine(
            s, a, r, jnp.int32(5000), k, cfg, 200, 800))
        keys = jax.random.split(jax.random.PRNGKey(1), args.iters)
        out = fn(scene, adam, rs, keys[0])
        jax.block_until_ready(out[3]["num_alive"])
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = fn(scene, adam, rs, keys[i])
        jax.block_until_ready(out[3]["num_alive"])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"refine cap={cap}: {dt*1e3:.1f} ms "
              f"(split={int(out[3]['num_split'])} "
              f"dup={int(out[3]['num_dup'])} "
              f"cull={int(out[3]['num_cull'])})")


if __name__ == "__main__":
    main()
