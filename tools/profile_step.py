"""Profile the bench train step on the TPU and print a per-op time table.

Runs the exact bench.py operating point under ``jax.profiler.trace`` and
parses the captured ``.xplane.pb`` with xprof, aggregating TensorCore op
durations by HLO op name. This is the repo's answer to the reference's
chrome-trace profiler hook (gs_toolkit/utils/profiler.py:138-186) for
kernel-level attribution.

Usage:  python tools/profile_step.py [--steps 10] [--top 40]
Writes the raw trace under /tmp/gstk_trace (inspectable with xprof/TB).
"""

import argparse
import glob
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--top", type=int, default=45)
    ap.add_argument("--trace-dir", default="/tmp/gstk_trace")
    ap.add_argument("--res", type=int, default=int(os.environ.get("BENCH_RES", 800)))
    ap.add_argument("--n", type=int, default=int(os.environ.get("BENCH_N", 100_000)))
    ap.add_argument(
        "--parse-only", action="store_true",
        help="skip the TPU run; parse the newest xplane in --trace-dir",
    )
    ap.add_argument(
        "--render", action="store_true",
        help="profile the forward-only render path (tools/bench_render.py "
        "operating point) instead of the train step",
    )
    args = ap.parse_args()
    if args.parse_only:
        return parse_trace(args)

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gstk_tpu.core.cameras import Camera
    from gstk_tpu.core.gaussians import init_scene
    from gstk_tpu.models.vanilla import VanillaConfig
    from gstk_tpu.ops.rasterize import RasterizeConfig
    from gstk_tpu.train.optim import OptimizerConfig
    from gstk_tpu.train.step import init_train_state, make_train_step

    img_h = img_w = args.res
    n = args.n
    capacity = int(os.environ.get("BENCH_CAP", 1 << 17))
    isect_capacity = int(os.environ.get("BENCH_ISECT", 3 << 18))

    rng = np.random.default_rng(0)
    pts = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-9.0, -2.0, n)
    rgb = rng.uniform(0, 255, (n, 3)).astype(np.float32)
    scene = init_scene(jax.random.PRNGKey(0), capacity, (pts, rgb), sh_degree=3)
    tight = rng.uniform(-4.5, -2.5, (n, 3)).astype(np.float32)
    op = rng.uniform(0.3, 0.9, n)
    logit_op = np.log(op / (1.0 - op)).astype(np.float32)
    scene = scene._replace(
        scales=scene.scales.at[:n].set(jnp.asarray(tight)),
        opacities=scene.opacities.at[:n, 0].set(jnp.asarray(logit_op)),
    )
    c2w = np.eye(4)[:3].astype(np.float32)
    camera = Camera(
        fx=jnp.float32(1111.0), fy=jnp.float32(1111.0),
        cx=jnp.float32(img_w / 2), cy=jnp.float32(img_h / 2),
        c2w=jnp.asarray(c2w),
    )
    raster_cfg = RasterizeConfig(chunk_size=32, isect_capacity=isect_capacity)
    if args.render:
        from gstk_tpu.models.vanilla import render_scene

        render_fn = jax.jit(lambda s, c: render_scene(
            s, c, img_h, img_w, sh_degree=3, background=jnp.zeros(3),
            config=VanillaConfig(sh_degree=3), raster_config=raster_cfg,
        ))

        def run_once(_key):
            return render_fn(scene, camera)

        done = lambda out: out["rgb"]
    else:
        step_fn = jax.jit(
            make_train_step(
                VanillaConfig(sh_degree=3, background_color="black"),
                raster_cfg, OptimizerConfig(), img_h, img_w, sh_degree=3,
            )
        )
        state = init_train_state(scene)
        gt = jnp.asarray(
            rng.uniform(0, 1, (img_h, img_w, 3)).astype(np.float32)
        )

        def run_once(key):
            nonlocal state
            state, metrics = step_fn(state, camera, gt, key)
            return metrics

        done = lambda out: out["loss"]
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    jax.block_until_ready(done(run_once(key)))
    print(f"compile+warmup {time.time()-t0:.1f}s", file=sys.stderr)

    keys = [k for k in jax.random.split(key, args.steps)]
    jax.block_until_ready(keys)
    t0 = time.perf_counter()
    for i in range(args.steps):
        out = run_once(keys[i])
    jax.block_until_ready(done(out))
    dt = (time.perf_counter() - t0) / args.steps
    print(f"steady-state step: {dt*1e3:.2f} ms "
          f"({img_h*img_w/dt/1e6:.2f}M rays/s)")

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        for i in range(args.steps):
            out = run_once(keys[i])
        jax.block_until_ready(done(out))
    parse_trace(args)


def parse_trace(args):
    # Parse the xplane: aggregate TensorCore line events by name.
    paths = sorted(glob.glob(
        os.path.join(args.trace_dir, "**", "*.xplane.pb"), recursive=True
    ), key=os.path.getmtime)
    if not paths:
        print("no xplane captured", file=sys.stderr)
        return
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    agg = defaultdict(lambda: [0.0, 0])
    for plane in xs.planes:
        pname = plane.name
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        for line in plane.lines:
            lname = line.name
            if lname not in ("XLA Ops", "Async XLA Ops"):
                continue
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                agg[(pname, lname, name)][0] += ev.duration_ps / 1e9  # ms
                agg[(pname, lname, name)][1] += 1
    # pick the device plane line with the most total time (the op stream)
    by_line = defaultdict(float)
    for (pname, lname, name), (ms, cnt) in agg.items():
        by_line[(pname, lname)] += ms
    if not by_line:
        print("no device lines found; planes:", file=sys.stderr)
        for plane in xs.planes:
            print("  plane:", plane.name,
                  [l.name for l in plane.lines][:8], file=sys.stderr)
        return
    for key in sorted(by_line, key=by_line.get, reverse=True):
        print(f"-- line {key} total {by_line[key]:.2f} ms over "
              f"{args.steps} steps ({by_line[key]/args.steps:.2f} ms/step) --")
        rows = [
            (ms / args.steps, cnt / args.steps, name)
            for (pname, lname, name), (ms, cnt) in agg.items()
            if (pname, lname) == key
        ]
        rows.sort(reverse=True)
        print(f"{'ms/step':>9}  {'n/step':>6}  op")
        top = args.top if key[1] == "XLA Ops" else 12
        for ms, cnt, name in rows[:top]:
            print(f"{ms:9.3f}  {cnt:6.1f}  {name[:120]}")
        other = sum(r[0] for r in rows[top:])
        print(f"{other:9.3f}          (other {len(rows)-top} ops)")


if __name__ == "__main__":
    main()
