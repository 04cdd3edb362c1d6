"""Standalone timing for the Pallas compositing kernels at the bench
operating point (800x800, ~100k Gaussians, ~0.9M intersections).

Builds the same scene as bench.py, runs projection+binning+pack once, then
times composite_tiles_fwd / composite_tiles_bwd in isolation under the
profiler so kernel changes can be iterated without recompiling the whole
train step.

Usage: python tools/bench_kernels.py [--iters 10]
"""

import argparse
import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _device_kernel_ms(tdir, iters):
    """Per-iteration device ms for the two kernels from the newest trace
    in ``tdir`` (wall clock through the tunnel is untrustworthy)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(tdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    agg = defaultdict(float)
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                nm = plane.event_metadata[ev.metadata_id].name
                key = "fwd" if "composite_tiles_fwd" in nm else (
                    "bwd" if "composite_tiles_bwd" in nm else None)
                if key:
                    agg[key] += ev.duration_ps / 1e9
    return agg["fwd"] / iters, agg["bwd"] / iters


def sweep(iters: int):
    """Fixed-vs-marginal kernel cost: time the kernels over (T tiles, C
    chunks/tile) combos with T*C held constant, fit time = T*X + T*C*Y.

    Per-tile fixed cost X is the current kernel frontier (~1.7 us inferred
    from step traces, docs/PERFORMANCE.md): loop entry/exit, scalar bin
    reads, out-block writes, first-chunk semaphore round trip. The scene
    here is synthetic: every entry is a huge low-opacity splat centered on
    its tile, so every chunk composites fully (no early exit, no boundary
    masking noise)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from gstk_tpu.ops import raster_pallas as rp

    ch = 4
    total_chunks = 2048
    results = []
    for c_per_tile in (1, 2, 4, 8, 16):
        t_tiles = total_chunks // c_per_tile
        cap = total_chunks * 128
        rng = np.random.default_rng(0)
        attr = np.zeros((cap + 128, rp.ATTR_W), np.float32)
        # entry e belongs to tile e // (c*128); tiles form one row
        tile_of = np.arange(cap) // (c_per_tile * 128)
        attr[:cap, 0] = tile_of * 16 + 8.0  # x at tile center
        attr[:cap, 1] = 8.0
        attr[:cap, 2] = 1e-4  # conic: huge splat, alpha ~ op everywhere
        attr[:cap, 4] = 1e-4
        # opacity just over the 1/255 cutoff: every entry composites
        # (outputs are verifiably nonzero) and T reaches the 1e-4 break
        # only after ~2300 entries — past the largest C here, so no tile
        # early-exits and every chunk runs its full math
        attr[:cap, 5] = 0.004
        attr[:cap, 6:10] = rng.uniform(0, 1, (cap, 4))
        bins = np.stack(
            [np.arange(t_tiles) * c_per_tile * 128,
             (np.arange(t_tiles) + 1) * c_per_tile * 128], axis=-1
        ).astype(np.int32)
        tiles = (t_tiles, 1)
        # production wide path is the bf16 3-plane table (BENCH_BF16=0
        # reverts to the f32 layout for A/B)
        if os.environ.get("BENCH_BF16", "1") == "1":
            attr_j = jax.jit(rp.split3_bf16_table)(
                jnp.asarray(attr[:, : rp.attr_rows(ch)])
            )
        else:
            attr_j = jnp.asarray(attr)
        bins_j = jnp.asarray(bins)
        fwd = lambda a, b: rp.composite_tiles_fwd(a, b, tiles, 16, ch=ch)
        packed = jax.block_until_ready(fwd(attr_j, bins_j))
        ct = jnp.ones_like(packed)
        bwd = lambda: rp.composite_tiles_bwd(
            attr_j, bins_j, packed, ct, tiles, 16, ch=ch)
        jax.block_until_ready(bwd())
        # device truth from the profiler trace (wall clock through the
        # tunnel mismeasures small programs — the round-2 "C=1 anomaly"
        # was exactly this, see below)
        tdir = f"/tmp/gstk_sweep_{t_tiles}_{c_per_tile}"
        os.makedirs(tdir, exist_ok=True)
        t0 = time.perf_counter()
        with jax.profiler.trace(tdir):
            outs = None
            for _ in range(iters):
                outs = (fwd(attr_j, bins_j), bwd())
            jax.block_until_ready(outs)
        wall = (time.perf_counter() - t0) / iters * 1e3
        f_ms, b_ms = _device_kernel_ms(tdir, iters)
        acc = float(jnp.sum(jnp.abs(packed[:, 0:4, :])))
        print(f"T={t_tiles:5d} C={c_per_tile:3d}: fwd {f_ms:7.3f} ms "
              f"bwd {b_ms:7.3f} ms   (fwd+bwd wall {wall:7.3f}; "
              f"|acc|={acc:.3e}, must be >0)")
        results.append((t_tiles, c_per_tile, f_ms, b_ms))

    # All rows including C=1 enter the fit now that times are device
    # truth. The round-2 "C=1 anomaly" (wall clock ~100x below any
    # DMA+compute bound) was a measurement artifact of timing async
    # dispatches through the tunneled runtime with wall clock; the
    # profiler's per-op device durations are sane at every C (see
    # docs/PERFORMANCE.md "C=1 anomaly resolved"). Interpret-mode parity
    # separately confirmed C=1 outputs are numerically correct.
    rows = results
    a = np.array([[t, t * c] for t, c, _, _ in rows], np.float64)
    for name, col in (("fwd", 2), ("bwd", 3)):
        y = np.array([r[col] for r in rows]) * 1e3  # us
        (x_fix, y_marg), *_ = np.linalg.lstsq(a, y, rcond=None)
        print(f"{name}: per-tile fixed {x_fix:.3f} us, "
              f"per-chunk marginal {y_marg:.3f} us  (all rows, device truth)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--sweep", action="store_true",
                    help="fixed-vs-marginal cost sweep over (tiles, chunks)")
    args = ap.parse_args()
    if args.sweep:
        # small per-call device times: enough iters to swamp the ~30-40 ms
        # dispatch RTT of the tunneled runtime
        sweep(max(args.iters, 50))
        return

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gstk_tpu.core.cameras import Camera
    from gstk_tpu.ops import raster_pallas as rp
    from gstk_tpu.ops.binning import bin_gaussians
    from gstk_tpu.ops.projection import project_gaussians

    img_h = img_w = 800
    n = 100_000
    cap_n = 1 << 17
    isect_cap = 1 << 20
    ch = 4

    rng = np.random.default_rng(0)
    # camera at origin looking along +z in view space: the projection path
    # culls z <= near, so place points at positive view depth
    pts = rng.uniform(-3, 3, (cap_n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(2.0, 9.0, cap_n)
    scales = np.exp(rng.uniform(-4.5, -2.5, (cap_n, 3)).astype(np.float32))
    quats = rng.normal(size=(cap_n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    op = rng.uniform(0.3, 0.9, cap_n).astype(np.float32)
    colors = rng.uniform(0, 1, (cap_n, ch)).astype(np.float32)
    alive = np.arange(cap_n) < n
    op = np.where(alive, op, 0.0).astype(np.float32)

    viewmat = np.eye(4, dtype=np.float32)
    fx = fy = 1111.0
    cx, cy = img_w / 2, img_h / 2
    # OpenGL-style projection composition used by the models
    import math

    fovx = 2 * math.atan(img_w / (2 * fx))
    fovy = 2 * math.atan(img_h / (2 * fy))
    t = math.tan(fovy / 2) * 0.01
    r = math.tan(fovx / 2) * 0.01
    P = np.zeros((4, 4), np.float32)
    P[0, 0] = 0.01 / r
    P[1, 1] = 0.01 / t
    P[2, 2] = (1000.01) / (1000 - 0.01)
    P[2, 3] = -2 * 1000 * 0.01 / (1000 - 0.01)
    P[3, 2] = 1.0
    fullmat = P @ viewmat

    proj = project_gaussians(
        jnp.asarray(pts), jnp.asarray(scales), 1.0, jnp.asarray(quats),
        jnp.asarray(viewmat[:3]), jnp.asarray(fullmat),
        fx, fy, cx, cy, img_h, img_w,
    )
    tiles = ((img_w + 15) // 16, (img_h + 15) // 16)
    isect = bin_gaussians(
        proj.xys, proj.depths, proj.radii, proj.num_tiles_hit,
        tiles, 16, isect_cap,
    )
    num_tiles = tiles[0] * tiles[1]
    print("num_intersects:", int(isect.num_intersects), file=sys.stderr)

    # Build sorted attrs exactly as the composite path does (no padding).
    @jax.jit
    def pack(xys, conics, cols, opac, sorted_gids):
        used = 6 + ch
        n2 = xys.shape[0]
        base = jnp.concatenate(
            [xys, conics, opac[:, None], cols,
             jnp.zeros((n2, rp.ATTR_W - used), jnp.float32)], axis=1)
        base = jnp.concatenate(
            [base, jnp.zeros((1, rp.ATTR_W), jnp.float32)], axis=0)
        gid_ext = jnp.concatenate(
            [sorted_gids, jnp.full((rp.CHUNK,), n2, jnp.int32)])
        return base[gid_ext]

    attr = pack(
        proj.xys, proj.conics, jnp.asarray(colors), jnp.asarray(op),
        isect.gaussian_ids,
    )
    padded_bins = isect.tile_bins
    jax.block_until_ready(attr)

    fwd = lambda a, b: rp.composite_tiles_fwd(a, b, tiles, 16, ch=ch)
    packed = fwd(attr, padded_bins)
    jax.block_until_ready(packed)
    ct = jnp.ones_like(packed)
    bwd = lambda a, b, f, c: rp.composite_tiles_bwd(
        a, b, f, c, tiles, 16, ch=ch)
    g = bwd(attr, padded_bins, packed, ct)
    jax.block_until_ready(g)

    def timeit(name, fn, *a):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name}: {dt:.3f} ms (wall; device truth below)")

    timeit("fwd", fwd, attr, padded_bins)
    timeit("bwd", bwd, attr, padded_bins, packed, ct)

    tdir = "/tmp/gstk_ktrace"
    os.makedirs(tdir, exist_ok=True)
    with jax.profiler.trace(tdir):
        outs = []
        for _ in range(args.iters):
            p = fwd(attr, padded_bins)
            outs.append(bwd(attr, padded_bins, p, ct))
        jax.block_until_ready(outs)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(tdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    agg = defaultdict(lambda: [0.0, 0])
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                nm = plane.event_metadata[ev.metadata_id].name
                key = "fwd" if "composite_tiles_fwd" in nm else (
                    "bwd" if "composite_tiles_bwd" in nm else "other")
                agg[key][0] += ev.duration_ps / 1e9
                agg[key][1] += 1
    for k in ("fwd", "bwd"):
        ms, cnt = agg[k]
        if cnt:
            print(f"device {k}: {ms/cnt:.3f} ms  (x{cnt})")


if __name__ == "__main__":
    main()
