"""Row-gather cost vs table geometry (rows / width / dtype) — device truth.

bench_gather_locality.py killed the locality hypothesis: gather cost is
COMPLETELY insensitive to index working-set width (uniform == 2^13 window
on a 537 MB table, 10.4 ms for 2^20 indices). Yet the round-2 economics
table (docs/PERFORMANCE.md) shows a 131k-row 67 MB table gathering at
1.9 ns/row — 5x faster. So the rate is set by table GEOMETRY, not index
distribution. This sweep maps the surface:

  - rows 2^17..2^20 at 128 f32 lanes   (bytes cliff? row-count cliff?)
  - width 16..128 f32 lanes at 2^20 rows (narrow-row economics)
  - bf16 / int8 variants                (dtype/bytes sensitivity)
  - monotonic non-decreasing indices    (expansion-style gather)

The answer decides how (whether) the 1M-regime permutation gathers
(transposed pack 6.7 ms + gradient reorder 6.5 ms) can be restructured.
"""

import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def device_ms(tdir, iters):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(tdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    total = 0.0
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                total += ev.duration_ps / 1e9
    return total / iters


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    iters = 20
    rng = np.random.default_rng(0)
    n_out = 1 << 20

    if len(sys.argv) > 1:
        # cliff search: pass explicit row counts (128-lane f32, uniform)
        cases = [(int(r), 128, np.float32, "uniform") for r in sys.argv[1:]]
    else:
        cases = []
        for logr in (17, 18, 19, 20):
            cases.append((1 << logr, 128, np.float32, "uniform"))
        for w in (16, 32, 64):
            cases.append((1 << 20, w, np.float32, "uniform"))
        cases.append((1 << 20, 128, np.dtype(jnp.bfloat16), "uniform"))
        cases.append((1 << 20, 128, np.int8, "uniform"))
        cases.append((1 << 17, 128, np.dtype(jnp.bfloat16), "uniform"))
        cases.append((1 << 20, 128, np.float32, "monotonic"))
        cases.append((1 << 18, 128, np.float32, "monotonic"))

    print(f"{'rows':>9s} {'w':>4s} {'dtype':>9s} {'MB':>7s} {'idx':>10s} "
          f"{'ms':>8s} {'ns/row':>7s}")
    for n_tab, width, dtype, pat in cases:
        if pat == "uniform":
            idx_np = rng.integers(0, n_tab, n_out).astype(np.int32)
        else:
            idx_np = ((np.arange(n_out, dtype=np.int64) * n_tab)
                      // n_out).astype(np.int32)
        tab_np = (rng.standard_normal((n_tab, width)) * 10).astype(np.float32)
        tab = jnp.asarray(tab_np).astype(jnp.dtype(dtype))
        idx = jnp.asarray(idx_np)
        fn = jax.jit(lambda t, i: t[i])
        out = jax.block_until_ready(fn(tab, idx))
        mb = n_tab * width * tab.dtype.itemsize / 1e6
        tdir = f"/tmp/gstk_geo_{n_tab}_{width}_{tab.dtype.name}_{pat}"
        os.makedirs(tdir, exist_ok=True)
        with jax.profiler.trace(tdir):
            for _ in range(iters):
                out = fn(tab, idx)
            jax.block_until_ready(out)
        ms = device_ms(tdir, iters)
        print(f"{n_tab:9d} {width:4d} {tab.dtype.name:>9s} {mb:7.0f} "
              f"{pat:>10s} {ms:8.3f} {ms * 1e6 / n_out:7.2f}")


if __name__ == "__main__":
    main()
