"""Characterize the lax.sort size cliff (VERDICT round-2 item 5).

Binning sorts ~capacity entries by (tile_id, depth) with two carried
payloads; capacity is pinned to <= 2^20 because 2^21 sorts were observed
~90 ms (and band machinery exists to stay under the ceiling). This tool
measures, with profiler device truth:

  - lax.sort time vs n (2^18..2^22), operand count (1/2/4), key dtype
  - the per-element cost ratio across the 2^20 -> 2^21 boundary

to either (a) find a fast >= 2^21 configuration (e.g. a single packed
i32 key) or (b) pin the cliff's cost model as the documented reason the
band design is the blessed path (docs/PERFORMANCE.md).
"""

import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def device_ms(tdir, iters, match="sort"):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(tdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    total = 0.0
    by_op = defaultdict(float)
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                nm = plane.event_metadata[ev.metadata_id].name
                by_op[nm] += ev.duration_ps / 1e9
                total += ev.duration_ps / 1e9
    if os.environ.get("SORT_DEBUG"):
        for nm, ms in sorted(by_op.items(), key=lambda kv: -kv[1])[:6]:
            print(f"    {ms / iters:8.3f} ms  {nm[:90]}", file=sys.stderr)
    return total / iters  # whole-program device time (the sort dominates)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    iters = 20
    rng = np.random.default_rng(0)
    print(f"{'config':34s} {'n':>9s} {'ms':>9s} {'ns/elem':>9s}")
    for logn in (19, 20, 21, 22):
        n = 1 << logn
        keys_i = jnp.asarray(rng.integers(0, 1 << 31, n, dtype=np.int64)
                             .astype(np.int32))
        keys_f = jnp.asarray(rng.uniform(0, 1e4, n).astype(np.float32))
        pay1 = jnp.asarray(np.arange(n, dtype=np.int32))
        pay2 = jnp.asarray(rng.integers(0, n, n).astype(np.int32))

        # inputs must be jit ARGUMENTS — closed-over arrays are baked in
        # as constants and XLA constant-folds the whole sort at compile
        # time (the first version of this tool measured exactly that)
        cases = {
            "1-op i32 key": (
                lambda ki, kf, p1, p2: jax.lax.sort((ki,), num_keys=1)),
            "2-op i32 key + payload": (
                lambda ki, kf, p1, p2: jax.lax.sort((ki, p1), num_keys=1)),
            "4-op (tile,depth) 2 keys": (
                lambda ki, kf, p1, p2: jax.lax.sort(
                    (ki, kf, p1, p2), num_keys=2)),
        }
        args = (keys_i, keys_f, pay1, pay2)
        for name, fn in cases.items():
            jfn = jax.jit(fn)
            try:
                out = jax.block_until_ready(jfn(*args))
            except Exception as e:
                print(f"{name:34s} {n:9d}  FAILED: {str(e)[:60]}")
                continue
            tdir = f"/tmp/gstk_sort_{logn}_{abs(hash(name)) % 99999}"
            os.makedirs(tdir, exist_ok=True)
            t0 = time.perf_counter()
            with jax.profiler.trace(tdir):
                for _ in range(iters):
                    out = jfn(*args)
                jax.block_until_ready(out)
            wall = (time.perf_counter() - t0) / iters * 1e3
            dev = device_ms(tdir, iters)
            print(f"{name:34s} {n:9d} {dev:9.3f} {dev / n * 1e6:9.3f}"
                  f"   (wall {wall:.2f})")


if __name__ == "__main__":
    main()
