"""Gather cost vs index locality — the measurement behind Morton renumbering.

docs/PERFORMANCE.md's gather economics table shows the row-gather rate is
table-size bound (67 MB table: 1.9 ms/Mrow; 537-700 MB: 6.3-10.4 ms/Mrow),
which suggests the cost is working-set locality, not a fixed issue rate.
If true, the 1M-regime permutation gathers (transposed pack gather 6.7 ms +
gradient reorder gather 6.5 ms, docs/PERFORMANCE.md "Remaining 1M profile")
can be cut by renumbering Gaussians in spatial (Morton) order so both
gathers' indices slide through a small window instead of spraying the
whole table.

This tool measures, with profiler device truth, gather time for:
  - row gather from a (N+1, 128) f32 wide table (the pack gather shape)
  - column gather from a (16, Cp) f32 table (the reorder gather shape)
with 1M indices drawn (a) uniformly over the table and (b) inside a
sliding window of width W for W in 2^13..2^20 — the curve says what
locality is worth and how tight the window must be.
"""

import glob
import os
import sys
import time
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
    if os.environ.get("GATHER_DEBUG"):
        for nm, ms in sorted(by_op.items(), key=lambda kv: -kv[1])[:6]:
            print(f"    {ms / iters:8.3f} ms  {nm[:90]}", file=sys.stderr)
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
    n_tab = 1 << 20

    def windowed(width):
        """Indices sliding through the table in a window of ``width``:
        output position i reads near (i / n_out) * n_tab +- width/2."""
        base = (np.arange(n_out, dtype=np.int64) * n_tab) // n_out
        jit_ = rng.integers(0, width, n_out)
        return ((base + jit_ - width // 2) % n_tab).astype(np.int32)

    idx_cases = {"uniform": rng.integers(0, n_tab, n_out).astype(np.int32)}
    for logw in (13, 15, 17, 19, 20):
        idx_cases[f"window 2^{logw}"] = windowed(1 << logw)

    wide = jnp.asarray(rng.standard_normal((n_tab, 128), dtype=np.float32))
    colt = jnp.asarray(rng.standard_normal((16, n_tab), dtype=np.float32))

    row_gather = jax.jit(lambda t, i: t[i])
    col_gather = jax.jit(lambda t, i: t[:, i])

    print(f"{'pattern':16s} {'row (N,128) ms':>15s} {'col (16,N) ms':>15s}")
    for name, idx_np in idx_cases.items():
        idx = jnp.asarray(idx_np)
        row = []
        for tag, fn, tab in (("row", row_gather, wide),
                             ("col", col_gather, colt)):
            out = jax.block_until_ready(fn(tab, idx))
            tdir = f"/tmp/gstk_gather_{tag}_{abs(hash(name)) % 99999}"
            os.makedirs(tdir, exist_ok=True)
            with jax.profiler.trace(tdir):
                for _ in range(iters):
                    out = fn(tab, idx)
                jax.block_until_ready(out)
            row.append(device_ms(tdir, iters))
        print(f"{name:16s} {row[0]:15.3f} {row[1]:15.3f}")


if __name__ == "__main__":
    main()
