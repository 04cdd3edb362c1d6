"""Device-truth microbench for the binning segment-scatter redesign.

Question: is a TPU scatter-add row-RATE-bound (cost ~ update rows,
independent of payload columns) like gathers are? If yes, the three
capacity-row segment passes in ``ops/binning.bin_gaussians`` (marks /
packed / depth diffs — 27.5 ms at 1M capacity, docs/PERFORMANCE.md) can be
merged into ONE multi-column scatter plus per-column cumsums.

Measures, at N update rows into a (cap+1, k) buffer on the real chip:
  - k = 1..8 column int32 scatter-add (sorted indices, mode=drop)
  - column extraction cost from the (cap+1, k) result (the relayout the
    round-2 notes warn about) and transpose-based extraction
  - the full fused candidate (1 scatter + k cumsums) vs the current
    3 x (scatter + cumsum)

Per-op device times come from the profiler trace (wall-clock probes of
single ops through the tunnel are untrustworthy — CLAUDE.md).
"""

import argparse
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def device_ms_per_iter(tdir, iters):
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
                total += ev.duration_ps / 1e9
                by_op[nm] += ev.duration_ps / 1e9
    top = sorted(by_op.items(), key=lambda kv: -kv[1])[:4]
    return total / iters, [(n, ms / iters) for n, ms in top]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--n", type=int, default=1 << 20, help="update rows")
    ap.add_argument("--cap", type=int, default=1 << 20, help="buffer rows")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gstk_tpu.ops.binning import _cumsum_1d

    n, cap = args.n, args.cap
    rng = np.random.default_rng(0)
    # sorted indices like the real cum array (monotone, some repeats)
    idx = np.sort(rng.integers(0, cap + 1, n)).astype(np.int32)
    vals = rng.integers(-1000, 1000, (n, 8)).astype(np.int32)
    idx_j = jnp.asarray(idx)
    vals_j = jnp.asarray(vals)

    variants = {}

    def scatter_k(k):
        if k == 1:
            def fn(idx, vals):
                buf = jnp.zeros((cap + 1,), jnp.int32)
                return buf.at[idx].add(vals[:, 0], mode="drop")
        else:
            def fn(idx, vals):
                buf = jnp.zeros((cap + 1, k), jnp.int32)
                return buf.at[idx].add(vals[:, :k], mode="drop")
        return jax.jit(fn)

    for k in (1, 2, 3, 4, 8):
        variants[f"scatter k={k}"] = (scatter_k(k), (idx_j, vals_j))

    # 3 separate scatter+cumsum passes (current design)
    def three_passes(idx, vals):
        outs = []
        for c in range(3):
            buf = jnp.zeros((cap + 1,), jnp.int32).at[idx].add(
                vals[:, c], mode="drop")
            outs.append(_cumsum_1d(buf[:-1]))
        return outs

    variants["3x(scatter+cumsum)"] = (jax.jit(three_passes), (idx_j, vals_j))

    # fused candidate: one 3-col scatter, then per-column cumsum.
    # Column extraction variant A: direct slice buf[:, c].
    def fused_slice(idx, vals):
        buf = jnp.zeros((cap + 1, 3), jnp.int32).at[idx].add(
            vals[:, :3], mode="drop")
        return [_cumsum_1d(buf[:-1, c]) for c in range(3)]

    variants["fused slice-cols"] = (jax.jit(fused_slice), (idx_j, vals_j))

    # Column extraction variant B: one transpose then row slices.
    def fused_transpose(idx, vals):
        buf = jnp.zeros((cap + 1, 3), jnp.int32).at[idx].add(
            vals[:, :3], mode="drop")
        bt = buf[:-1].T  # (3, cap)
        return [_cumsum_1d(bt[c]) for c in range(3)]

    variants["fused transpose"] = (jax.jit(fused_transpose), (idx_j, vals_j))

    # Column extraction variant C: 2-D cumsum over the (cap, 3) buffer
    # directly (reshape rows to (cap//1024, 1024, 3), scan axis 1?) —
    # hierarchical cumsum generalized to a trailing column axis.
    def cumsum_cols(x):  # x: (cap, k) -> per-column inclusive cumsum
        m, k = x.shape[0] // 1024, x.shape[1]
        h = x[: m * 1024].reshape(m, 1024, k)
        within = jnp.cumsum(h, axis=1)
        offs = jnp.concatenate(
            [jnp.zeros((1, k), x.dtype), jnp.cumsum(within[:, -1, :], axis=0)[:-1]]
        )
        return (within + offs[:, None, :]).reshape(-1, k)

    def fused_2d(idx, vals):
        buf = jnp.zeros((cap + 1, 3), jnp.int32).at[idx].add(
            vals[:, :3], mode="drop")
        return cumsum_cols(buf[:-1])

    variants["fused 2d-cumsum"] = (jax.jit(fused_2d), (idx_j, vals_j))

    # correctness check (CPU-verifiable semantics) for the fused variants
    ref = np.zeros((cap + 1, 3), np.int64)
    np.add.at(ref, idx[idx <= cap], vals[idx <= cap, :3])
    ref_cs = np.cumsum(ref[:-1].astype(np.int32).astype(np.int64), axis=0
                       ).astype(np.int32)  # mod-2^32 telescoping semantics
    got = variants["fused 2d-cumsum"][0](idx_j, vals_j)
    np.testing.assert_array_equal(np.asarray(got), ref_cs.astype(np.int32))
    print("fused 2d-cumsum correctness: OK", file=sys.stderr)

    import time

    for name, (fn, a) in variants.items():
        out = jax.block_until_ready(fn(*a))  # compile
        tdir = f"/tmp/gstk_scatter_{abs(hash(name))}"
        os.makedirs(tdir, exist_ok=True)
        t0 = time.perf_counter()
        with jax.profiler.trace(tdir):
            for _ in range(args.iters):
                out = fn(*a)
            jax.block_until_ready(out)
        wall = (time.perf_counter() - t0) / args.iters * 1e3
        dev, top = device_ms_per_iter(tdir, args.iters)
        print(f"{name:22s}: device {dev:7.3f} ms  (wall {wall:7.3f})")
        for opn, ms in top:
            print(f"    {ms:7.3f} ms  {opn}")


if __name__ == "__main__":
    main()
