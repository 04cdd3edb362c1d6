"""Dynamic row-move primitive rates — the go/no-go data for any Pallas
permutation/routing kernel (VERDICT r4 item 3).

Every design that could beat the XLA row-gather floor (radix-route
passes, FIFO bucket appends, windowed one-hot expansion, local
permutation final stages) bottoms out in one of three primitives:

  B. in-VMEM row move at a DYNAMIC (data-dependent) sublane offset
     (the inner op of any bucket-append / local-scatter pass),
  C. one-hot MXU matmul as a block-local permutation
     (the arbitrary-placement final stage, 3x bf16 planes for f32
     exactness),
  D. VMEM->HBM block copy at a dynamic destination row offset
     (the FIFO flush / out-of-order block write).

This tool measures each against the XLA gather baseline (A) with
profiler device truth (wall clock through the tunnel is untrustworthy,
CLAUDE.md). If B is ~1 ns/row, a 2-3 pass radix route beats the
~6.5 ns/row XLA gather at 1M rows; if B sits at ~5+ ns/row, the
permutation gathers are at the hardware floor under Pallas too and the
item closes with a speed-of-light accounting instead of a kernel.

Run on CPU with --interpret to check correctness only.
"""

import functools
import glob
import os
import sys

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


def timed(fn, args, tag, iters, n_rows, interpret):
    import jax

    out = jax.block_until_ready(fn(*args))
    if interpret:
        print(f"{tag:>28s}: interpret ok")
        return out
    tdir = f"/tmp/gstk_dynrow_{tag}"
    os.makedirs(tdir, exist_ok=True)
    with jax.profiler.trace(tdir):
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
    ms = device_ms(tdir, iters)
    print(f"{tag:>28s}: {ms:8.3f} ms  {ms * 1e6 / n_rows:6.2f} ns/row")
    return out


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = "--interpret" in sys.argv
    if interpret:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n = 1 << 17 if interpret else 1 << 20
    iters = 20
    rng = np.random.default_rng(0)
    tab_np = (rng.standard_normal((n, 128)) * 10).astype(np.float32)
    tab = jnp.asarray(tab_np)

    # ---- A. XLA gather baseline (uniform indices, big table) ----
    idx_np = rng.integers(0, n, n).astype(np.int32)
    idx = jnp.asarray(idx_np)
    gat = jax.jit(lambda t, i: t[i])
    a = timed(gat, (tab, idx), "A_xla_gather", iters, n, interpret)
    if interpret:
        np.testing.assert_array_equal(np.asarray(a), tab_np[idx_np])

    # ---- B. Pallas in-VMEM dynamic-row permutation ----
    # Block-local permutation: out[perm[i]] = in[i] within R-row blocks.
    # group: rows moved per dynamic access (1 = arbitrary single-row; 8 =
    # aligned sublane-tile granularity).
    def pallas_local_perm(R, group):
        nb = n // R

        def kern(perm_ref, in_ref, out_ref):
            def body(i, _):
                src = in_ref[pl.ds(i * group, group), :]
                out_ref[pl.ds(perm_ref[0, i] * group, group), :] = src
                return 0

            jax.lax.fori_loop(0, R // group, body, 0)

        return pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, R // group), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((R, 128), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((R, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n, 128), jnp.float32),
            interpret=interpret,
        )

    for R, group in ((4096, 8), (4096, 1), (512, 8)):
        nb = n // R
        # block-local permutation of row-groups
        g = R // group
        perm_np = np.stack([rng.permutation(g) for _ in range(nb)])
        perm = jnp.asarray(perm_np.astype(np.int32))
        tag = f"B_vmem_perm_R{R}_g{group}"
        try:
            fn = jax.jit(lambda p, t, R=R, group=group:
                         pallas_local_perm(R, group)(p, t))
            b = timed(fn, (perm, tab), tag, iters, n, interpret)
            if interpret:
                want = np.empty_like(tab_np)
                for bi in range(nb):
                    blk = tab_np[bi * R:(bi + 1) * R].reshape(g, group, 128)
                    dst = np.empty_like(blk)
                    dst[perm_np[bi]] = blk
                    want[bi * R:(bi + 1) * R] = dst.reshape(R, 128)
                np.testing.assert_array_equal(np.asarray(b), want)
        except Exception as e:
            print(f"{tag:>28s}: FAILED {type(e).__name__}: {e}"[:300])

    # ---- C. one-hot MXU block-local permutation (3 bf16 planes) ----
    def onehot_perm(R):
        nb = n // R
        perm_np = np.stack([rng.permutation(R) for _ in range(nb)])
        perm = jnp.asarray(perm_np.astype(np.int32))

        @jax.jit
        def fn(perm, t):
            tb = t.reshape(nb, R, 128)
            oh = jax.nn.one_hot(perm, R, dtype=jnp.bfloat16, axis=1)
            # 3-plane exact split of the f32 payload
            hi = (t.view(jnp.int32) & jnp.int32(-65536)).view(jnp.float32)
            rem = t - hi
            mid = (rem.view(jnp.int32) & jnp.int32(-65536)).view(jnp.float32)
            lo = rem - mid
            out = 0.0
            for plane in (hi, mid, lo):
                p3 = plane.reshape(nb, R, 128).astype(jnp.bfloat16)
                out = out + jax.lax.dot_general(
                    oh, p3, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
            return out.reshape(n, 128)

        return fn, perm, perm_np

    for R in (256, 512):
        fn, perm, perm_np = onehot_perm(R)
        tag = f"C_onehot_mxu_R{R}"
        c = timed(fn, (perm, tab), tag, iters, n, interpret)
        if interpret:
            nb = n // R
            want = np.empty_like(tab_np)
            for bi in range(nb):
                blk = tab_np[bi * R:(bi + 1) * R]
                dst = np.empty_like(blk)
                dst[perm_np[bi]] = blk
                want[bi * R:(bi + 1) * R] = dst
            np.testing.assert_allclose(np.asarray(c), want, rtol=0, atol=0)

    # ---- D. dynamic-destination HBM block writes ----
    # Per grid cell: 4096-row VMEM block scattered to HBM as W-row
    # sub-blocks at dynamic destination offsets (a permutation of the
    # sub-block grid so every row lands exactly once).
    def hbm_dynwrite(R, W):
        nb = n // R
        per = R // W

        def kern(dst_ref, in_ref, out_ref, sem):
            def body(j, _):
                cp = pltpu.make_async_copy(
                    in_ref.at[pl.ds(j * W, W), :],
                    out_ref.at[pl.ds(dst_ref[0, j] * W, W), :],
                    sem.at[j % 8],
                )
                cp.start()
                cp.wait()
                return 0

            jax.lax.fori_loop(0, per, body, 0)

        return pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, per), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((R, 128), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((n, 128), jnp.float32),
            scratch_shapes=[pltpu.SemaphoreType.DMA((8,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )

    for R, W in ((4096, 64), (4096, 8), (4096, 256)):
        nb, per = n // R, R // W
        # global permutation of sub-block slots
        slots = rng.permutation(n // W).astype(np.int32)
        dst = jnp.asarray(slots.reshape(nb, per))
        tag = f"D_hbm_dynwrite_W{W}"
        try:
            fn = jax.jit(lambda d, t, R=R, W=W: hbm_dynwrite(R, W)(d, t))
            d_out = timed(fn, (dst, tab), tag, iters, n, interpret)
            if interpret:
                want = np.empty_like(tab_np)
                for j in range(n // W):
                    want[slots[j] * W:(slots[j] + 1) * W] = \
                        tab_np[j * W:(j + 1) * W]
                np.testing.assert_array_equal(np.asarray(d_out), want)
        except Exception as e:
            print(f"{tag:>28s}: FAILED {type(e).__name__}: {e}"[:300])


if __name__ == "__main__":
    main()
