"""Decompose the per-tile fixed cost of the fwd compositing kernel.

`bench_kernels.py --sweep` fits per-tile fixed ~0.77 us fwd (device
truth). This ablation isolates where it goes by timing cloned kernel
variants at a fixed-cost-dominated shape (T=2048, C=1) and a
marginal-dominated one (T=128, C=16):

  full     — the production kernel (tools/bench_kernels.py numbers)
  noexit   — while->fori: no per-iteration min(dead) cond reduction and
             no early-exit branch (isolates loop-control cost)
  accloop  — color accumulator carried in loop state; ONE out write per
             tile, no out zero-init, no per-chunk VMEM read-modify-write
  noreshape— t_final written without the (P,1)->(1,P) relayout
             (isolates the cross-sublane transpose cost)
  dmaonly  — wait the chunk DMA, accumulate chunk[0] (keeps the DMA and
             loop alive, removes all compositing math): the DMA+loop
             floor

All variants keep the DMA double-buffering and cross-tile chunk-0
prefetch so the comparison moves one knob at a time. Times are device
truth from the profiler trace.
"""

import functools
import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_variant(rp, variant, tiles_x, block_width, ch, num_tiles, tpc):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    CHUNK = rp.CHUNK

    def kernel(bins_ref, attr_ref, out_ref, chunk_vmem, sem):
        base = pl.program_id(0) * tpc
        basis, _, _ = rp._pixel_basis(block_width)
        p = block_width * block_width
        rows = rp.attr_rows(ch)

        if variant != "accloop":
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        def make_dma(b0):
            def start_dma(i, slot):
                off = pl.multiple_of((b0 + i) * CHUNK, CHUNK)
                pltpu.make_async_copy(
                    attr_ref.at[pl.ds(off, CHUNK)], chunk_vmem.at[slot],
                    sem.at[slot],
                ).start()

            def wait_dma(i, slot):
                off = pl.multiple_of((b0 + i) * CHUNK, CHUNK)
                pltpu.make_async_copy(
                    attr_ref.at[pl.ds(off, CHUNK)], chunk_vmem.at[slot],
                    sem.at[slot],
                ).wait()

            return start_dma, wait_dma

        def process_tile(t, sub):
            start = bins_ref[2 * t]
            end = bins_ref[2 * t + 1]
            ox, oy = rp._tile_origin(t, tiles_x, block_width)
            b0 = start // CHUNK
            n_chunks = jnp.where(
                end > start, (end + CHUNK - 1) // CHUNK - b0, 0
            )
            start_dma, wait_dma = make_dma(b0)

            if variant != "pair":
                @pl.when(jnp.logical_and(t == 0, n_chunks > 0))
                def _():
                    start_dma(0, 0)

            if variant == "pair":
                # Two chunks per iteration, 4 DMA slots: the per-chunk
                # cost is hypothesized to be the SERIAL MXU<->VPU
                # dependency chain (marginal barely moved when DMA bytes
                # halved and ~7 VPU passes were removed, round 4); a pair
                # body gives Mosaic two independent chains to interleave,
                # serialized only through the tiny t_run/dead coupling.
                # Timing-only (assumes even chunk counts; T=128/C=16 row
                # is the meaningful one).
                def alpha_of(chunk, off):
                    x = chunk[0:1, :] - ox
                    y = chunk[1:2, :] - oy
                    ca, cb, cc = chunk[2:3, :], chunk[3:4, :], chunk[4:5, :]
                    op = chunk[5:6, :]
                    c0 = 0.5 * (ca * x * x + cc * y * y) + cb * x * y
                    c1 = -(ca * x + cb * y)
                    c2 = -(cc * y + cb * x)
                    coeffs = jnp.concatenate(
                        [c0, c1, c2, 0.5 * ca, 0.5 * cc, cb], axis=0
                    )
                    sigma = rp._mxu_dot(
                        basis, coeffs, (((1,), (0,)), ((), ())), a_exact=True
                    )
                    raw = op * jnp.exp(-sigma)
                    alpha = jnp.minimum(raw, 0.999)
                    lane = jax.lax.broadcasted_iota(jnp.int32, (1, rp.CHUNK), 1)
                    in_range = ((off + lane) >= start) & ((off + lane) < end)
                    valid = (sigma >= 0.0) & (alpha >= 1.0 / 255.0) & in_range
                    a_eff = jnp.where(valid, alpha, 0.0)
                    logm = jnp.log1p(-a_eff)
                    cs_ex = rp._cumsum_lanes(logm, terms=2, exclusive=True)
                    return a_eff, logm, cs_ex, chunk[6 : 6 + ch, :]

                def half(t_run, dead, acc, a_eff, logm, cs_ex, colors):
                    t_prev = t_run * jnp.exp(cs_ex)
                    t_incl = t_prev * (1.0 - a_eff)
                    keep = (a_eff > 0.0) & (t_incl > 1e-4) & (dead < 0.5)
                    a_k = jnp.where(keep, a_eff, 0.0)
                    ld = jnp.sum(
                        jnp.where(keep, logm, 0.0), axis=1, keepdims=True
                    )
                    t_min = jnp.min(t_incl, axis=1, keepdims=True)
                    dead = jnp.maximum(
                        dead, jnp.where(t_min <= 1e-4, 1.0, 0.0)
                    )
                    w = t_prev * a_k
                    acc = acc + rp._mxu_dot(
                        colors, w, (((1,), (1,)), ((), ()))
                    )
                    return t_run * jnp.exp(ld), dead, acc

                def body(k, c):
                    t_run, dead, acc = c
                    i0 = 2 * k
                    i1 = 2 * k + 1
                    s0 = jax.lax.rem(i0, 4)
                    s1 = jax.lax.rem(i1, 4)

                    @pl.when(i0 + 2 < n_chunks)
                    def _():
                        start_dma(i0 + 2, jax.lax.rem(i0 + 2, 4))

                    @pl.when(i1 + 2 < n_chunks)
                    def _():
                        start_dma(i1 + 2, jax.lax.rem(i1 + 2, 4))
                    wait_dma(i0, s0)
                    wait_dma(i1, s1)
                    chA = rp._mxu_transpose(chunk_vmem[s0], rows)
                    chB = rp._mxu_transpose(chunk_vmem[s1], rows)
                    pA = alpha_of(chA, (b0 + i0) * CHUNK)
                    pB = alpha_of(chB, (b0 + i1) * CHUNK)
                    t_run, dead, acc = half(t_run, dead, acc, *pA)
                    t_run, dead, acc = half(t_run, dead, acc, *pB)
                    return t_run, dead, acc

                # cold-start chunks 0,1; each body iteration prefetches
                # the next pair (distance-4 slot reuse, same discipline
                # as the production kernel's distance-2)
                for sl in range(2):
                    @pl.when(sl < n_chunks)
                    def _(sl=sl):
                        start_dma(sl, sl)
                acc0 = jnp.zeros((ch, p), jnp.float32)
                t0 = jnp.ones((p, 1), jnp.float32)
                dead0 = jnp.zeros((p, 1), jnp.float32)
                t_final, _, acc = jax.lax.fori_loop(
                    0, n_chunks // 2, body, (t0, dead0, acc0)
                )
                # drain the odd tail's issued-but-unprocessed DMA (probe
                # measures even-chunk tiles; C=1 row is DMA+loop only)
                @pl.when(jax.lax.rem(n_chunks, 2) == 1)
                def _():
                    i = n_chunks - 1
                    wait_dma(i, jax.lax.rem(i, 4))
                out_ref[sub, 0:ch, :] = acc
                out_ref[sub, ch : ch + 1, :] = jnp.zeros((1, p), jnp.float32)
            elif variant.startswith("marg_"):
                # Marginal-cost attribution: remove ONE in-body component
                # (outputs become wrong — timing only). marg_full keeps
                # everything and differs from "full" only in sharing this
                # code path.
                skip = variant[5:]

                def body(i, c):
                    t_run, dead, acc = c
                    slot = jax.lax.rem(i, 2)

                    @pl.when(i + 1 < n_chunks)
                    def _():
                        start_dma(i + 1, 1 - slot)
                    wait_dma(i, slot)
                    off = (b0 + i) * CHUNK
                    if skip == "transpose":
                        chunk = chunk_vmem[slot][0:rows, :]
                    else:
                        chunk = rp._mxu_transpose(chunk_vmem[slot], rows)
                    x = chunk[0:1, :] - ox
                    y = chunk[1:2, :] - oy
                    ca, cb, cc = chunk[2:3, :], chunk[3:4, :], chunk[4:5, :]
                    op = chunk[5:6, :]
                    if skip == "sigmadot":
                        sigma = x * y  # placeholder (P broadcast), no dot
                        sigma = jnp.broadcast_to(sigma, (p, CHUNK))
                    else:
                        c0 = 0.5 * (ca * x * x + cc * y * y) + cb * x * y
                        c1 = -(ca * x + cb * y)
                        c2 = -(cc * y + cb * x)
                        coeffs = jnp.concatenate(
                            [c0, c1, c2, 0.5 * ca, 0.5 * cc, cb], axis=0
                        )
                        sigma = rp._mxu_dot(
                            basis, coeffs, (((1,), (0,)), ((), ())),
                            a_exact=True,
                        )
                    if skip == "exp":
                        exp_neg = 1.0 - 0.5 * sigma
                    else:
                        exp_neg = jnp.exp(-sigma)
                    raw = op * exp_neg
                    alpha = jnp.minimum(raw, 0.999)
                    lane = jax.lax.broadcasted_iota(
                        jnp.int32, (1, CHUNK), 1)
                    in_range = ((off + lane) >= start) & ((off + lane) < end)
                    valid = (sigma >= 0.0) & (alpha >= 1.0 / 255.0) & in_range
                    a_eff = jnp.where(valid, alpha, 0.0)
                    if skip == "log1p":
                        logm = -a_eff
                    else:
                        logm = jnp.log1p(-a_eff)
                    if skip == "cumsum":
                        cs = logm
                    else:
                        cs = rp._cumsum_lanes(logm, terms=2)
                    if skip == "exp":
                        e_cs = 1.0 + cs
                    else:
                        e_cs = jnp.exp(cs)
                    t_incl = t_run * e_cs
                    t_prev = t_incl / (1.0 - a_eff)
                    broke = jnp.where(t_incl <= 1e-4, 1.0, 0.0)
                    dead_incl = jnp.maximum(dead, broke)
                    keep = valid & (dead_incl < 0.5)
                    a_k = jnp.where(keep, a_eff, 0.0)
                    log_dec = jnp.sum(
                        jnp.where(keep, logm, 0.0), axis=1, keepdims=True
                    )
                    dead = jnp.maximum(
                        dead, jnp.max(broke, axis=1, keepdims=True)
                    )
                    w = t_prev * a_k
                    colors = chunk[6 : 6 + ch, :]
                    if skip == "contrib":
                        # keep w alive without the (ch,K)x(P,K) dot (a
                        # scalar reduce, no relayout)
                        acc = acc + colors[:, 0:1] * jnp.sum(w)
                    else:
                        acc = acc + rp._mxu_dot(
                            colors, w, (((1,), (1,)), ((), ()))
                        )
                    return t_run * jnp.exp(log_dec), dead, acc

                acc0 = jnp.zeros((ch, p), jnp.float32)
                t0 = jnp.ones((p, 1), jnp.float32)
                dead0 = jnp.zeros((p, 1), jnp.float32)
                t_final, _, acc = jax.lax.fori_loop(
                    0, n_chunks, body, (t0, dead0, acc0)
                )
                out_ref[sub, 0:ch, :] = acc
                out_ref[sub, ch : ch + 1, :] = jnp.zeros((1, p), jnp.float32)
            elif variant == "dmaonly":
                def body(i, acc):
                    slot = jax.lax.rem(i, 2)

                    @pl.when(i + 1 < n_chunks)
                    def _():
                        start_dma(i + 1, 1 - slot)
                    wait_dma(i, slot)
                    row = chunk_vmem[slot, 0:1, :]  # (1, ATTR_W=128)
                    return acc + jnp.concatenate([row, row], axis=1)

                acc = jax.lax.fori_loop(
                    0, n_chunks, body, jnp.zeros((1, p), jnp.float32)
                )
                out_ref[sub, 0:1, :] = acc
                t_final = jnp.ones((p, 1), jnp.float32)
            else:
                def chunk_math(i, t_run, dead, acc):
                    slot = jax.lax.rem(i, 2)

                    @pl.when(i + 1 < n_chunks)
                    def _():
                        start_dma(i + 1, 1 - slot)
                    wait_dma(i, slot)
                    off = (b0 + i) * CHUNK
                    chunk = rp._mxu_transpose(chunk_vmem[slot], rows)
                    a_eff, logm, valid, _ = rp._chunk_alpha(
                        chunk, basis, ox, oy, off, start, end
                    )
                    a_k, t_prev, log_dec, dead = rp._keep(
                        t_run, dead, a_eff, logm, valid
                    )
                    w = t_prev * a_k
                    colors = chunk[6 : 6 + ch, :]
                    contrib = rp._mxu_dot(
                        colors, w, (((1,), (1,)), ((), ()))
                    )
                    if variant == "accloop":
                        acc = acc + contrib
                    else:
                        out_ref[sub, 0:ch, :] += contrib
                    return t_run * jnp.exp(log_dec), dead, acc

                acc0 = jnp.zeros((ch, p), jnp.float32)
                t0 = jnp.ones((p, 1), jnp.float32)
                dead0 = jnp.zeros((p, 1), jnp.float32)
                if variant == "noexit":
                    def body(i, c):
                        t_run, dead, acc = c
                        return chunk_math(i, t_run, dead, acc)

                    t_final, _, acc = jax.lax.fori_loop(
                        0, n_chunks, body, (t0, dead0, acc0)
                    )
                    i_done = n_chunks
                else:
                    def cond(c):
                        i, _, dead, _ = c
                        return jnp.logical_and(
                            i < n_chunks, jnp.min(dead) < 0.5
                        )

                    def body(c):
                        i, t_run, dead, acc = c
                        t_run, dead, acc = chunk_math(i, t_run, dead, acc)
                        return i + 1, t_run, dead, acc

                    i_done, t_final, _, acc = jax.lax.while_loop(
                        cond, body, (jnp.int32(0), t0, dead0, acc0)
                    )

                    @pl.when(i_done < n_chunks)
                    def _():
                        wait_dma(i_done, jax.lax.rem(i_done, 2))

                if variant == "accloop":
                    out_ref[sub, 0:ch, :] = acc
                    out_ref[sub, ch + 1 :, :] = jnp.zeros(
                        (out_ref.shape[1] - ch - 1, p), jnp.float32
                    )

            # next-tile chunk-0 handoff (pair cold-starts its own slots)
            if variant != "pair":
                nstart = bins_ref[jnp.minimum(2 * (t + 1), 2 * num_tiles - 2)]
                nend = bins_ref[jnp.minimum(2 * (t + 1) + 1, 2 * num_tiles - 1)]

                @pl.when(jnp.logical_and(t + 1 < num_tiles, nend > nstart))
                def _():
                    noff = pl.multiple_of((nstart // CHUNK) * CHUNK, CHUNK)
                    pltpu.make_async_copy(
                        attr_ref.at[pl.ds(noff, CHUNK)], chunk_vmem.at[0],
                        sem.at[0],
                    ).start()

            if variant == "noreshape":
                out_ref[sub, ch : ch + 1, :] = jnp.zeros((1, p), jnp.float32)
            elif variant in ("batchT", "batchTmxu"):
                return t_final
            elif variant != "dmaonly":
                out_ref[sub, ch : ch + 1, :] = t_final.reshape(1, p)
            return None

        t_finals = []
        for sub in range(tpc):
            t_finals.append(process_tile(base + sub, sub))
        if variant in ("batchT", "batchTmxu"):
            tf = (
                t_finals[0] if tpc == 1
                else jnp.concatenate(t_finals, axis=1)
            )  # (P, tpc)
            if variant == "batchT":
                tft = tf.T  # one (P,tpc)->(tpc,P) relayout per cell
            else:
                # MXU transpose: contract against a bf16-exact identity
                ident = (
                    jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)
                    == jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)
                ).astype(jnp.float32)
                tft = rp._mxu_dot(
                    tf, ident, (((0,), (0,)), ((), ())), b_exact=True
                )  # (tpc, P)
            for sub in range(tpc):
                out_ref[sub, ch : ch + 1, :] = tft[sub : sub + 1, :]

    return kernel


def run_variant(rp, variant, attr_j, bins_j, tiles, ch, iters):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    num_tiles = tiles[0] * tiles[1]
    p = 256
    orows = rp.out_rows(ch)
    tpc = rp._tiles_per_call(num_tiles)
    kernel = build_variant(rp, variant, tiles[0], 16, ch, num_tiles, tpc)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles // tpc,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (tpc, orows, p), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (4 if variant == "pair" else 2, rp.CHUNK, rp.ATTR_W),
                jnp.float32,
            ),
            pltpu.SemaphoreType.DMA((4 if variant == "pair" else 2,)),
        ],
    )
    fn = jax.jit(lambda a, b: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((num_tiles, orows, p), jnp.float32),
        grid_spec=grid_spec,
    )(b.reshape(-1), a))
    out = jax.block_until_ready(fn(attr_j, bins_j))
    tdir = f"/tmp/gstk_ablate_{variant}_{num_tiles}"
    os.makedirs(tdir, exist_ok=True)
    with jax.profiler.trace(tdir):
        for _ in range(iters):
            out = fn(attr_j, bins_j)
        jax.block_until_ready(out)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(tdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    dev = 0.0
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                nm = plane.event_metadata[ev.metadata_id].name
                if "kernel" in nm or "pallas" in nm or "custom-call" in nm:
                    dev += ev.duration_ps / 1e9
    return dev / iters, float(jnp.sum(jnp.abs(out[:, 0:ch, :])))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from gstk_tpu.ops import raster_pallas as rp

    iters = 50
    ch = 4
    total_chunks = 2048
    for c_per_tile in (1, 16):
        t_tiles = total_chunks // c_per_tile
        cap = total_chunks * 128
        rng = np.random.default_rng(0)
        attr = np.zeros((cap + 128, rp.ATTR_W), np.float32)
        tile_of = np.arange(cap) // (c_per_tile * 128)
        attr[:cap, 0] = tile_of * 16 + 8.0
        attr[:cap, 1] = 8.0
        attr[:cap, 2] = 1e-4
        attr[:cap, 4] = 1e-4
        attr[:cap, 5] = 0.004
        attr[:cap, 6:10] = rng.uniform(0, 1, (cap, 4))
        bins = np.stack(
            [np.arange(t_tiles) * c_per_tile * 128,
             (np.arange(t_tiles) + 1) * c_per_tile * 128], axis=-1
        ).astype(np.int32)
        tiles = (t_tiles, 1)
        attr_j = jnp.asarray(attr)
        bins_j = jnp.asarray(bins)
        print(f"--- T={t_tiles} C={c_per_tile} ---")
        base_acc = None
        variants = ("full", "noexit", "accloop", "noreshape",
                    "batchT", "batchTmxu", "dmaonly")
        if os.environ.get("ABLATE_MARGINAL"):
            # per-chunk component attribution (wrong outputs, timing only)
            variants = ("marg_none", "marg_transpose", "marg_sigmadot",
                        "marg_exp", "marg_log1p", "marg_cumsum",
                        "marg_contrib")
        if os.environ.get("ABLATE_PAIR"):
            # chunk-pair software pipelining probe (timing only)
            variants = ("marg_none", "pair")
        for variant in variants:
            ms, acc = run_variant(
                rp, variant, attr_j, bins_j, tiles, ch, iters
            )
            note = ""
            if variant == "full":
                base_acc = acc
            elif variant in ("noexit", "accloop") and base_acc is not None:
                note = "  (acc matches full)" if abs(acc - base_acc) < 1e-3 * (
                    1 + abs(base_acc)) else f"  (ACC MISMATCH {acc} vs {base_acc})"
            print(f"{variant:10s}: {ms:7.3f} ms "
                  f"({ms / t_tiles * 1e3:6.3f} us/tile){note}")


if __name__ == "__main__":
    main()
