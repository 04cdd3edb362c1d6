"""Sorted-boundary segment broadcast as a Pallas kernel.

The binning hot path (``ops/binning.bin_gaussians``) broadcasts per-Gaussian
values to per-slot arrays through three XLA scatter+cumsum passes (marks /
packed word / depth bits). XLA's 1-D scatter runs at a fixed ~8.7 ns per
UPDATE row on TPU regardless of payload (multi-column scatters are ~10x
worse — measured in ``tools/bench_scatter.py``), so at 1M Gaussian capacity
the three passes cost ~27.5 ms (docs/PERFORMANCE.md) — the dominant step
cost in the 1M-capacity training regime. The reference's CUDA pipeline pays
nothing comparable (``rasterizer/cuda/csrc/forward.cu:94-154`` writes
intersections with atomics); this kernel is the TPU answer.

Key fact the XLA scatter cannot exploit: the scatter indices are SORTED
(they are a cumsum). For sorted boundaries the composed
scatter-then-cumsum is

    out_c[j] = sum_i d_c[i] * (b[i] <= j)        (exact, mod 2**32)

which decomposes into a per-block prefix (tiny XLA searchsorted + cumsum +
gather at ``nblocks`` rows) plus a local mask-matmul on the MXU:

    limbs[r, j] = sum_i table[r, i] * (b[i] <= j)      over a 512-entry
                                                        boundary chunk

with int32 columns split into four 8-bit limbs. 0/1 masks and 0..255 limbs
are exactly representable in bf16 and per-chunk limb sums stay < 2**24, so
the TPU's DEFAULT f32-dot (which truncates inputs to bf16 —
docs/PERFORMANCE.md) is EXACT here with no multi-pass splits. Limb sums are
recombined into int32 per chunk (shifts wrap mod 2**32, matching the
integer telescoping semantics of ``binning._segment_constant``).

Layout: the boundary/limb table is built (TAB_ROWS, Np) row-major so every
chunk DMA has a 128-aligned minor dim (Mosaic rejects narrow-minor DMAs —
docs/PERFORMANCE.md), and the mask dot is the natural "nt" contraction
``dot_general((16, CI), (BJ, CI), contract dim1 x dim1) -> (16, BJ)`` —
no in-kernel relayouts anywhere. The float b row (row 0) is only read by
the VPU compare; it flows through the dot too but its output lane is
ignored (b values are NOT bf16-exact, the limbs are).
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK_I = 512  # boundary entries per DMA chunk (table slice lane width)
BLOCK_J = 1024  # output slots per grid cell
TAB_ROWS = 16  # f32 table rows: [b, 4 limbs x up to 3 columns, zero pad]
MAX_COLS = 3


def _seg_kernel(
    lo_ref, nch_ref, pref_ref,  # scalar prefetch
    tab_ref,  # (TAB_ROWS, Np) f32 in ANY/HBM
    out_ref,  # (8, BLOCK_J) i32 block
    dbuf, sem,  # scratch: (2, TAB_ROWS, CHUNK_I) f32 + 2 DMA semaphores
    *, n_cols: int,
):
    blk = pl.program_id(0)
    lo = lo_ref[blk]  # first chunk index (units of CHUNK_I)
    nc = nch_ref[blk]  # chunks to process

    def start_dma(i, slot):
        off = pl.multiple_of((lo + i) * CHUNK_I, CHUNK_I)
        pltpu.make_async_copy(
            tab_ref.at[:, pl.ds(off, CHUNK_I)], dbuf.at[slot], sem.at[slot]
        ).start()

    def wait_dma(i, slot):
        off = pl.multiple_of((lo + i) * CHUNK_I, CHUNK_I)
        pltpu.make_async_copy(
            tab_ref.at[:, pl.ds(off, CHUNK_I)], dbuf.at[slot], sem.at[slot]
        ).wait()

    @pl.when(nc > 0)
    def _():
        start_dma(0, 0)

    # Slot ids of this block as an f32 column (j < 2^21: f32-exact).
    j_col = (
        blk * BLOCK_J
        + jax.lax.broadcasted_iota(jnp.int32, (BLOCK_J, 1), 0)
    ).astype(jnp.float32)

    def body(i, acc):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nc)
        def _():
            start_dma(i + 1, 1 - slot)

        wait_dma(i, slot)
        d = dbuf[slot]  # (TAB_ROWS, CHUNK_I) f32
        # mask[j, i] = boundaries[i] <= j  (entries before this block's
        # range are all-ones — counted once, the prefix stops at lo*CHUNK_I;
        # entries after it are all-zeros — over-read chunks are harmless)
        mask = (d[0:1, :] <= j_col).astype(jnp.float32)  # (BLOCK_J, CHUNK_I)
        limbs = jax.lax.dot_general(
            d, mask, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TAB_ROWS, BLOCK_J); row 0 is garbage (non-bf16-exact b), unused
        rows = []
        for c in range(n_cols):
            v = limbs[1 + 4 * c : 2 + 4 * c, :].astype(jnp.int32)
            for l in range(1, 4):
                vl = limbs[1 + 4 * c + l : 2 + 4 * c + l, :].astype(jnp.int32)
                v = v + (vl << (8 * l))  # wraps mod 2^32 — intended
            rows.append(v)
        if n_cols < 8:
            rows.append(jnp.zeros((8 - n_cols, BLOCK_J), jnp.int32))
        return acc + jnp.concatenate(rows, axis=0)

    # prefix: contributions of all boundaries before chunk ``lo`` (scalar
    # per column, computed by the caller from an exclusive cumsum)
    acc0_rows = [
        jnp.full((1, BLOCK_J), pref_ref[blk * n_cols + c], jnp.int32)
        for c in range(n_cols)
    ]
    if n_cols < 8:
        acc0_rows.append(jnp.zeros((8 - n_cols, BLOCK_J), jnp.int32))
    acc = jax.lax.fori_loop(
        0, nc, body, jnp.concatenate(acc0_rows, axis=0)
    )
    out_ref[...] = acc


def _build_table(b_pad: jax.Array, ds_pad: Sequence[jax.Array]) -> jax.Array:
    """(TAB_ROWS, Np) f32: row 0 = boundaries (f32-exact, caller clamps),
    rows 1+4c+l = 8-bit limb l of column c (bf16-exact 0..255)."""
    rows = [b_pad.astype(jnp.float32)]
    for d in ds_pad:
        u = jax.lax.bitcast_convert_type(d, jnp.uint32)
        for l in range(4):
            rows.append(((u >> (8 * l)) & jnp.uint32(255)).astype(jnp.float32))
    while len(rows) < TAB_ROWS:
        rows.append(jnp.zeros_like(rows[0]))
    return jnp.stack(rows, axis=0)


@functools.partial(jax.jit, static_argnames=("length", "interpret"))
def segment_broadcast(
    b: jax.Array,  # (N,) int32, sorted nondecreasing, >= 0
    ds: Sequence[jax.Array],  # up to MAX_COLS (N,) int32 columns
    length: int,
    interpret: bool = False,
) -> List[jax.Array]:
    """``out_c[j] = sum_{i: b[i] <= j} ds[c][i]`` (mod 2**32) for j in
    [0, length) — the composed scatter+cumsum of ``binning`` in one pass.

    Replaces ``zeros(length+1).at[b].add(d)`` followed by
    ``_cumsum_1d(buf[:-1])`` (one XLA scatter per column, ~8.7 ns/update
    row) with one Pallas call whose cost scales with
    ``N/CHUNK_I + length/BLOCK_J`` mask-matmul chunks.
    """
    n = b.shape[0]
    n_cols = len(ds)
    assert 1 <= n_cols <= MAX_COLS
    npad = -(-max(n, 1) // CHUNK_I) * CHUNK_I
    nblocks = -(-length // BLOCK_J)
    length_pad = nblocks * BLOCK_J

    # Clamp to ``length``: entries past the last slot never contribute
    # (mask is 0 for every j < length) and the clamp keeps row 0 f32-exact
    # even when the raw boundaries exceed 2^24 (isect overflow).
    b_c = jnp.minimum(b, length).astype(jnp.int32)
    b_pad = jnp.concatenate(
        [b_c, jnp.full((npad - n,), length, jnp.int32)]
    )
    ds_pad = [
        jnp.concatenate([d.astype(jnp.int32), jnp.zeros((npad - n,), jnp.int32)])
        for d in ds
    ]
    table = _build_table(b_pad, ds_pad)

    block_starts = jnp.arange(nblocks, dtype=jnp.int32) * BLOCK_J
    lo = jnp.searchsorted(b_pad, block_starts, side="left").astype(jnp.int32)
    hi = jnp.searchsorted(
        b_pad, block_starts + BLOCK_J, side="left"
    ).astype(jnp.int32)
    lo_chunk = lo // CHUNK_I
    nch = jnp.maximum(0, -(-(hi - lo_chunk * CHUNK_I) // CHUNK_I))

    # Exclusive prefix per column at each block's (chunk-aligned) start.
    from gstk_tpu.ops.binning import _cumsum_1d

    prefs = []
    for d in ds_pad:
        cs = _cumsum_1d(d)  # inclusive, (npad,)
        k = lo_chunk * CHUNK_I
        prefs.append(jnp.where(k > 0, cs[jnp.maximum(k - 1, 0)], 0))
    pref_flat = jnp.stack(prefs, axis=-1).reshape(-1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (8, BLOCK_J), lambda i, *_: (0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, TAB_ROWS, CHUNK_I), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_seg_kernel, n_cols=n_cols),
        out_shape=jax.ShapeDtypeStruct((8, length_pad), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(lo_chunk, nch, pref_flat, table)
    return [out[c, :length] for c in range(n_cols)]


# ---------------------------------------------------------------------------
# Segment sums at sorted boundaries (the VJP per-Gaussian reduction)
# ---------------------------------------------------------------------------

SUM_JC = 512  # value columns per DMA chunk
SUM_G = 1024  # output gaussians per grid block


def _segsum_kernel(
    j0_ref, nch_ref,  # scalar prefetch: first chunk index / chunk count
    bounds_ref,  # (2, SUM_G) f32 VMEM block: rows [lo, hi)
    vals_ref,  # (rows, Np) f32 in ANY/HBM
    out_ref,  # (rows, SUM_G) f32 VMEM block
    dbuf, sem,  # scratch: (2, rows, SUM_JC) f32 + 2 DMA semaphores
    *, rows: int, terms: int,
):
    from gstk_tpu.ops.raster_pallas import _mxu_dot

    blk = pl.program_id(0)
    j0 = j0_ref[blk]
    nc = nch_ref[blk]

    def start_dma(i, slot):
        off = pl.multiple_of((j0 + i) * SUM_JC, SUM_JC)
        pltpu.make_async_copy(
            vals_ref.at[:, pl.ds(off, SUM_JC)], dbuf.at[slot], sem.at[slot]
        ).start()

    def wait_dma(i, slot):
        off = pl.multiple_of((j0 + i) * SUM_JC, SUM_JC)
        pltpu.make_async_copy(
            vals_ref.at[:, pl.ds(off, SUM_JC)], dbuf.at[slot], sem.at[slot]
        ).wait()

    @pl.when(nc > 0)
    def _():
        start_dma(0, 0)

    lo_r = bounds_ref[0:1, :]  # (1, G)
    hi_r = bounds_ref[1:2, :]

    def body(i, acc):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nc)
        def _():
            start_dma(i + 1, 1 - slot)

        wait_dma(i, slot)
        d = dbuf[slot]  # (rows, JC)
        # j index of each value column, f32-exact (j < 2^24)
        j_col = (
            (j0 + i) * SUM_JC
            + jax.lax.broadcasted_iota(jnp.int32, (SUM_JC, 1), 0)
        ).astype(jnp.float32)
        mask = (
            (j_col >= lo_r) & (j_col < hi_r)
        ).astype(jnp.float32)  # (JC, G)
        # direct masked sum on the MXU: no prefix subtraction, so no
        # cancellation between a tiny segment and a huge global prefix
        # (the failure mode the two-level prefix design mitigated).
        return acc + _mxu_dot(
            d, mask, (((1,), (0,)), ((), ())), b_exact=True, terms=terms
        )

    out_ref[...] = jax.lax.fori_loop(
        0, nc, body, jnp.zeros((rows, SUM_G), jnp.float32)
    )


@functools.partial(jax.jit, static_argnames=("interpret", "terms"))
def segment_sum_sorted(
    vals_t: jax.Array,  # (rows, Np) f32, rows % 8 == 0
    hi: jax.Array,  # (N,) int32 nondecreasing segment ends, <= Np
    interpret: bool = False,
    terms: int = 3,
) -> jax.Array:
    """``out[c, g] = sum_{hi[g-1] <= j < hi[g]} vals_t[c, j]`` (hi[-1]=0).

    The per-Gaussian gradient reduction: segments are contiguous in
    expansion order and ``hi`` (a clipped cumsum) is monotone, so each
    1024-gaussian output block touches a contiguous value range — a
    per-block masked MXU contraction replaces the former two-level
    prefix cumsum + three row-rate gathers (~9.4 ms at 1M capacity).
    ``terms``-way bf16 splitting of the values (the 0/1 mask is exact)
    gives ~f32 sums; each segment is summed DIRECTLY, avoiding the
    prefix-difference cancellation of the cumsum formulation.
    """
    rows, npv = vals_t.shape
    n = hi.shape[0]
    assert rows % 8 == 0
    nblocks = -(-n // SUM_G)
    npad_n = nblocks * SUM_G
    # pad value columns to the chunk width; padded j are masked out by
    # hi <= npv, and real (finite) values times a 0 mask are exactly 0
    npv_pad = -(-npv // SUM_JC) * SUM_JC
    if npv_pad != npv:
        vals_t = jnp.pad(vals_t, ((0, 0), (0, npv_pad - npv)))
    hi_c = jnp.minimum(hi, npv).astype(jnp.int32)
    hi_pad = jnp.pad(hi_c, (0, npad_n - n), mode="edge")
    lo_pad = jnp.concatenate([jnp.zeros((1,), jnp.int32), hi_pad[:-1]])
    bounds = jnp.stack([lo_pad, hi_pad]).astype(jnp.float32)  # (2, npad_n)

    blk = jnp.arange(nblocks, dtype=jnp.int32)
    blk_lo = lo_pad[blk * SUM_G]
    blk_hi = hi_pad[blk * SUM_G + (SUM_G - 1)]
    j0 = blk_lo // SUM_JC
    nch = jnp.maximum(0, -(-(blk_hi - j0 * SUM_JC) // SUM_JC))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((2, SUM_G), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (rows, SUM_G), lambda i, *_: (0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rows, SUM_JC), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_segsum_kernel, rows=rows, terms=terms),
        out_shape=jax.ShapeDtypeStruct((rows, npad_n), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(j0, nch, bounds, vals_t)
    return out[:, :n]
