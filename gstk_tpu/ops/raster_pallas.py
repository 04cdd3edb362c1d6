"""Pallas TPU kernels for tile compositing — the hot path.

Hand-written equivalents of the reference CUDA rasterize kernels
(``forward.cu:278-395``, ``backward.cu:133-303``), designed for the TPU
memory/compute model rather than translated:

  * The sorted intersection list is **tile-range padded** (see
    ``binning.pad_tile_ranges``) so each 16x16 tile owns whole 128-entry
    blocks: chunk DMAs are aligned and backward gradient writes are disjoint
    — TPU has no atomics, so exclusivity replaces CUDA's atomicAdd.
  * Attributes live in HBM **entry-major, 128 lanes wide**: ``(Cp, 128)``
    f32 with lanes [x, y, conic_a, conic_b, conic_c, opacity, colors...,
    0-pad]. A 128-lane minor dim keeps the upstream pack gathers row-major
    and row-contiguous (the previous 16-wide layout forced XLA into
    column-major gathers at ~20 GB/s — docs/PERFORMANCE.md) and makes chunk
    DMAs plain (128, 128) sublane slices (Mosaic rejects DMAs with 16-wide
    minor dims).
  * On arrival each chunk is transposed to attr-major (rows, 128) by one
    exact MXU contraction (a 3-term bf16 split against a selector matrix is
    exactly f32 — ``_mxu_transpose``); the compositing math then runs in
    the proven attr-rows x entry-lanes orientation: alphas form a
    (256 pixels, 128 entries) block, front-to-back compositing is an
    exclusive cumprod along lanes (log-space cumsum as a lower-triangular
    MXU matmul), and color accumulation is a (ch,128)x(256,128)^T
    contraction on the MXU.
  * The CUDA early-``break`` is replicated exactly with a carried per-pixel
    dead flag (see ``_keep``); whole-tile early exit happens at chunk
    granularity via the while-loop condition.
  * The backward kernel writes per-intersection gradients **attr-major
    compact**: ``(rows, Cp)`` with rows = roundup8(6 + ch) — an (rows, 128)
    lane-slice DMA per chunk, 8x less write traffic than entry-major
    128-lane rows, and one cheap host-side transpose re-lays it for the
    per-Gaussian reduction.

Outputs per tile are packed (T, out_rows(ch), 256): rows 0..ch-1
accumulated foreground color, row ``ch`` final transmittance. Any channel
count up to ATTR_W - 6 runs through the kernel (the reference's 3ch/ND
split, rasterize.py:145-148, is unnecessary).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ALPHA_CLAMP = 0.999
_ALPHA_CUTOFF = 1.0 / 255.0
_T_CUTOFF = 1e-4


def _bf16_split(x, terms: int):
    """Split x into ``terms`` bf16 values summing to ~x (each extra term
    adds ~8 mantissa bits; 3 terms ~ full f32)."""
    parts = []
    r = x
    for _ in range(terms - 1):
        h = r.astype(jnp.bfloat16).astype(jnp.float32)
        parts.append(h)
        r = r - h
    parts.append(r)
    return parts


def _mxu_dot(a, b, dims, a_exact=False, b_exact=False, terms=3):
    """f32 dot via bf16 multi-pass splitting on the MXU.

    TPU DEFAULT-precision f32 dots truncate inputs to bf16 (which broke
    image/gradient parity on hardware), Mosaic lowers only DEFAULT and
    HIGHEST (6-pass), and HIGHEST doubled kernel time. ``a_exact``/
    ``b_exact`` declare an operand exactly bf16-representable (the pixel
    basis and the triangular cumsum matrix are small integers, exact in
    bf16's 8-bit mantissa): the other operand splits 3-way for ~f32-exact
    results in 3 passes — needed because sigma/transmittance feed hard
    thresholds (1/255 alpha cutoff, T break) where ~2^-16 disagreement with
    the jax path flips pixels. With neither operand exact (color/gradient
    accumulations, threshold-free) a 2x2 split minus the lo*lo term gives
    ~2^-21 in 3 passes. Parity vs the jax path is hardware-verified by
    tests/test_tpu_smoke.py.
    """
    # operands are cast to bf16 explicitly so the decomposition is exact on
    # every backend (the MXU would truncate implicitly; interpret/CPU would
    # not, double-counting the lo terms)
    bf = jnp.bfloat16
    d = lambda x, y: jax.lax.dot_general(
        x.astype(bf), y.astype(bf), dims,
        preferred_element_type=jnp.float32,
    )
    if (a_exact and b_exact) or terms == 1:
        # terms == 1: single DEFAULT-precision pass (~2^-9 rel) — the
        # render-only "fast" kernel mode (never used in training).
        return d(a, b)
    if a_exact:
        parts = _bf16_split(b, terms)
        out = d(a, parts[0])
        for p in parts[1:]:
            out = out + d(a, p)
        return out
    if b_exact:
        parts = _bf16_split(a, terms)
        out = d(parts[0], b)
        for p in parts[1:]:
            out = out + d(p, b)
        return out
    a_hi, a_lo = _bf16_split(a, 2)
    b_hi, b_lo = _bf16_split(b, 2)
    return d(a_hi, b_hi) + d(a_lo, b_hi) + d(a_hi, b_lo)


CHUNK = 128  # entries per compositing chunk (= lane width)
ATTR_W = 128  # HBM attribute lanes per entry (x y ca cb cc op colors.. pad)


def attr_rows(ch: int) -> int:
    """In-kernel attr-major row count for ``ch`` channels (multiple of 8)."""
    return ((6 + ch + 7) // 8) * 8


def out_rows(ch: int) -> int:
    """Output row count for ``ch`` channels + 1 transmittance row, rounded
    to the f32 sublane tile (8)."""
    return ((ch + 1 + 7) // 8) * 8


# Back-compat aliases for older callers/tests.
OUT_ROWS = 8
ATTR_ROWS = 16


def _tiles_per_call(num_tiles: int) -> int:
    """Largest of {8, 4, 2, 1} dividing num_tiles: batching tiles into one
    grid cell amortizes the ~0.45 us per-invocation overhead (measured,
    docs/PERFORMANCE.md); an exact divisor keeps every sub-tile real (no
    padding/guard work)."""
    for tpc in (8, 4, 2):
        if num_tiles % tpc == 0:
            return tpc
    return 1


def _mxu_transpose(x, rows: int):
    """Exact f32 transpose of the first ``rows`` lanes of ``x`` (K, 128)
    -> (rows, K) via a selector-matrix MXU contraction. The selector is
    0/1 (bf16-exact); a 3-term bf16 split of ``x`` makes the product
    exactly f32 (documented in docs/PERFORMANCE.md: 3-term splits are
    exact against integer-exact operands)."""
    k = x.shape[0]
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, k), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, k), 1)
    sel = (r == c).astype(jnp.float32)  # (rows, 128) selects lane a
    # out[a, e] = sum_l sel[a, l] x[e, l]
    return _mxu_dot(sel, x, (((1,), (1,)), ((), ())), a_exact=True)


def _mxu_combine_transpose(x, rows: int):
    """Exact f32 transpose+recombine of a 3-plane bf16 chunk.

    ``x`` is (K, 128) bf16 with lanes [0:rows) = hi, [rows:2*rows) = mid,
    [2*rows:3*rows) = lo — a 3-term bf16 split of the f32 attributes
    (hi+mid+lo == the f32 value EXACTLY: each remainder has <= 8
    significant bits left, and the partial sums never exceed 24 mantissa
    bits, so f32 accumulation is order-independent and exact). One
    DEFAULT-precision MXU pass with a selector carrying THREE ones per
    row recombines and transposes in a single contraction:
    out[a, e] = sum_l sel[a, l] x[e, l] = hi[e,a] + mid[e,a] + lo[e,a].

    Replaces _mxu_transpose's 3 passes + the in-kernel _bf16_split VPU
    work, and the bf16 HBM table halves the chunk DMA bytes and the pack
    gather's table size (docs/PERFORMANCE.md round-4)."""
    k = x.shape[0]
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, ATTR_W), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, ATTR_W), 1)
    sel = ((c % rows == r) & (c < 3 * rows)).astype(jnp.bfloat16)
    return jax.lax.dot_general(
        sel, x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _trunc_to_bf16_f32(x):
    """f32 value with the low 16 mantissa bits cleared (== the f32 value
    of truncate-to-bf16). Computed by BITMASKING, not convert round-trips:
    XLA runs with --xla_allow_excess_precision and ELIDES
    ``convert_f32(convert_bf16(x))`` chains under jit, which silently
    zeroed the mid/lo planes (hardware parity caught it: 58% of pixels
    off by ~2^-9 — hi-plane-only accuracy). Bit ops cannot be
    "simplified" away."""
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jax.lax.bitcast_convert_type(
        jnp.bitwise_and(bits, jnp.int32(-65536)), jnp.float32
    )


def split3_bf16_table(vals: jax.Array) -> jax.Array:
    """(N, rows) f32 -> (N, ATTR_W) bf16 3-plane table [hi|mid|lo|0pad]
    consumed by ``_mxu_combine_transpose``.

    Truncating (not rounding) splits: each residual is exactly
    representable and shrinks by 2^-8, so hi+mid+lo reproduces the f32
    value to <= ~1 f32 ulp (2^-24 rel) with EXACT f32 partial sums, and
    each ``.astype(bfloat16)`` below converts an already-truncated value
    (no rounding, nothing for the excess-precision simplifier to
    elide)."""
    n, rows = vals.shape
    h1 = _trunc_to_bf16_f32(vals)
    r1 = vals - h1
    h2 = _trunc_to_bf16_f32(r1)
    r2 = r1 - h2
    h3 = _trunc_to_bf16_f32(r2)
    return jnp.concatenate(
        [
            h1.astype(jnp.bfloat16),
            h2.astype(jnp.bfloat16),
            h3.astype(jnp.bfloat16),
            jnp.zeros((n, ATTR_W - 3 * rows), jnp.bfloat16),
        ],
        axis=1,
    )


def _tile_origin(tile_idx, tiles_x: int, block_width: int):
    """Top-left pixel of a tile as float scalars (tile-local coordinate
    shift; keeps quadratic basis terms small for f32)."""
    tx = tile_idx % tiles_x
    ty = tile_idx // tiles_x
    return (
        (tx * block_width).astype(jnp.float32),
        (ty * block_width).astype(jnp.float32),
    )


def _pixel_basis(block_width: int):
    """Quadratic pixel basis [1, px, py, px^2, py^2, px*py] in tile-local
    coordinates: (P, 6). sigma over a chunk is then ONE MXU contraction
    (P,6)@(6,K) instead of ~8 VPU ops on (P,K) tensors; tile-local coords
    keep the quadratic terms small enough for f32."""
    p = block_width * block_width
    pix = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = (pix % block_width).astype(jnp.float32)
    py = (pix // block_width).astype(jnp.float32)
    return jnp.concatenate(
        [jnp.ones_like(px), px, py, px * px, py * py, px * py], axis=1
    ), px, py


# Forward-kernel precision modes: per-chunk MXU pass counts for the three
# split-accuracy dots (sigma basis contraction, transmittance cumsum, color
# accumulation). "exact" is the training path (hardware image+grad parity
# with the jax reference path); "high" (~2^-16 sigma, ~2^-9 color — below
# 8-bit output quantization) and "fast" (single-pass bf16 everywhere) are
# render-only modes for viewer/offline throughput. Render-only because the
# backward kernel always recomputes at exact precision — a mixed fwd/bwd
# would break the VJP's recompute contract.
_PRECISION_TERMS = {
    "exact": (3, 2, 3),  # (sigma_terms, cumsum_terms, color_terms)
    "high": (2, 2, 1),
    "fast": (2, 1, 1),
    # sigma_terms=1 was measured unusable (worst pixel 0.25): sigma's
    # constant coefficient reaches ~5, so a plain-bf16 basis contraction
    # carries ~2^-9*5 absolute sigma error -> ~5% alpha error near
    # opaque entries. terms=2 collapses both modes to max ~1e-2 /
    # mean ~4e-4 deviation (threshold-flip bounded), at 2 MXU passes.
}


def _chunk_alpha(chunk, basis, ox, oy, off, start, end, sigma_terms=3):
    """Alpha/validity for one attr-major (rows, CHUNK) chunk.

    Returns (a_eff (P,K), logm (P,K), valid, extras for bwd). Entry centers
    are shifted into tile-local coordinates; sigma = basis @ C where C packs
    the quadratic-form coefficients per entry. ``off`` is the chunk's
    128-aligned base; entries outside [start, end) (the tile's unpadded
    range — boundary blocks are shared between tiles) are masked out."""
    x = chunk[0:1, :] - ox
    y = chunk[1:2, :] - oy
    ca = chunk[2:3, :]
    cb = chunk[3:4, :]
    cc = chunk[4:5, :]
    op = chunk[5:6, :]
    c0 = 0.5 * (ca * x * x + cc * y * y) + cb * x * y
    c1 = -(ca * x + cb * y)
    c2 = -(cc * y + cb * x)
    coeffs = jnp.concatenate(
        [c0, c1, c2, 0.5 * ca, 0.5 * cc, cb], axis=0
    )  # (6, K)
    sigma = _mxu_dot(
        basis, coeffs, (((1,), (0,)), ((), ())), a_exact=True,
        terms=sigma_terms,
    )  # (P, K)
    exp_neg = jnp.exp(-sigma)
    raw = op * exp_neg
    alpha = jnp.minimum(raw, _ALPHA_CLAMP)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    in_range = ((off + lane) >= start) & ((off + lane) < end)
    valid = (sigma >= 0.0) & (alpha >= _ALPHA_CUTOFF) & in_range
    a_eff = jnp.where(valid, alpha, 0.0)
    logm = jnp.log1p(-a_eff)
    return a_eff, logm, valid, (x, y, ca, cb, cc, op, raw, alpha)


def _cumsum_lanes(x, exact=False, terms=3, exclusive=False):
    """Cumsum along the lane axis (axis=1) via a triangular ones matmul on
    the MXU — Pallas TPU has no cumsum lowering, and a (P,K)x(K,K)
    contraction is effectively free next to the alpha math. ``exact`` marks
    x itself bf16-exact (e.g. 0/1 break events): one MXU pass. ``terms=2``
    (~2^-16) suits threshold-free summands. ``exclusive`` uses the strictly
    lower triangle (entry j sums entries < j): the EXCLUSIVE transmittance
    prefix comes out directly, replacing a (P,K) VPU divide by 1 - alpha
    with a multiply (docs/PERFORMANCE.md round-4)."""
    k = x.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    tri = ((row < col) if exclusive else (row <= col)).astype(jnp.float32)
    return _mxu_dot(
        x, tri, (((1,), (0,)), ((), ())), a_exact=exact, b_exact=True,
        terms=terms,
    )


def _keep(t_run, dead, a_eff, logm, valid, cumsum_terms=2):
    """Break-semantics masking with a persistent per-pixel break flag.

    Returns (a_k, t_prev, log prod(1-a_k), dead_next). The CUDA loop breaks
    permanently the first time a composited entry would push T <= 1e-4
    (forward.cu:352-356); ``dead`` is a carried float (0/1) mask — float so
    all reductions stay on the VPU (no boolean reduce lowering needed)."""
    # 2-term split (~2^-16): the jax parity path computes transmittance by
    # a different algorithm (cumprod vs exp-sum-log) whose disagreement
    # already exceeds this, and T-threshold flips only gate contributions
    # below the 1e-4 cutoff. The STRICT triangle gives the exclusive
    # prefix directly: t_prev needs no (P,K) divide by 1 - a_eff (the
    # divide measured ~2 VPU passes; t_incl is one multiply instead).
    cs_ex = _cumsum_lanes(logm, terms=cumsum_terms, exclusive=True)
    t_prev = t_run * jnp.exp(cs_ex)
    t_incl = t_prev * (1.0 - a_eff)
    # The cumulative-or over in-chunk break events IS a plain threshold
    # test: t_incl never increases along lanes (logm <= 0) and only valid
    # entries decrease it, so "some entry at or before j broke" is exactly
    # "t_incl_j <= cutoff" — no in-chunk MXU scan needed, no (P,K)
    # cumulative-max, and the chunk's break flag is just the LAST lane's
    # threshold test (monotonicity again) — the former broke/dead_incl
    # tensors and the (P,K)->(P,1) max-reduce were ~5 redundant VPU
    # passes per chunk.
    keep = valid & (t_incl > _T_CUTOFF) & (dead < 0.5)
    a_k = jnp.where(keep, a_eff, 0.0)
    log_dec = jnp.sum(jnp.where(keep, logm, 0.0), axis=1, keepdims=True)
    # min over lanes == the last lane under monotonicity, but a native
    # lane reduction; a [:, -1:] lane SLICE is a cross-lane relayout
    # (~0.3 us/op, tools/ablate_fwd.py) and measured slower
    t_min = jnp.min(t_incl, axis=1, keepdims=True)
    dead_next = jnp.maximum(
        dead, jnp.where(t_min <= _T_CUTOFF, 1.0, 0.0)
    )
    return a_k, t_prev, log_dec, dead_next


def _attr_dma_helpers(attr_ref, chunk_vmem, sem, mode):
    """Chunk DMA start/wait for the attribute layouts.

    "wide" (entry-major): ``attr_ref`` is (cap_alloc, ATTR_W); a chunk is
    a 128-row sublane slice, transposed to attr-major on arrival by one
    MXU contraction. "transposed" (attr-major): ``attr_ref`` is (rows,
    cap_alloc); a chunk is a 128-lane minor slice arriving attr-major
    directly (no MXU transpose) — used above the capacity threshold where
    the entry-major pack gather turns row-latency bound
    (docs/PERFORMANCE.md). "blocked": ``attr_ref`` is (nb, rows, CHUNK)
    attr-major blocks — the forward kernel's saved arrival transposes,
    consumed by the backward kernel so it never re-pays the transpose.
    ``mode`` may be a legacy bool (True == "transposed")."""
    if mode is True:
        mode = "transposed"
    elif mode is False:
        mode = "wide"

    def src_at(off):
        if mode == "transposed":
            return attr_ref.at[:, pl.ds(off, CHUNK)]
        if mode == "blocked":
            return attr_ref.at[off // CHUNK]
        return attr_ref.at[pl.ds(off, CHUNK)]

    def make_dma(b0):
        def start_dma(i, slot):
            off = pl.multiple_of((b0 + i) * CHUNK, CHUNK)
            pltpu.make_async_copy(
                src_at(off), chunk_vmem.at[slot], sem.at[slot]
            ).start()

        def wait_dma(i, slot):
            off = pl.multiple_of((b0 + i) * CHUNK, CHUNK)
            pltpu.make_async_copy(
                src_at(off), chunk_vmem.at[slot], sem.at[slot]
            ).wait()

        return start_dma, wait_dma

    def next_tile_prefetch(noff):
        pltpu.make_async_copy(
            src_at(noff), chunk_vmem.at[0], sem.at[0]
        ).start()

    return make_dma, next_tile_prefetch


def _fwd_kernel(
    bins_ref, attr_ref, out_ref, *rest,
    tiles_x: int, block_width: int, ch: int, num_tiles: int,
    tiles_per_call: int = 1, persistent_prefetch: bool = True,
    attr_transposed: bool = False, save_transposed: bool = False,
    precision: str = "exact",
):
    if save_transposed:
        tout_ref, chunk_vmem, sem, tbuf, wsem = rest
    else:
        chunk_vmem, sem = rest
    sigma_terms, cumsum_terms, color_terms = _PRECISION_TERMS[precision]
    base = pl.program_id(0) * tiles_per_call
    basis, _, _ = _pixel_basis(block_width)
    p = block_width * block_width
    rows = attr_rows(ch)

    out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    # Double-buffered chunk streaming: start chunk i+1's DMA before
    # compositing chunk i, so HBM latency hides behind the alpha math.
    make_dma, next_tile_prefetch = _attr_dma_helpers(
        attr_ref, chunk_vmem, sem, attr_transposed
    )

    def process_tile(t, sub):
        start = bins_ref[2 * t]
        end = bins_ref[2 * t + 1]
        ox, oy = _tile_origin(t, tiles_x, block_width)
        # Unpadded ranges: chunks are the 128-aligned blocks COVERING
        # [start, end); boundary blocks are shared with adjacent tiles
        # (safe: reads only, masked in _chunk_alpha).
        b0 = start // CHUNK
        n_chunks = jnp.where(
            end > start, (end + CHUNK - 1) // CHUNK - b0, 0
        )
        start_dma, wait_dma = make_dma(b0)

        if save_transposed:
            # Saved-transpose write stream: the arrival transpose (an MXU
            # contraction the backward kernel would otherwise recompute
            # per chunk) is written out as (rows, CHUNK) blocks, double-
            # buffered like the bwd gradient writes. Shared boundary
            # blocks are written by both owning tiles with IDENTICAL
            # content (the transpose is tile-independent) — benign.
            def start_write(i, slot):
                pltpu.make_async_copy(
                    tbuf.at[slot], tout_ref.at[b0 + i], wsem.at[slot]
                ).start()

            def wait_write(i, slot):
                pltpu.make_async_copy(
                    tbuf.at[slot], tout_ref.at[b0 + i], wsem.at[slot]
                ).wait()

        if persistent_prefetch:
            # Cross-tile pipelining: VMEM scratch persists across grid
            # cells on the (single-core) TPU, so every tile prefetches the
            # NEXT tile's chunk 0 on exit (see tail below) and only tile 0
            # cold-starts its own — otherwise the first DMA's latency is
            # exposed once per tile. (A multi-core grid split would break
            # the handoff at core boundaries; v5e has one core per chip.)
            @pl.when(jnp.logical_and(t == 0, n_chunks > 0))
            def _():
                start_dma(0, 0)
        else:
            # interpret mode: scratch does not persist across cells
            @pl.when(n_chunks > 0)
            def _():
                start_dma(0, 0)

        def cond(c):
            i, _, dead = c
            return jnp.logical_and(i < n_chunks, jnp.min(dead) < 0.5)

        def body(c):
            i, t_run, dead = c
            slot = jax.lax.rem(i, 2)
            # prefetch the next chunk; the last iteration issues nothing
            # (the former clamped re-read wasted one DMA per tile)
            @pl.when(i + 1 < n_chunks)
            def _():
                start_dma(i + 1, 1 - slot)
            wait_dma(i, slot)
            off = (b0 + i) * CHUNK
            if attr_transposed:
                chunk = chunk_vmem[slot]
            elif chunk_vmem.dtype == jnp.bfloat16:
                chunk = _mxu_combine_transpose(chunk_vmem[slot], rows)
            else:
                chunk = _mxu_transpose(chunk_vmem[slot], rows)
            # (rows, K) exact f32 in all three arrival modes
            if save_transposed:
                @pl.when(i >= 2)
                def _():
                    wait_write(i - 2, slot)
                tbuf[slot] = chunk
                start_write(i, slot)
            a_eff, logm, valid, _ = _chunk_alpha(
                chunk, basis, ox, oy, off, start, end,
                sigma_terms=sigma_terms,
            )
            a_k, t_prev, log_dec, dead = _keep(
                t_run, dead, a_eff, logm, valid,
                cumsum_terms=cumsum_terms,
            )
            w = t_prev * a_k  # (P, K)
            colors = chunk[6 : 6 + ch, :]  # (ch, K)
            contrib = _mxu_dot(
                colors, w, (((1,), (1,)), ((), ())), terms=color_terms
            )  # (ch, P)
            out_ref[sub, 0:ch, :] += contrib
            return i + 1, t_run * jnp.exp(log_dec), dead

        t0 = jnp.ones((p, 1), jnp.float32)
        dead0 = jnp.zeros((p, 1), jnp.float32)
        i_done, t_final, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), t0, dead0)
        )
        # drain: only an early exit leaves a prefetched read outstanding
        # (read i_done, issued by iteration i_done - 1); a run to
        # completion waited every read it issued
        @pl.when(i_done < n_chunks)
        def _():
            wait_dma(i_done, jax.lax.rem(i_done, 2))
        if save_transposed:
            # drain the last two saved-transpose writes before the next
            # tile reuses the buffers
            @pl.when(i_done >= 1)
            def _():
                wait_write(i_done - 1, jax.lax.rem(i_done - 1, 2))

            @pl.when(i_done >= 2)
            def _():
                wait_write(i_done - 2, jax.lax.rem(i_done - 2, 2))
        if persistent_prefetch:
            # hand chunk 0 of the next (non-empty) tile onward — to the
            # next sub-tile of this invocation or to the next invocation
            nstart = bins_ref[jnp.minimum(2 * (t + 1), 2 * num_tiles - 2)]
            nend = bins_ref[jnp.minimum(2 * (t + 1) + 1, 2 * num_tiles - 1)]

            @pl.when(jnp.logical_and(t + 1 < num_tiles, nend > nstart))
            def _():
                noff = pl.multiple_of((nstart // CHUNK) * CHUNK, CHUNK)
                next_tile_prefetch(noff)
        return t_final

    # Multiple tiles per invocation amortize the per-grid-cell overhead
    # (~0.45 us/cell measured); tiles_per_call always divides num_tiles
    # (chosen by composite_tiles_fwd).
    t_finals = [
        process_tile(base + sub, sub) for sub in range(tiles_per_call)
    ]
    # ONE (P, tpc) -> (tpc, P) relayout per grid cell instead of a
    # (P, 1) -> (1, P) relayout per tile: the cross-sublane shuffle costs
    # ~0.31 us per OP regardless of width (tools/ablate_fwd.py device
    # ablation) — batching it across the cell's sub-tiles removes ~40% of
    # the per-tile fixed cost.
    tf = (
        t_finals[0]
        if tiles_per_call == 1
        else jnp.concatenate(t_finals, axis=1)
    )  # (P, tpc)
    tft = tf.T  # (tpc, P)
    for sub in range(tiles_per_call):
        out_ref[sub, ch : ch + 1, :] = tft[sub : sub + 1, :]


@functools.partial(
    jax.jit,
    static_argnames=(
        "tile_bounds", "block_width", "ch", "interpret", "save_transposed",
        "precision",
    ),
)
def composite_tiles_fwd(
    s_attr: jax.Array,  # (Cp, ATTR_W) entry-major OR (rows, Cp) attr-major
    tile_bins: jax.Array,  # (T, 2) int32, CHUNK-aligned starts
    tile_bounds: Tuple[int, int],
    block_width: int = 16,
    ch: int = 4,
    interpret: bool = False,
    save_transposed: bool = False,
    precision: str = "exact",
):
    """Returns (T, out_rows(ch), P) packed [colors rows, final_t row];
    with ``save_transposed`` also the (nb, rows, CHUNK) arrival
    transposes of every processed chunk (the bwd kernel consumes them and
    skips its own per-chunk MXU transpose — wide layout only; unprocessed
    blocks hold garbage that the bwd never reads, since it early-exits at
    exactly the same chunk as the fwd).

    The attribute layout is inferred from ``s_attr``'s shape: entry-major
    (Cp, ATTR_W) rows, or attr-major (attr_rows(ch), Cp) — the transposed
    table used above the pack-gather capacity threshold."""
    num_tiles = tile_bounds[0] * tile_bounds[1]
    p = block_width * block_width
    orows = out_rows(ch)
    rows = attr_rows(ch)
    tpc = _tiles_per_call(num_tiles)
    transposed = s_attr.shape[0] == attr_rows(ch) and s_attr.shape[1] > ATTR_W
    if transposed:
        save_transposed = False  # chunks already arrive attr-major
    kernel = functools.partial(
        _fwd_kernel, tiles_x=tile_bounds[0], block_width=block_width, ch=ch,
        num_tiles=num_tiles, tiles_per_call=tpc,
        persistent_prefetch=not interpret, attr_transposed=transposed,
        save_transposed=save_transposed, precision=precision,
    )
    chunk_shape = (
        (2, attr_rows(ch), CHUNK) if transposed else (2, CHUNK, ATTR_W)
    )
    scratch = [
        pltpu.VMEM(chunk_shape, s_attr.dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    out_specs = pl.BlockSpec(
        (tpc, orows, p), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((num_tiles, orows, p), jnp.float32)
    if save_transposed:
        nb = s_attr.shape[0] // CHUNK
        scratch += [
            pltpu.VMEM((2, rows, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        out_specs = (out_specs, pl.BlockSpec(memory_space=pl.ANY))
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((nb, rows, CHUNK), jnp.float32),
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles // tpc,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
        **(
            dict(compiler_params=pltpu.CompilerParams(has_side_effects=True))
            if save_transposed
            else {}
        ),
    )(tile_bins.reshape(-1), s_attr)
    return out


def _bwd_kernel(
    bins_ref, attr_ref, fwd_ref, ct_ref, gzero_ref, szero_ref,
    gout_ref, side_ref,
    chunk_vmem, gtile_vmem, sem, wsem,
    *, tiles_x: int, block_width: int, ch: int, num_tiles: int,
    tiles_per_call: int = 1, persistent_prefetch: bool = True,
    attr_mode: str = "wide",
):
    """Backward sweep: recompute chunks front-to-back, write
    per-intersection gradients attr-major as (rows, CHUNK) blocks.

    Ranges are UNPADDED, so a boundary block is shared between adjacent
    tiles. Write ownership keeps everything race-free without atomics: a
    tile writes IN PLACE (``gout_ref`` (nb, rows, CHUNK)) exactly the
    blocks whose first entry it owns — out-of-range lanes carry zero
    gradients — and its contributions to a block owned by the previous
    tile go to its per-tile side slab (``side_ref`` (T, rows, CHUNK)),
    merged by one small scatter-add outside the kernel. This replaces the
    former alignment-padding of the whole intersection list (an ~8 ms
    pack gather per step at 1M intersections).

    fwd_ref/ct_ref blocks are (tiles_per_call, out_rows, P): forward
    outputs [acc_fg rows, final_t row] and cotangents [g_img rows,
    g_final_t row]; ``tiles_per_call`` tiles run per grid cell to
    amortize invocation overhead.
    """
    base = pl.program_id(0) * tiles_per_call
    basis, _, _ = _pixel_basis(block_width)
    p = block_width * block_width
    rows = attr_rows(ch)
    inv_floor = 1.0 - _ALPHA_CLAMP
    # Per-pixel scalars g.acc and g_T*T for ALL sub-tiles through ONE
    # (2*tpc, P) -> (P, 2*tpc) relayout: the cross-sublane shuffle costs
    # ~0.31 us per OP regardless of width (tools/ablate_fwd.py), so the
    # former two per-tile (1,P)->(P,1) reshapes dominated the bwd per-tile
    # fixed cost; per-sub (P,1) lane slices of the batched result are free.
    prods = []
    for sub in range(tiles_per_call):
        g_img = ct_ref[sub, 0:ch, :]
        acc_fg = fwd_ref[sub, 0:ch, :]
        prods.append(jnp.sum(g_img * acc_fg, axis=0, keepdims=True))
        prods.append(ct_ref[sub, ch : ch + 1, :] * fwd_ref[sub, ch : ch + 1, :])
    ppt = jnp.concatenate(prods, axis=0).T  # (P, 2*tpc)
    for sub in range(tiles_per_call):
        _bwd_tile(
            base + sub, sub,
            bins_ref, attr_ref, fwd_ref, ct_ref, gout_ref, side_ref,
            chunk_vmem, gtile_vmem, sem, wsem,
            basis, p, rows, inv_floor,
            ppt[:, 2 * sub : 2 * sub + 1],
            ppt[:, 2 * sub + 1 : 2 * sub + 2],
            tiles_x=tiles_x, block_width=block_width, ch=ch,
            num_tiles=num_tiles, persistent_prefetch=persistent_prefetch,
            attr_mode=attr_mode,
        )


def _bwd_tile(
    t, sub,
    bins_ref, attr_ref, fwd_ref, ct_ref, gout_ref, side_ref,
    chunk_vmem, gtile_vmem, sem, wsem,
    basis, p, rows, inv_floor,
    g_dot_acc, gt_tf,  # (P, 1) per-pixel scalars, batched by the caller
    *, tiles_x, block_width, ch, num_tiles, persistent_prefetch,
    attr_mode="wide",
):
    start = bins_ref[2 * t]
    end = bins_ref[2 * t + 1]
    ox, oy = _tile_origin(t, tiles_x, block_width)

    g_img = ct_ref[sub, 0:ch, :]  # (ch, P)

    b0 = start // CHUNK
    n_chunks = jnp.where(
        end > start, (end + CHUNK - 1) // CHUNK - b0, 0
    )
    # chunk 0 goes to this tile's side slab when its block's first entry
    # belongs to the previous tile (shared boundary block)
    head_side = (start % CHUNK) != 0

    def _in_place(i):
        return jnp.logical_or(i > 0, jnp.logical_not(head_side))

    # Double-buffered read + write streams: chunk i+1's read overlaps chunk
    # i's math, and each gradient write drains while the next two chunks
    # compute (waited only when its buffer is about to be reused).
    make_dma, next_tile_prefetch = _attr_dma_helpers(
        attr_ref, chunk_vmem, sem, attr_mode
    )
    start_read, wait_read = make_dma(b0)

    def start_write(i, slot):
        @pl.when(_in_place(i))
        def _():
            pltpu.make_async_copy(
                gtile_vmem.at[slot], gout_ref.at[b0 + i], wsem.at[slot]
            ).start()

        @pl.when(jnp.logical_not(_in_place(i)))
        def _():
            pltpu.make_async_copy(
                gtile_vmem.at[slot], side_ref.at[t], wsem.at[slot]
            ).start()

    def wait_write(i, slot):
        @pl.when(_in_place(i))
        def _():
            pltpu.make_async_copy(
                gtile_vmem.at[slot], gout_ref.at[b0 + i], wsem.at[slot]
            ).wait()

        @pl.when(jnp.logical_not(_in_place(i)))
        def _():
            pltpu.make_async_copy(
                gtile_vmem.at[slot], side_ref.at[t], wsem.at[slot]
            ).wait()

    def cond(c):
        i, _, dead, _ = c
        return jnp.logical_and(i < n_chunks, jnp.min(dead) < 0.5)

    if persistent_prefetch:
        # Cross-tile pipelining (same trick as the forward kernel): VMEM
        # scratch persists across grid cells on the single-core chip, so
        # each tile prefetches the NEXT tile's chunk 0 on exit and only
        # tile 0 cold-starts its own — otherwise the first read DMA's
        # latency is exposed once per tile.
        @pl.when(jnp.logical_and(t == 0, n_chunks > 0))
        def _():
            start_read(0, 0)
    else:
        # interpret mode: scratch does not persist across cells
        @pl.when(n_chunks > 0)
        def _():
            start_read(0, 0)

    def body(c):
        i, t_run, dead, g_prefix = c
        slot = jax.lax.rem(i, 2)
        # prefetch the next chunk; the last iteration issues nothing
        @pl.when(i + 1 < n_chunks)
        def _():
            start_read(i + 1, 1 - slot)
        wait_read(i, slot)
        off = (b0 + i) * CHUNK
        if attr_mode != "wide":
            chunk = chunk_vmem[slot]
        elif chunk_vmem.dtype == jnp.bfloat16:
            chunk = _mxu_combine_transpose(chunk_vmem[slot], rows)
        else:
            chunk = _mxu_transpose(chunk_vmem[slot], rows)
        # (rows, K) exact f32 in all arrival modes
        a_eff, logm, valid, extras = _chunk_alpha(
            chunk, basis, ox, oy, off, start, end
        )
        x, y, ca, cb, cc, op, raw, alpha = extras
        a_k, t_prev, log_dec, dead_next = _keep(t_run, dead, a_eff, logm, valid)
        kept = a_k > 0.0
        w = t_prev * a_k  # (P, K)
        colors = chunk[6 : 6 + ch, :]  # (ch, K)

        g_dot_col = _mxu_dot(
            g_img, colors, (((0,), (0,)), ((), ()))
        )  # (P, K)
        # threshold-free (pure gradient magnitude): 2 passes suffice
        g_prefix_incl = g_prefix + _cumsum_lanes(w * g_dot_col, terms=2)
        inv_one_m = 1.0 / jnp.maximum(1.0 - a_k, inv_floor)
        v_alpha = (
            t_prev * g_dot_col
            - (g_dot_acc - g_prefix_incl) * inv_one_m
            - gt_tf * inv_one_m
        )
        v_alpha = jnp.where(kept, v_alpha, 0.0)
        gate = kept & (raw <= _ALPHA_CLAMP)
        v_sigma = jnp.where(gate, -a_eff * v_alpha, 0.0)

        # Pixel reductions via quadratic moments: one MXU contraction
        # basis^T @ v_sigma gives [S, S px, S py, S px^2, S py^2, S px py];
        # every conic/position/opacity gradient is a per-entry (1, K)
        # combination of these (dx = x - px in tile-local coords, and
        # v_opac = exp(-sigma) v_alpha = -v_sigma / opacity).
        g_colors = _mxu_dot(
            g_img, w, (((1,), (0,)), ((), ()))
        )  # (ch, K)
        # terms=3 kept deliberately: a terms=2 variant (one fewer MXU
        # pass) measured reproducibly ~0.25 ms SLOWER end to end on
        # hardware — Mosaic scheduling, not arithmetic, dominates here.
        m = _mxu_dot(
            basis, v_sigma, (((0,), (0,)), ((), ())), a_exact=True
        )  # (6, K)
        m0 = m[0:1, :]
        m1x = m[1:2, :]
        m1y = m[2:3, :]
        m2xx = m[3:4, :]
        m2yy = m[4:5, :]
        m2xy = m[5:6, :]
        s_dx = x * m0 - m1x
        s_dy = y * m0 - m1y
        s_dx2 = x * x * m0 - 2.0 * x * m1x + m2xx
        s_dy2 = y * y * m0 - 2.0 * y * m1y + m2yy
        s_dxdy = x * y * m0 - x * m1y - y * m1x + m2xy
        g_x = ca * s_dx + cb * s_dy
        g_y = cc * s_dy + cb * s_dx
        g_ca = 0.5 * s_dx2
        g_cb = s_dxdy
        g_cc = 0.5 * s_dy2
        g_op = -m0 / jnp.maximum(op, 1e-12)

        # reuse of this write buffer: wait for the write issued 2 chunks ago
        @pl.when(i >= 2)
        def _():
            wait_write(i - 2, slot)
        gtile_vmem[slot] = jnp.concatenate(
            [g_x, g_y, g_ca, g_cb, g_cc, g_op, g_colors,
             jnp.zeros((rows - 6 - ch, CHUNK), jnp.float32)],
            axis=0,
        )  # (rows, K)
        start_write(i, slot)

        # Exact f32 VPU reduce for the cross-chunk carry (NOT the terms=2
        # cumsum's last lane): the carry compounds over every chunk of a
        # dense tile and feeds the cancellation-sensitive suffix term
        # (g_dot_acc - g_prefix_incl), so it stays full-precision while
        # the within-chunk cumsum keeps its cheap 2-term split.
        g_prefix = g_prefix + jnp.sum(w * g_dot_col, axis=1, keepdims=True)
        return i + 1, t_run * jnp.exp(log_dec), dead_next, g_prefix

    t0 = jnp.ones((p, 1), jnp.float32)
    dead0 = jnp.zeros((p, 1), jnp.float32)
    gp0 = jnp.zeros((p, 1), jnp.float32)
    i_done, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), t0, dead0, gp0)
    )

    # drain: an early exit leaves read i_done outstanding (issued by
    # iteration i_done - 1); a run to completion waited every read
    @pl.when(i_done < n_chunks)
    def _():
        wait_read(i_done, jax.lax.rem(i_done, 2))

    if persistent_prefetch:
        # hand chunk 0 of the next (non-empty) tile onward (to the next
        # sub-tile or the next invocation); empty tiles receive no prefetch
        # (they never wait), keeping the semaphore balanced — same
        # discipline as the forward kernel
        nstart = bins_ref[jnp.minimum(2 * (t + 1), 2 * num_tiles - 2)]
        nend = bins_ref[jnp.minimum(2 * (t + 1) + 1, 2 * num_tiles - 1)]

        @pl.when(jnp.logical_and(t + 1 < num_tiles, nend > nstart))
        def _():
            noff = pl.multiple_of((nstart // CHUNK) * CHUNK, CHUNK)
            next_tile_prefetch(noff)

    @pl.when(i_done >= 1)
    def _():
        wait_write(i_done - 1, jax.lax.rem(i_done - 1, 2))

    @pl.when(i_done >= 2)
    def _():
        wait_write(i_done - 2, jax.lax.rem(i_done - 2, 2))

    # Un-written blocks need no in-kernel zero-fill: the gout/side output
    # buffers are input_output_aliased to zero arrays (composite_tiles_bwd),
    # so early-exited tiles' remaining owned blocks and non-boundary tiles'
    # side slabs are already zero. The former zero-fill loop serialized one
    # start+wait DMA per remaining block AND one per non-head-side tile
    # (~thousands of exposed DMA latencies per pass on early-exit scenes).


@functools.partial(
    jax.jit, static_argnames=("tile_bounds", "block_width", "ch", "interpret")
)
def composite_tiles_bwd(
    s_attr: jax.Array,  # (cap_alloc, ATTR_W), cap_alloc multiple of CHUNK
    tile_bins: jax.Array,  # (T, 2) unpadded [start, end)
    fwd_packed: jax.Array,  # (T, out_rows, P)
    ct_packed: jax.Array,  # (T, out_rows, P)
    tile_bounds: Tuple[int, int],
    block_width: int = 16,
    ch: int = 4,
    interpret: bool = False,
    t_attr: jax.Array = None,  # (nb, rows, CHUNK) saved fwd transposes
) -> Tuple[jax.Array, jax.Array]:
    """Per-intersection gradients, attr-major blocks.

    Returns (gout (nb, rows, CHUNK), side (T, rows, CHUNK)): the final
    per-entry gradient for block b is ``gout[b] + sum(side[t] for tiles t
    whose range starts inside block b)`` — the caller merges with one
    scatter-add (see rasterize._make_composite_pallas).

    ``t_attr`` (from ``composite_tiles_fwd(save_transposed=True)``): the
    fwd kernel's saved arrival transposes — the bwd then reads (rows,
    CHUNK) blocks directly and skips its own per-chunk MXU transpose
    (and 8x of the chunk read bytes). Wide layout only."""
    num_tiles = tile_bounds[0] * tile_bounds[1]
    p = block_width * block_width
    rows = attr_rows(ch)
    transposed = s_attr.shape[0] == rows and s_attr.shape[1] > ATTR_W
    cp = s_attr.shape[1] if transposed else s_attr.shape[0]
    orows = fwd_packed.shape[1]
    tpc = _tiles_per_call(num_tiles)
    if transposed:
        attr_mode = "transposed"
    elif t_attr is not None:
        attr_mode = "blocked"
        s_attr = t_attr
    else:
        attr_mode = "wide"
    kernel = functools.partial(
        _bwd_kernel, tiles_x=tile_bounds[0], block_width=block_width, ch=ch,
        num_tiles=num_tiles, tiles_per_call=tpc,
        persistent_prefetch=not interpret, attr_mode=attr_mode,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles // tpc,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (tpc, orows, p), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tpc, orows, p), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # gout zero-init (aliased)
            pl.BlockSpec(memory_space=pl.ANY),  # side zero-init (aliased)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (2, CHUNK, ATTR_W) if attr_mode == "wide"
                else (2, rows, CHUNK),
                s_attr.dtype,
            ),
            pltpu.VMEM((2, rows, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # Outputs alias pre-zeroed inputs: blocks the kernel never writes
    # (early-exited tiles, non-boundary side slabs) must read as zero for
    # the per-Gaussian reduction; a memset-speed zeros array beats the
    # former serialized in-kernel zero-fill DMAs by miles.
    gout_zero = jnp.zeros((cp // CHUNK, rows, CHUNK), jnp.float32)
    side_zero = jnp.zeros((num_tiles, rows, CHUNK), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((cp // CHUNK, rows, CHUNK), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, rows, CHUNK), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        tile_bins.reshape(-1), s_attr, fwd_packed, ct_packed,
        gout_zero, side_zero,
    )
