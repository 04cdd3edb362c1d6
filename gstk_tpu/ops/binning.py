"""Tile binning: expand Gaussians to per-tile intersections and depth-sort.

TPU-native replacement for the reference's intersection pipeline
(``rasterizer/cuda/csrc/forward.cu:94-154`` map_gaussian_to_intersects /
get_tile_bin_edges plus the ``torch.sort`` + ``.item()`` host syncs in
``rasterizer/utils.py:106-185``). XLA requires static shapes, so instead of a
dynamically sized intersection list we use a fixed capacity buffer:

  1. ``num_tiles_hit`` (from projection) is cumsum'ed on device; each Gaussian
     g owning ``c_g`` consecutive slots starting at ``cum_excl[g]``.
  2. The expansion uses ``jnp.repeat(..., total_repeat_length=capacity)`` with
     an appended sentinel row so overflow/padding lanes map to an invalid
     tile id that sorts last.
  3. A single multi-operand ``jax.lax.sort`` on (tile_id, depth) keys orders
     intersections front-to-back within each tile — no 64-bit key packing
     needed (TPU-friendlier than bit-twiddled int64 keys).
  4. Per-tile [start, end) ranges come from two ``searchsorted`` calls.

Everything stays on device; there are no host round-trips in the step. If the
true intersection count exceeds ``capacity`` the farthest-sorted entries are
dropped; callers can watch ``Intersections.num_intersects`` (device scalar)
and re-trace with a larger bucket between steps.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gstk_tpu.ops.projection import tile_bbox


class Intersections(NamedTuple):
    gaussian_ids: jax.Array  # (capacity,) int32, sorted by (tile, depth); sentinel = N
    tile_ids: jax.Array  # (capacity,) int32 sorted; sentinel = num_tiles
    tile_bins: jax.Array  # (num_tiles, 2) int32 [start, end)
    num_intersects: jax.Array  # () int32 true intersection count (may exceed capacity)
    # expansion-order index of each sorted entry (pre-sort position). The
    # pre-sort order is gaussian-major ("E-order"), and because overflow
    # truncates the tail, the set of live expansion ids is always a
    # contiguous prefix — which makes sort-free per-Gaussian gradient
    # reduction possible (see rasterize._make_composite_pallas).
    expansion_ids: jax.Array  # (capacity,) int32


def _cumsum_1d(x: jax.Array) -> jax.Array:
    """Inclusive 1D cumsum, hierarchical: a long 1D scan lowers terribly on
    TPU (~50 ms at 1.4M elements); reshaping to (rows, 1024) with a lane-axis
    scan + row offsets is ~0.02 ms."""
    n = x.shape[0]
    w = 1024
    if n < 4 * w:
        return jnp.cumsum(x)
    m = n // w
    head, tail = x[: m * w], x[m * w :]
    h2 = head.reshape(m, w)
    within = jnp.cumsum(h2, axis=1)
    offs = jnp.concatenate(
        [jnp.zeros(1, x.dtype), jnp.cumsum(within[:, -1])[:-1]]
    )
    head_cs = (within + offs[:, None]).reshape(-1)
    if tail.shape[0] == 0:
        return head_cs
    tail_cs = jnp.cumsum(tail) + head_cs[-1]
    return jnp.concatenate([head_cs, tail_cs])


def _segment_constant(values, boundaries, length: int):
    """Evaluate a piecewise-constant function at every index in
    [0, length): value[i] for indices in [boundaries[i-1], boundaries[i]).

    Built from a T-element difference scatter + one hierarchical cumsum —
    both ~free — instead of a per-index table gather (TPU gathers cost
    ~8 ns/row at 1M+ indices, and even packed row-table gathers pay a
    further ~2 ms relayout extracting 1-D columns from (N,8) rows).
    Integer dtypes telescope exactly (including deliberate mod-2^32 wrap);
    for f32 values pass their ``.view(int32)`` bit patterns through and
    re-view, which is exact, rather than summing float differences.
    """
    diffs = values[1:] - values[:-1]
    buf = jnp.zeros((length + 1,), values.dtype).at[boundaries[:-1]].add(
        diffs, mode="drop"
    )
    return values[0] + _cumsum_1d(buf[:-1])


def bin_gaussians(
    xys: jax.Array,
    depths: jax.Array,
    radii: jax.Array,
    num_tiles_hit: jax.Array,
    tile_bounds: Tuple[int, int],
    block_width: int,
    capacity: int,
    segment_backend: str = "xla",
    need_expansion: bool = True,
) -> Intersections:
    """Build the sorted per-tile intersection list with a static capacity.

    Args:
        xys/depths: outputs of ``project_gaussians``.
        radii: per-Gaussian footprint half-extents — (N,) square radii
            (reference semantics) or (N, 2) per-axis tight extents
            (``projection.tight_extents``); either way ``num_tiles_hit``
            must equal the resulting bbox areas (the expansion walks
            exactly these bboxes).
        tile_bounds: (tiles_x, tiles_y) static.
        block_width: tile side in pixels (16).
        capacity: static max number of intersections kept.
        segment_backend: "xla" (portable scatter+cumsum passes),
            "pallas" / "pallas_interpret" (the sorted-boundary
            segment-broadcast kernel, ``ops/segment_kernel.py`` — one
            MXU mask-matmul call replaces all three passes; at 1M
            capacity 3.2 ms vs 28.3 ms measured on hardware). The
            kernel path covers the one-word packing branch (all banded
            configs); wider packings fall back to XLA.
    """
    n = xys.shape[0]
    num_tiles = tile_bounds[0] * tile_bounds[1]
    counts = num_tiles_hit.astype(jnp.int32)
    cum = _cumsum_1d(counts)
    total = cum[-1] if n > 0 else jnp.int32(0)
    cum_excl = cum - counts

    # Per-gaussian values broadcast to slots: gid is monotone, so every
    # per-slot quantity is piecewise-constant over [cum_excl, cum) segments
    # — a diff-scatter + hierarchical cumsum per column (_segment_constant)
    # beats both 1-D gathers (~8 ns/row) and a packed (N,8) row-table
    # gather (whose 1-D column extraction alone relayouts for ~2 ms at 1M
    # slots). Integer columns telescope exactly; depth rides its i32 bit
    # pattern (exact mod-2^32 telescoping), not float differences.
    #
    # The scatter (~1.1 ms for 131k update rows) dominates each pass, so
    # the five per-gaussian columns are bit-packed into two int32 words
    # (+ depth): cum_excl|bbox_w and tminy|tminx. Shift widths come from
    # the static tile grid; telescoping is exact mod 2^32, so unpacking
    # through uint32 logical shifts recovers the low fields even when
    # cum_excl (unbounded under overflow) wraps the word — slots < capacity
    # always belong to gaussians with cum_excl < capacity <= 2^20.
    tile_min, tile_max = tile_bbox(
        xys, radii.astype(jnp.float32), tile_bounds, block_width
    )
    bbox_w = jnp.maximum(tile_max[:, 0] - tile_min[:, 0], 1)
    bits_x = int(tile_bounds[0] + 1).bit_length()
    bits_y = int(tile_bounds[1] + 1).bit_length()
    # ``pos = j - cum_excl`` is a within-bbox offset: 0 <= pos < bbox area
    # <= num_tiles, so only the low ``bits_pos`` bits of cum_excl are ever
    # needed (two's-complement subtraction + mask recovers pos exactly)
    bits_pos = max(1, (num_tiles - 1).bit_length())
    # ...and only ceil_log2(capacity) low bits if cum_excl must stand alone
    bits_cum = max(1, (capacity - 1).bit_length())
    seg = lambda v: _segment_constant(v, cum, capacity)
    u = lambda v: jax.lax.bitcast_convert_type(v, jnp.uint32)
    s = lambda v: jax.lax.bitcast_convert_type(v, jnp.int32)
    pos_mask = (1 << bits_pos) - 1
    one_word = bits_pos + 2 * bits_x + bits_y <= 32
    use_kernel = (
        segment_backend in ("pallas", "pallas_interpret")
        and one_word
        and n > 0
    )
    gid = None
    if one_word:
        # all four columns in ONE word -> one scatter+cumsum pass (the
        # 131k-row scatter dominates each pass; up to ~4K images fit)
        packed = (
            ((cum_excl & pos_mask) << (2 * bits_x + bits_y))
            | (bbox_w << (bits_x + bits_y))
            | (tile_min[:, 1] << bits_x)
            | tile_min[:, 0]
        )
        if use_kernel:
            # All three passes (gid marks / packed word / depth bits)
            # share boundaries ``cum``: one 3-column segment-broadcast
            # kernel call. gid[j] = #{i: cum[i] <= j} is the d=1 column;
            # the value columns ride their telescoping diffs (exact mod
            # 2^32), base value added back outside.
            from gstk_tpu.ops.segment_kernel import segment_broadcast

            depth_bits = jax.lax.bitcast_convert_type(
                depths.astype(jnp.float32), jnp.int32
            )
            zero = jnp.zeros((1,), jnp.int32)
            d_pack = jnp.concatenate([packed[1:] - packed[:-1], zero])
            d_depth = jnp.concatenate(
                [depth_bits[1:] - depth_bits[:-1], zero]
            )
            gid, seg_pack, seg_depth = segment_broadcast(
                cum,
                [jnp.ones((n,), jnp.int32), d_pack, d_depth],
                capacity,
                interpret=(segment_backend == "pallas_interpret"),
            )
            p_s = u(packed[0] + seg_pack)
            depth_s = jax.lax.bitcast_convert_type(
                depth_bits[0] + seg_depth, jnp.float32
            )
        else:
            p_s = u(seg(packed))
        cum_low = s((p_s >> (2 * bits_x + bits_y)) & jnp.uint32(pos_mask))
        bw_i = s((p_s >> (bits_x + bits_y)) & jnp.uint32((1 << bits_x) - 1))
        tminy_s = s((p_s >> bits_x) & jnp.uint32((1 << bits_y) - 1))
        tminx_s = s(p_s & jnp.uint32((1 << bits_x) - 1))
        pos = (jnp.arange(capacity, dtype=jnp.int32) - cum_low) & pos_mask
    elif bits_cum + bits_x <= 32 and bits_x + bits_y <= 32:
        packed_a = (cum_excl << bits_x) | bbox_w
        packed_b = (tile_min[:, 1] << bits_x) | tile_min[:, 0]
        a_s = seg(packed_a)
        b_s = seg(packed_b)
        cum_excl_s = s((u(a_s) >> bits_x) & jnp.uint32((1 << bits_cum) - 1))
        bw_i = s(u(a_s) & jnp.uint32((1 << bits_x) - 1))
        tminy_s = s((u(b_s) >> bits_x) & jnp.uint32((1 << bits_y) - 1))
        tminx_s = s(u(b_s) & jnp.uint32((1 << bits_x) - 1))
        pos = jnp.arange(capacity, dtype=jnp.int32) - cum_excl_s
    else:  # giant image or capacity: one seg pass per column
        cum_excl_s = seg(cum_excl)
        bw_i = seg(bbox_w)
        tminy_s = seg(tile_min[:, 1])
        tminx_s = seg(tile_min[:, 0])
        pos = jnp.arange(capacity, dtype=jnp.int32) - cum_excl_s
    if gid is None:
        # Slot -> gaussian id via boundary marks + cumsum (gid of slot j =
        # #gaussians whose cumulative count <= j). Avoids jnp.repeat, whose
        # internals lower to ~7 ms 1-D gathers at 1M slots on TPU; slots
        # past the true total get gid == n (the sentinel) for free.
        marks = jnp.zeros((capacity + 1,), jnp.int32).at[cum].add(
            1, mode="drop"
        )
        gid = _cumsum_1d(marks[:-1])
    is_real = gid < n
    if not use_kernel:
        depth_s = jax.lax.bitcast_convert_type(
            seg(
                jax.lax.bitcast_convert_type(
                    depths.astype(jnp.float32), jnp.int32
                )
            ),
            jnp.float32,
        )
    # div/mod by a *variable* divisor has no TPU vector lowering (XLA
    # emulates it ~serially; ~2.2 ms at 1M lanes in step traces). pos is a
    # within-bbox offset (< bbox area) and bw a tile-bbox width — both far
    # inside f32's exact-integer range — so one f32 divide plus an exact
    # integer fixup replaces it.
    q = jnp.floor(
        pos.astype(jnp.float32) / jnp.maximum(bw_i.astype(jnp.float32), 1.0)
    ).astype(jnp.int32)
    r = pos - q * bw_i
    q = jnp.where(r < 0, q - 1, jnp.where(r >= bw_i, q + 1, q))
    r = jnp.where(r < 0, r + bw_i, jnp.where(r >= bw_i, r - bw_i, r))
    tx = tminx_s + r
    ty = tminy_s + q
    tile_id = jnp.where(is_real, ty * tile_bounds[0] + tx, num_tiles)

    depth_key = jnp.where(is_real, depth_s, jnp.inf)
    if need_expansion:
        eidx = jnp.arange(capacity, dtype=jnp.int32)
        sorted_tile, _, sorted_gid, sorted_eidx = jax.lax.sort(
            (tile_id, depth_key, gid, eidx), num_keys=2
        )
    else:
        # Forward-only consumers never invert the sort; dropping the
        # expansion-index operand saves one sort payload (~0.35 ms at
        # 786k — XLA does not DCE unused operands of a multi-output
        # sort). expansion_ids is INVALID in this mode.
        sorted_tile, _, sorted_gid = jax.lax.sort(
            (tile_id, depth_key, gid), num_keys=2
        )
        sorted_eidx = jnp.zeros((capacity,), jnp.int32)

    tile_range = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_tile, tile_range, side="left").astype(jnp.int32)
    # tiles partition the sorted array contiguously (sentinels sort last),
    # so end_t = start_{t+1}, and the last real tile ends where the
    # sentinel run begins = the number of kept real intersections — no
    # second searchsorted needed.
    n_real = jnp.minimum(total, capacity).astype(jnp.int32)
    ends = jnp.concatenate([starts[1:], n_real[None]])
    tile_bins = jnp.stack([starts, ends], axis=-1)

    return Intersections(
        gaussian_ids=sorted_gid,
        tile_ids=sorted_tile,
        tile_bins=tile_bins,
        num_intersects=total,
        expansion_ids=sorted_eidx,
    )


def expansion_positions(isect: Intersections) -> jax.Array:
    """Expansion-order -> sorted-position permutation (inverse of the
    binning sort) for the backward gradient reduction on UNPADDED ranges:
    ``out[e]`` is where expansion entry e landed in the sorted list
    (garbage for sentinel e, never read by the reduction)."""
    cap = isect.gaussian_ids.shape[0]
    _, pos = jax.lax.sort(
        (isect.expansion_ids, jnp.arange(cap, dtype=jnp.int32)), num_keys=1
    )
    return pos


def pad_tile_ranges(
    isect: Intersections, num_tiles: int, align: int, sentinel: int
) -> Intersections:
    """Re-lay the sorted intersection list so every tile's range starts at a
    multiple of ``align`` (and is ``align``-padded), with padding entries set
    to ``sentinel``.

    This gives the Pallas kernels exclusive ownership of whole ``align``-wide
    blocks per tile: chunk DMAs are aligned, and the backward kernel's
    per-intersection gradient writes are disjoint across the tile grid (the
    no-atomics requirement on TPU). Output capacity is the static
    ``capacity + num_tiles * align``.

    Implemented gather-style: each output slot finds its tile by a
    boundary-mark + cumsum (a T-element scatter and one 1D scan — both cheap)
    and then gathers its source entry. Avoids both the big-scatter
    formulation (~30 ms at 1M entries on TPU) and per-slot searchsorted
    (~150 ms).
    """
    cap = isect.gaussian_ids.shape[0]
    counts = isect.tile_bins[:, 1] - isect.tile_bins[:, 0]
    padded_counts = ((counts + align - 1) // align) * align
    cum = jnp.cumsum(padded_counts).astype(jnp.int32)
    padded_start = jnp.concatenate([jnp.zeros(1, jnp.int32), cum[:-1]])
    padded_cap = cap + num_tiles * align

    j = jnp.arange(padded_cap, dtype=jnp.int32)
    # tile_of_j = #boundaries <= j, via marks at each tile's end boundary
    marks = jnp.zeros((padded_cap + 1,), jnp.int32).at[cum].add(
        1, mode="drop"
    )
    tile_of_j = _cumsum_1d(marks[:-1])
    tile_c = jnp.clip(tile_of_j, 0, num_tiles - 1)
    rank = j - padded_start[tile_c]
    src = isect.tile_bins[tile_c, 0] + rank
    valid = (rank < counts[tile_c]) & (tile_of_j < num_tiles)
    src_c = jnp.clip(src, 0, cap - 1)
    out_gid = jnp.where(valid, isect.gaussian_ids[src_c], sentinel)
    out_tile = jnp.where(valid, tile_c, num_tiles)
    out_eidx = jnp.where(valid, isect.expansion_ids[src_c], padded_cap)
    new_bins = jnp.stack([padded_start, padded_start + counts], axis=-1)
    return Intersections(
        gaussian_ids=out_gid,
        tile_ids=out_tile,
        tile_bins=new_bins,
        num_intersects=isect.num_intersects,
        expansion_ids=out_eidx,
    )
