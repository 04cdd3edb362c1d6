"""Differentiable tile rasterization — TPU-native compositing in pure JAX.

This replaces the reference's CUDA tile rasterizer
(``rasterizer/cuda/csrc/forward.cu:278-395`` forward,
``backward.cu:133-303`` backward) with a fully on-device, static-shape JAX
formulation designed for the TPU memory/compute model:

* Front-to-back alpha compositing is expressed as an **exclusive cumprod of
  (1 - alpha) + a chunk matmul** ``(pixels, K) @ (K, channels)`` — the weight
  application runs on the MXU instead of a scalar per-pixel loop. The CUDA
  early-``break`` (stop permanently when a composited entry would push T
  <= 1e-4) is replicated *exactly* with a carried per-pixel ``dead`` flag
  plus an in-chunk cumulative-or over break events (see ``_keep_weights``).
* All tiles advance together through depth-sorted chunks inside one
  ``lax.while_loop`` whose trip count adapts to the fullest live tile —
  no host syncs, no dynamic shapes.
* The backward pass is a custom VJP (no autodiff through the loop): a second
  front-to-back sweep recomputes alphas chunk-by-chunk (the memory-saving
  recompute trick of ``backward.cu``, re-derived for forward order using
  ``suffix = out_fg - prefix``) and accumulates per-Gaussian gradients with a
  ``segment_sum`` per chunk — TPUs have no atomics, so gradient accumulation
  is a sorted segmented reduction instead of CUDA's warp-level atomicAdd
  (``backward.cu:283-300``).

Alpha semantics match the reference forward kernel: clamp at 0.999, skip
``sigma < 0`` and ``alpha < 1/255``, terminate at ``T <= 1e-4``
(forward.cu:329-356). The clamp's gradient gate (no opacity/position gradient
through a clamped alpha) is applied in the VJP.
"""

from __future__ import annotations

import dataclasses
import os as _os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gstk_tpu.ops.binning import bin_gaussians

_ALPHA_CLAMP = 0.999
_ALPHA_CUTOFF = 1.0 / 255.0
# Wide-layout pack emits the half-byte 3-plane bf16 table (exact f32
# recovery in-kernel). Module-level toggle for A/B debugging on hardware.
_BF16_WIDE_PACK = True
# fwd->bwd saved-transpose handoff (see _forward); A/B toggle.
_T_HANDOFF = True
_T_CUTOFF = 1e-4
# Backward reduction reorder: "col" (attr-major column gather, default)
# vs "pack8" (8 sorted entries per 128-lane row -> fast-path row gather +
# lane-group select). Measured r5 (docs/PERFORMANCE.md "gather
# threshold"): the pack8 GATHER itself is 2.5x faster (3.56 -> 1.41 ms
# at bench scale) but XLA re-lays the 128-lane gather output to
# attr-major for the segment kernel (copy 1.2 + select 0.53 + packing
# transpose 1.1 ms), netting ~zero END-TO-END at both bench and 1M
# operating points (21.86 vs 21.89 M rays/s; 13.77 vs 13.76). Kept as an
# env A/B because the balance is layout-assignment-dependent.
_REORDER_PACK8 = _os.environ.get("GSTK_REORDER", "col") == "pack8"


@dataclasses.dataclass(frozen=True)
class RasterizeConfig:
    """Static rasterizer knobs (hashable; changing them retraces)."""

    block_width: int = 16  # tile side in pixels (matches reference config.h)
    chunk_size: int = 32  # Gaussians composited per loop step per tile
    isect_capacity: int = 1 << 19  # static intersection buffer length
    # backend: "auto" = Pallas kernels on TPU, pure-JAX loops elsewhere;
    # "jax" / "pallas" force; "pallas_interpret" runs the kernels in the
    # Pallas interpreter (CPU testing).
    backend: str = "auto"
    # Exact-output tile culling: bin each Gaussian into the AABB of its
    # visible ellipse {sigma <= ln(255*op)} intersected with the
    # reference's 3-sigma square (projection.tight_extents) instead of the
    # square alone. Tiles dropped this way contribute exactly nothing to
    # the image or gradients; the intersection list (sort/gather/kernel
    # work) shrinks 30-60% on anisotropic or low-opacity scenes.
    tight_culling: bool = True
    # Horizontal band count. Each band of tile rows is binned, sorted and
    # composited independently with its own ``isect_capacity`` budget —
    # the scale-out path past the TPU sort cliff at 2^20 entries
    # (docs/PERFORMANCE.md): a 1080p/4K render or a very dense training
    # scene splits into bands instead of growing one giant sort. 0 = auto
    # (one band per ~640k pixels). Gradients sum across bands by linearity.
    bands: int = 1
    # Forward-kernel precision (Pallas path only). "exact" reproduces the
    # jax path bit-for-threshold (training default, hardware-parity
    # gated). "high" (~2^-16 alpha, ~2^-9 color — below 8-bit output
    # quantization) and "fast" (single-pass bf16 dots) trade per-chunk
    # MXU passes for render throughput; RENDER-ONLY — differentiating a
    # non-exact rasterize raises (the backward recompute is always
    # exact, so mixed precision would corrupt gradients).
    kernel_precision: str = "exact"
    # Attribute table layout for the Pallas path. "wide": entry-major
    # (cap, 128) rows — the pack gather is bandwidth-bound while the
    # per-Gaussian table stays cache-resident. "transposed": attr-major
    # (attr_rows, cap) — the pack gather is a column gather at the fixed
    # ~6.5 ns/row rate but the table build is ~free and the kernels skip
    # the per-chunk arrival transpose; wins once the per-Gaussian table
    # falls out of cache (docs/PERFORMANCE.md). "auto" switches on the
    # Gaussian count at trace time.
    attr_layout: str = "auto"
    # Forward-only mode: skip every backward-only artifact at trace time
    # (the binning sort's expansion-index payload, the inverse-
    # permutation sort). XLA does NOT dead-code-eliminate unused operands
    # of a multi-output sort, so render paths pay ~0.35 ms at 786k
    # intersections without this. Differentiating a forward_only
    # rasterize raises.
    forward_only: bool = False


def _resolve_backend(config: RasterizeConfig) -> str:
    if config.backend == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "jax"
    return config.backend


def _tile_pixel_coords(tile_bounds, block_width):
    """Pixel-center coordinates for every tile: (T, P) float32 x and y."""
    tiles_x, tiles_y = tile_bounds
    t = np.arange(tiles_x * tiles_y, dtype=np.int32)
    tx, ty = t % tiles_x, t // tiles_x
    p = np.arange(block_width * block_width, dtype=np.int32)
    px_local, py_local = p % block_width, p // block_width
    px = tx[:, None] * block_width + px_local[None, :]
    py = ty[:, None] * block_width + py_local[None, :]
    return jnp.asarray(px, jnp.float32), jnp.asarray(py, jnp.float32)


def _chunk_geometry(s_xy, s_conic, s_opac, idx, px, py):
    """Per-(tile, pixel, k) alpha for one chunk of sorted intersections.

    Returns (alpha (T,P,K), valid (T,P,K) pre-transmittance validity,
    clamped (T,P,K), exp_neg_sigma, dx, dy)."""
    xy = s_xy[idx]  # (T, K, 2)
    con = s_conic[idx]  # (T, K, 3)
    op = s_opac[idx]  # (T, K)
    dx = xy[..., 0][:, None, :] - px[:, :, None]  # (T, P, K)
    dy = xy[..., 1][:, None, :] - py[:, :, None]
    ca = con[..., 0][:, None, :]
    cb = con[..., 1][:, None, :]
    cc = con[..., 2][:, None, :]
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    exp_neg = jnp.exp(-sigma)
    raw = op[:, None, :] * exp_neg
    alpha = jnp.minimum(_ALPHA_CLAMP, raw)
    valid = (sigma >= 0.0) & (alpha >= _ALPHA_CUTOFF)
    clamped = raw > _ALPHA_CLAMP
    return alpha, valid, clamped, exp_neg, dx, dy, ca, cb, cc


def _keep_weights(t_run, dead, alpha, valid):
    """Apply CUDA break semantics; returns (a_k, t_prev, t_next, dead_next).

    The CUDA loop *stops* the first time a composited entry would push
    transmittance to <= 1e-4 (forward.cu:352-356), without applying it, and
    never resumes — so the break must persist across chunks. ``dead`` is the
    carried per-pixel break flag; within a chunk, entries at or after the
    first break are masked via an inclusive cumulative-or."""
    a_eff = jnp.where(valid, alpha, 0.0)
    one_m = 1.0 - a_eff
    cp = jnp.cumprod(one_m, axis=-1)
    t_prev = t_run[..., None] * jnp.concatenate(
        [jnp.ones_like(cp[..., :1]), cp[..., :-1]], axis=-1
    )
    break_here = valid & (t_prev * one_m <= _T_CUTOFF)
    dead_incl = dead[..., None] | (jnp.cumsum(break_here, axis=-1) > 0)
    keep = valid & ~dead_incl
    a_k = jnp.where(keep, a_eff, 0.0)
    t_next = t_run * jnp.prod(1.0 - a_k, axis=-1)
    dead_next = dead | jnp.any(break_here, axis=-1)
    return a_k, t_prev, t_next, dead_next


def _composite_fwd_loop(
    s_xy, s_conic, s_color, s_opac, tile_bins, tile_bounds, block_width, chunk
):
    """Forward compositing over all tiles. Returns (acc_fg (T,P,ch), final_t
    (T,P), n_chunks)."""
    num_tiles = tile_bounds[0] * tile_bounds[1]
    P = block_width * block_width
    ch = s_color.shape[-1]
    cap = s_xy.shape[0]
    px, py = _tile_pixel_coords(tile_bounds, block_width)
    start, end = tile_bins[:, 0], tile_bins[:, 1]
    karange = jnp.arange(chunk, dtype=jnp.int32)

    def cond(state):
        i, _, dead, _ = state
        has_entries = start + i * chunk < end
        alive = jnp.any(~dead, axis=-1)
        return jnp.any(has_entries & alive)

    def body(state):
        i, t_run, dead, acc = state
        idx = jnp.clip(start[:, None] + i * chunk + karange[None, :], 0, cap - 1)
        in_range = (start[:, None] + i * chunk + karange[None, :]) < end[:, None]
        alpha, valid, _, _, _, _, _, _, _ = _chunk_geometry(
            s_xy, s_conic, s_opac, idx, px, py
        )
        valid = valid & in_range[:, None, :]
        a_k, t_prev, t_next, dead = _keep_weights(t_run, dead, alpha, valid)
        w = t_prev * a_k  # (T, P, K)
        col = s_color[idx]  # (T, K, ch)
        acc = acc + jnp.einsum(
            "tpk,tkc->tpc", w, col, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return i + 1, t_next, dead, acc

    t0 = jnp.ones((num_tiles, P), jnp.float32)
    dead0 = jnp.zeros((num_tiles, P), bool)
    acc0 = jnp.zeros((num_tiles, P, ch), jnp.float32)
    n, final_t, _, acc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), t0, dead0, acc0)
    )
    return acc, final_t, n


def _composite_bwd_loop(
    s_xy,
    s_conic,
    s_color,
    s_opac,
    s_gid,
    n_gauss,
    tile_bins,
    tile_bounds,
    block_width,
    chunk,
    acc_fg,
    g_img,
    g_final_t,
    final_t,
):
    """Backward sweep: recompute chunks front-to-back, accumulate per-Gaussian
    gradients via segment_sum (the TPU answer to CUDA's atomicAdd)."""
    num_tiles = tile_bounds[0] * tile_bounds[1]
    P = block_width * block_width
    ch = s_color.shape[-1]
    cap = s_xy.shape[0]
    px, py = _tile_pixel_coords(tile_bounds, block_width)
    start, end = tile_bins[:, 0], tile_bins[:, 1]
    karange = jnp.arange(chunk, dtype=jnp.int32)
    # Contract channels with the image cotangent once up front so the loop
    # only handles (T, P, K) tensors: <g, suffix_k> = <g, acc_fg> - <g, prefix_k>.
    g_dot_acc = jnp.einsum("tpc,tpc->tp", g_img, acc_fg)

    def cond(state):
        i, dead = state[0], state[2]
        has_entries = start + i * chunk < end
        alive = jnp.any(~dead, axis=-1)
        return jnp.any(has_entries & alive)

    def body(state):
        i, t_run, dead, g_dot_prefix, g_xy, g_conic, g_color, g_opac = state
        raw_idx = start[:, None] + i * chunk + karange[None, :]
        idx = jnp.clip(raw_idx, 0, cap - 1)
        in_range = raw_idx < end[:, None]
        alpha, valid, clamped, exp_neg, dx, dy, ca, cb, cc = _chunk_geometry(
            s_xy, s_conic, s_opac, idx, px, py
        )
        valid = valid & in_range[:, None, :]
        a_k, t_prev, t_next, dead = _keep_weights(t_run, dead, alpha, valid)
        kept = a_k > 0.0
        w = t_prev * a_k  # (T, P, K)
        col = s_color[idx]  # (T, K, ch)

        # <g, c_k> per (tile, pixel, k) — MXU batched matmul.
        g_dot_col = jnp.einsum(
            "tpc,tkc->tpk", g_img, col, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        g_dot_prefix_incl = g_dot_prefix[:, :, None] + jnp.cumsum(
            w * g_dot_col, axis=2
        )

        one_m = 1.0 - a_k
        inv_one_m = 1.0 / jnp.maximum(one_m, 1.0 - _ALPHA_CLAMP)
        # d out / d alpha_k and d final_T / d alpha_k (see module docstring).
        v_alpha = (
            t_prev * g_dot_col
            - (g_dot_acc[:, :, None] - g_dot_prefix_incl) * inv_one_m
            - g_final_t[:, :, None] * final_t[:, :, None] * inv_one_m
        )
        v_alpha = jnp.where(kept, v_alpha, 0.0)

        # d alpha / d (opacity, sigma); clamped alphas pass no gradient.
        grad_gate = kept & (~clamped)
        v_opac_pix = jnp.where(grad_gate, exp_neg * v_alpha, 0.0)
        v_sigma = jnp.where(grad_gate, -alpha * v_alpha, 0.0)

        # Reductions over pixels -> per-intersection chunk gradients.
        g_color_k = jnp.einsum(
            "tpk,tpc->tkc", w, g_img, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        g_opac_k = jnp.sum(v_opac_pix, axis=1)
        g_ca_k = jnp.sum(0.5 * dx * dx * v_sigma, axis=1)
        g_cb_k = jnp.sum(dx * dy * v_sigma, axis=1)
        g_cc_k = jnp.sum(0.5 * dy * dy * v_sigma, axis=1)
        g_x_k = jnp.sum((ca * dx + cb * dy) * v_sigma, axis=1)
        g_y_k = jnp.sum((cc * dy + cb * dx) * v_sigma, axis=1)

        gid = s_gid[idx]  # (T, K)
        seg = gid.reshape(-1)
        add = lambda buf, vals: buf + jax.ops.segment_sum(
            vals.reshape(seg.shape[0], -1), seg, num_segments=n_gauss
        ).reshape(buf.shape)
        g_xy = add(g_xy, jnp.stack([g_x_k, g_y_k], axis=-1))
        g_conic = add(g_conic, jnp.stack([g_ca_k, g_cb_k, g_cc_k], axis=-1))
        g_color = add(g_color, g_color_k)
        g_opac = add(g_opac, g_opac_k[..., None])

        g_dot_prefix = g_dot_prefix + jnp.sum(w * g_dot_col, axis=2)
        return i + 1, t_next, dead, g_dot_prefix, g_xy, g_conic, g_color, g_opac

    t0 = jnp.ones((num_tiles, P), jnp.float32)
    dead0 = jnp.zeros((num_tiles, P), bool)
    prefix0 = jnp.zeros((num_tiles, P), jnp.float32)
    zeros = lambda shape: jnp.zeros(shape, jnp.float32)
    state0 = (
        jnp.int32(0),
        t0,
        dead0,
        prefix0,
        zeros((n_gauss, 2)),
        zeros((n_gauss, 3)),
        zeros((n_gauss, ch)),
        zeros((n_gauss, 1)),
    )
    out = jax.lax.while_loop(cond, body, state0)
    g_xy, g_conic, g_color, g_opac = out[4], out[5], out[6], out[7]
    return g_xy, g_conic, g_color, g_opac[..., 0]


from gstk_tpu.ops.binning import _segment_constant  # noqa: E402 (shared)


def _make_composite_pallas(
    tile_bounds: Tuple[int, int], block_width: int, ch: int, interpret: bool,
    attr_layout: str = "auto", kernel_precision: str = "exact",
    forward_only: bool = False,
):
    """Pallas-kernel-backed compositing with the same custom-VJP contract as
    the pure-JAX path.

    Attributes live in the kernels' entry-major ``(Cp, 128)`` lane layout
    (see raster_pallas): the alignment-padding pack is two chained row
    gathers whose 128-lane rows stay row-major end to end — no transposes,
    no column-major gather pathology (docs/PERFORMANCE.md). The backward
    per-Gaussian reduction reorders the (Cp, 128) gradient rows into
    expansion (gaussian-major) order via the inverse-sort permutation
    from binning, then two-level prefix sums + boundary
    differences replace CUDA's atomicAdd (backward.cu:283-300)."""
    from gstk_tpu.ops import raster_pallas as rp

    assert block_width == 16, "Pallas rasterizer assumes 16x16 tiles"
    assert 6 + ch <= rp.ATTR_W
    used = 6 + ch
    orows = rp.out_rows(ch)

    def pack_sorted(xys, conics, colors, opacities, sorted_gids):
        """Sorted attributes (cap + CHUNK, ATTR_W) entry-major — one row
        gather from the small per-Gaussian table (no alignment padding:
        the kernels read 128-aligned blocks COVERING each tile's unpadded
        range and mask the boundary lanes, which removed an ~8 ms pack
        gather at 1M intersections). The binning sentinel gid (== n) and
        the CHUNK rows of tail slack index an all-zero table row — the
        sentinel row is appended to each COLUMN before the concat (a
        trailing row-append on the assembled (N, 128) table lowers to a
        full-table pad copy: 537 MB / 1.6 ms at 1M capacity).

        When 3 * attr_rows(ch) fits the 128 lanes, the table is emitted
        as a 3-plane bf16 split (raster_pallas.split3_bf16_table):
        EXACTLY the same f32 values after the kernels' one-pass MXU
        recombine, at HALF the gather-table and chunk-DMA bytes."""
        n = xys.shape[0]
        rows = rp.attr_rows(ch)
        zrow = lambda c: jnp.zeros((1, c), jnp.float32)
        cols = [
            jnp.concatenate([xys, zrow(2)], axis=0),
            jnp.concatenate([conics, zrow(3)], axis=0),
            jnp.concatenate([opacities[:, None], zrow(1)], axis=0),
            jnp.concatenate([colors, zrow(colors.shape[1])], axis=0),
        ]
        gid_ext = jnp.concatenate(
            [sorted_gids, jnp.full((rp.CHUNK,), n, jnp.int32)]
        )
        if _BF16_WIDE_PACK and 3 * rows <= rp.ATTR_W:
            vals = jnp.concatenate(
                cols + [jnp.zeros((n + 1, rows - used), jnp.float32)],
                axis=1,
            )  # (N + 1, rows)
            return rp.split3_bf16_table(vals)[gid_ext]
        base = jnp.concatenate(
            cols + [jnp.zeros((n + 1, rp.ATTR_W - used), jnp.float32)],
            axis=1,
        )  # (N + 1, ATTR_W)
        return base[gid_ext]

    def pack_sorted_t(xys, conics, colors, opacities, sorted_gids):
        """Transposed (attr_rows, cap + CHUNK) attr-major table: the build
        is row-stacks of already-column-contiguous projection outputs
        (~free vs the 128-lane concat's full-table write) and the kernels
        read (rows, 128) lane slices with NO arrival transpose. The pack
        gather becomes a column gather at the fixed ~6.5 ns/row rate —
        a win once the per-Gaussian wide table falls out of cache
        (large N); see RasterizeConfig.attr_layout."""
        n = xys.shape[0]
        rows = rp.attr_rows(ch)
        comps = jnp.concatenate(
            [
                xys.T, conics.T, opacities[None, :], colors.T,
                jnp.zeros((rows - used, n), jnp.float32),
            ],
            axis=0,
        )  # (rows, N)
        base_t = jnp.concatenate(
            [comps, jnp.zeros((rows, 1), jnp.float32)], axis=1
        )  # sentinel column
        gid_ext = jnp.concatenate(
            [sorted_gids, jnp.full((rp.CHUNK,), n, jnp.int32)]
        )
        return base_t[:, gid_ext]

    def _forward(xys, conics, colors, opacities, sorted_gids, tile_bins,
                 save_transposed=False):
        layout = attr_layout
        if layout == "auto":
            # The wide pack gather's per-Gaussian table (N, 128) stays
            # cache-resident (bandwidth-bound gather) up to a few hundred
            # k Gaussians; past that it turns row-latency-bound and the
            # transposed layout wins (hardware numbers in
            # docs/PERFORMANCE.md).
            layout = "transposed" if xys.shape[0] >= 400_000 else "wide"
        pack = pack_sorted_t if layout == "transposed" else pack_sorted
        attr = pack(xys, conics, colors, opacities, sorted_gids)
        # Grad-mode wide-layout forward saves its arrival transposes so
        # the bwd kernel skips its per-chunk MXU transpose (raster_pallas
        # save_transposed docs); render-only calls skip the extra output.
        # With the bf16 3-plane table the bwd re-combine is ONE MXU pass,
        # so the handoff trades an 8 KB/chunk fwd write stream (+DMA
        # waits +a cap-sized HBM buffer) against a 24 KB/chunk larger
        # bwd read + that pass — _T_HANDOFF picks the measured winner.
        save = save_transposed and layout == "wide" and _T_HANDOFF
        out = rp.composite_tiles_fwd(
            attr, tile_bins, tile_bounds, block_width, ch=ch,
            interpret=interpret, save_transposed=save,
            precision=kernel_precision,
        )
        packed, t_attr = out if save else (out, None)
        acc = packed[:, 0:ch, :].transpose(0, 2, 1)
        final_t = packed[:, ch, :]
        return acc, final_t, attr, tile_bins, packed, t_attr

    @jax.custom_vjp
    def composite(
        xys, conics, colors, opacities, sorted_gids, pos_sorted,
        tile_bins, counts,
    ):
        acc, final_t, *_ = _forward(
            xys, conics, colors, opacities, sorted_gids, tile_bins
        )
        return acc, final_t

    def fwd(
        xys, conics, colors, opacities, sorted_gids, pos_sorted,
        tile_bins, counts,
    ):
        if kernel_precision != "exact":
            raise ValueError(
                "kernel_precision="
                f"{kernel_precision!r} is render-only: the backward "
                "recompute runs at exact precision, so differentiating a "
                "non-exact forward would corrupt gradients. Use "
                "kernel_precision='exact' for training."
            )
        if forward_only:
            raise ValueError(
                "RasterizeConfig.forward_only=True skips the expansion "
                "permutation the backward reduction needs; use "
                "forward_only=False for training."
            )
        acc, final_t, attr, _, packed, t_attr = _forward(
            xys, conics, colors, opacities, sorted_gids, tile_bins,
            save_transposed=True,
        )
        cap = sorted_gids.shape[0]
        return (acc, final_t), (
            attr, tile_bins, counts, packed, pos_sorted, cap, t_attr
        )

    def bwd(res, cts):
        attr, tile_bins, counts, packed, pos_sorted, cap, t_attr = res
        g_acc, g_final_t = cts
        p = block_width * block_width
        num_tiles = tile_bounds[0] * tile_bounds[1]
        ct_packed = jnp.zeros((num_tiles, orows, p), jnp.float32)
        ct_packed = ct_packed.at[:, 0:ch, :].set(g_acc.transpose(0, 2, 1))
        ct_packed = ct_packed.at[:, ch, :].set(g_final_t)
        g_blk, side = rp.composite_tiles_bwd(
            attr, tile_bins, packed, ct_packed, tile_bounds,
            block_width, ch=ch, interpret=interpret, t_attr=t_attr,
        )  # (nb, rows, CHUNK) in-place blocks + (T, rows, CHUNK) side slabs
        # merge shared-boundary contributions: each tile's side slab adds
        # into the block containing its first entry (zeros elsewhere) —
        # a T-row scatter-add, cheap next to the former full-list padding
        head_blocks = tile_bins[:, 0] // rp.CHUNK
        g_blk = g_blk.at[head_blocks].add(side, mode="drop")
        # Per-Gaussian reduction WITHOUT scatter-add (TPU segment_sum at 1M
        # entries measured ~25 ms): reorder columns into expansion
        # (gaussian-major) order via the inverse of the binning sort
        # (binning.expansion_positions) — segments are then contiguous with
        # sorted ends hi = clip(cumsum(counts)) — and sum each segment
        # DIRECTLY with the masked-MXU segment-sum kernel
        # (ops/segment_kernel.segment_sum_sorted). This replaced a
        # two-level prefix cumsum + three row-rate gathers (~9.4 ms at 1M
        # capacity) and, unlike any prefix formulation, has no
        # tiny-segment-minus-huge-prefix cancellation at all.
        from gstk_tpu.ops.binning import _cumsum_1d
        from gstk_tpu.ops.segment_kernel import segment_sum_sorted

        rows_k = g_blk.shape[1]
        if _REORDER_PACK8 and rows_k * 8 == 128:
            # 8-pack reorder (r5): the attr-major column gather runs at
            # the fixed ~6.5 ns/row rate because its lane-padded tiled
            # table blows the ~120 MB fast-path budget
            # (docs/PERFORMANCE.md "gather threshold", r5 sweep: 128-lane
            # row gathers from <=~229k-row tables run at 1.8 ns/row).
            # Packing 8 consecutive SORTED entries per 128-lane row
            # (lanes = attr-major per entry) keeps the table at
            # cap/8 rows x 512 B — inside the fast path at every
            # operating point up to 2^21 isects — then one row gather at
            # pos//8 plus an exact 8-way lane-group select rebuilds the
            # expansion-order attr-major matrix. Bit-exact: the select
            # multiplies by literal 0/1 and each output element has
            # exactly one nonzero term.
            wide8 = g_blk.transpose(0, 2, 1).reshape(-1, 8 * rows_k)
            wide = jax.lax.optimization_barrier(wide8[pos_sorted // 8])
            lg = pos_sorted % 8
            # Entry-major select FIRST (drops 7/8 of the gathered lanes),
            # THEN transpose to attr-major — the barrier stops layout
            # assignment from hoisting the transpose above the select,
            # which materialized a full 128-lane {1,0}->{0,1} relayout of
            # the gather output (384 MB / 1.2 ms at bench scale).
            sel = sum(
                jnp.where(lg == g, 1.0, 0.0)[:, None]
                * wide[:, g * rows_k:(g + 1) * rows_k]
                for g in range(8)
            )
            g_et = jax.lax.optimization_barrier(sel).T
        else:
            # attr-major (rows, cap_alloc) compact + column gather
            g_pad = g_blk.transpose(1, 0, 2).reshape(g_blk.shape[1], -1)
            g_et = jax.lax.optimization_barrier(g_pad[:, pos_sorted])
        cum = _cumsum_1d(counts.astype(jnp.int32))
        hi = jnp.clip(cum, 0, cap)
        sums = segment_sum_sorted(
            g_et, hi, interpret=interpret, terms=2
        )  # (rows, n): row a = per-gaussian sums of gradient attr a
        # terms=2 (~2^-16): threshold-free gradient sums; one less MXU
        # pass per chunk than the exact-ish 3-term default
        int_zero = lambda x: np.zeros(x.shape, jax.dtypes.float0)
        return (
            sums[0:2, :].T,
            sums[2:5, :].T,
            sums[6:used, :].T,
            sums[5, :],
            int_zero(jnp.zeros((cap,), jnp.int32)),
            int_zero(jnp.zeros((cap,), jnp.int32)),
            int_zero(jnp.zeros((num_tiles, 2), jnp.int32)),
            int_zero(counts),
        )

    composite.defvjp(fwd, bwd)
    return composite


def _make_composite(tile_bounds: Tuple[int, int], block_width: int, chunk: int):
    """Build the custom-VJP compositing op for a static tile grid."""

    @jax.custom_vjp
    def composite(xys, conics, colors, opacities, sorted_gids, tile_bins):
        acc, final_t, _ = _composite_fwd_loop(
            xys[sorted_gids],
            conics[sorted_gids],
            colors[sorted_gids],
            opacities[sorted_gids],
            tile_bins,
            tile_bounds,
            block_width,
            chunk,
        )
        return acc, final_t

    def fwd(xys, conics, colors, opacities, sorted_gids, tile_bins):
        out = composite(xys, conics, colors, opacities, sorted_gids, tile_bins)
        return out, (xys, conics, colors, opacities, sorted_gids, tile_bins, out)

    def bwd(res, cts):
        xys, conics, colors, opacities, sorted_gids, tile_bins, (acc, final_t) = res
        g_img, g_final_t = cts
        n_gauss = xys.shape[0]
        # Clip sentinel ids (== n_gauss) into range; their gradients land on a
        # real row but are zero because sentinel entries are never in-range.
        gid = jnp.minimum(sorted_gids, n_gauss - 1)
        g_xy, g_conic, g_color, g_opac = _composite_bwd_loop(
            xys[gid],
            conics[gid],
            colors[gid],
            opacities[gid],
            gid,
            n_gauss,
            tile_bins,
            tile_bounds,
            block_width,
            chunk,
            acc,
            g_img,
            g_final_t,
            final_t,
        )
        int_zero = lambda x: np.zeros(x.shape, jax.dtypes.float0)
        return (
            g_xy,
            g_conic,
            g_color,
            g_opac,
            int_zero(sorted_gids),
            int_zero(tile_bins),
        )

    composite.defvjp(fwd, bwd)
    return composite


def _tiles_to_image(tiles, tile_bounds, block_width, img_height, img_width):
    """(T, P, ch) tile layout -> (H, W, ch) image, cropping pad tiles."""
    tiles_x, tiles_y = tile_bounds
    ch = tiles.shape[-1]
    img = tiles.reshape(tiles_y, tiles_x, block_width, block_width, ch)
    img = img.transpose(0, 2, 1, 3, 4).reshape(
        tiles_y * block_width, tiles_x * block_width, ch
    )
    return img[:img_height, :img_width]


def rasterize(
    xys: jax.Array,
    depths: jax.Array,
    radii: jax.Array,
    conics: jax.Array,
    num_tiles_hit: jax.Array,
    colors: jax.Array,
    opacities: jax.Array,
    img_height: int,
    img_width: int,
    background: Optional[jax.Array] = None,
    config: RasterizeConfig = RasterizeConfig(),
    return_info: bool = False,
):
    """Rasterize projected Gaussians to an image.

    API mirrors the reference ``rasterize_gaussians`` (rasterizer/rasterize.py:14)
    but always returns ``(img (H, W, ch), alpha (H, W))`` and accepts any
    channel count in one fused pass (the reference runs a second full
    rasterization for depth; here callers concatenate depth as a 4th channel).

    ``num_tiles_hit`` is accepted for reference-API compatibility but the
    tile footprint is recomputed internally (per band, and tightened to the
    visible-support AABB when ``config.tight_culling`` — exact-output
    culling, see ``projection.tight_extents``).

    Gradients flow to xys, conics, colors, opacities and background; binning
    is non-differentiable (as in the reference).
    """
    bw = config.block_width
    backend = _resolve_backend(config)
    if backend in ("pallas", "pallas_interpret"):
        from gstk_tpu.ops import raster_pallas as rp

        if colors.shape[-1] > rp.ATTR_W - 6:
            # One 128-lane attribute row holds up to 122 channels; wider
            # ND renders route to the portable path (the analog of the
            # reference's 3-ch vs ND kernel switch, rasterize.py:145-148,
            # but with a far higher threshold).
            backend = "jax"

    tiles_y_total = (img_height + bw - 1) // bw
    bands = config.bands
    if bands == 0:  # auto: one band per ~640k pixels
        bands = max(1, -(-img_height * img_width // 640_000))
    bands = min(bands, tiles_y_total)
    rows_per = -(-tiles_y_total // bands)

    # Tile footprints: the tight visible-support AABB (exact-output culling,
    # see projection.tight_extents) or the reference's square. ``ext`` is
    # the per-axis half-extent used consistently for per-band tile counts
    # AND inside bin_gaussians (the expansion walks exactly these bboxes).
    from gstk_tpu.ops.projection import tight_extents, tile_bbox

    radii_f = radii.astype(jnp.float32)
    if config.tight_culling:
        ext = jax.lax.stop_gradient(
            tight_extents(conics, opacities, radii_f)
        )
    else:
        ext = jnp.stack([radii_f, radii_f], axis=-1)
    ext_alive = (ext[:, 0] > 0) & (ext[:, 1] > 0)

    band_imgs, band_ts, band_isects = [], [], []
    for b in range(bands):
        r0 = b * rows_per
        rows_b = min(rows_per, tiles_y_total - r0)
        if rows_b <= 0:
            break
        y0 = r0 * bw
        band_h = min(img_height - y0, rows_b * bw)
        if bands == 1:
            xys_b = xys
        else:
            xys_b = xys - jnp.asarray([0.0, float(y0)], jnp.float32)
        tmin, tmax = tile_bbox(
            jax.lax.stop_gradient(xys_b), ext,
            (((img_width + bw - 1) // bw), rows_b), bw,
        )
        area = (tmax[:, 0] - tmin[:, 0]) * (tmax[:, 1] - tmin[:, 1])
        counts_b = jnp.where(ext_alive, area, 0).astype(jnp.int32)
        img_b, t_b, ni = _rasterize_band(
            xys_b, depths, ext, conics, counts_b, colors, opacities,
            band_h, img_width, config, backend,
        )
        band_imgs.append(img_b)
        band_ts.append(t_b)
        band_isects.append(ni)

    img = band_imgs[0] if len(band_imgs) == 1 else jnp.concatenate(
        band_imgs, axis=0
    )
    final_t_img = band_ts[0] if len(band_ts) == 1 else jnp.concatenate(
        band_ts, axis=0
    )
    if background is not None:
        img = img + final_t_img[..., None] * background
    alpha = 1.0 - final_t_img
    if return_info:
        # max over bands: the growth signal for the static capacity
        n = band_isects[0]
        for x in band_isects[1:]:
            n = jnp.maximum(n, x)
        return img, alpha, {"num_intersects": n}
    return img, alpha


def _rasterize_band(
    xys, depths, ext, conics, counts, colors, opacities,
    img_height, img_width, config, backend,
):
    """Bin + composite one horizontal band (the whole image when bands=1).

    ``xys`` are in band-local pixel coordinates; ``ext`` the (N, 2) tile
    footprint half-extents; ``counts`` the band-clipped per-Gaussian tile
    counts (consistent with ``ext``)."""
    bw = config.block_width
    tile_bounds = (
        (img_width + bw - 1) // bw,
        (img_height + bw - 1) // bw,
    )
    num_tiles = tile_bounds[0] * tile_bounds[1]
    isect = bin_gaussians(
        jax.lax.stop_gradient(xys),
        jax.lax.stop_gradient(depths),
        ext,
        counts,
        tile_bounds,
        bw,
        config.isect_capacity,
        # The segment-broadcast kernel follows the compositing backend:
        # on TPU all three binning broadcast passes collapse into one
        # MXU mask-matmul kernel call (ops/segment_kernel.py).
        segment_backend=(
            backend if backend in ("pallas", "pallas_interpret") else "xla"
        ),
        need_expansion=not config.forward_only,
    )
    if backend in ("pallas", "pallas_interpret"):
        from gstk_tpu.ops import raster_pallas as rp
        from gstk_tpu.ops.binning import expansion_positions

        if config.forward_only:
            pos_sorted = jnp.zeros(
                (config.isect_capacity,), jnp.int32
            )  # primal never reads it; grad refuses (see fwd)
        else:
            pos_sorted = expansion_positions(isect)
        composite = _make_composite_pallas(
            tile_bounds, bw, colors.shape[-1],
            interpret=(backend == "pallas_interpret"),
            attr_layout=config.attr_layout,
            kernel_precision=config.kernel_precision,
            forward_only=config.forward_only,
        )
        acc, final_t = composite(
            xys, conics, colors, opacities, isect.gaussian_ids,
            pos_sorted, isect.tile_bins, counts,
        )
    else:
        composite = _make_composite(tile_bounds, bw, config.chunk_size)
        # Sentinel-safe id array for the forward gathers.
        gid = jnp.minimum(isect.gaussian_ids, xys.shape[0] - 1)
        acc, final_t = composite(
            xys, conics, colors, opacities, gid, isect.tile_bins
        )
    img = _tiles_to_image(acc, tile_bounds, bw, img_height, img_width)
    final_t_img = _tiles_to_image(
        final_t[..., None], tile_bounds, bw, img_height, img_width
    )[..., 0]
    return img, final_t_img, isect.num_intersects
