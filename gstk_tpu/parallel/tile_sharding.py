"""Tile-sharded rendering: one large image across multiple devices.

The second parallelism axis beyond camera data-parallelism (SURVEY §2.10's
"tile parallelism"): for very large renders, the Gaussian set and the sorted
intersection list are replicated while the *tile grid* is sharded across the
mesh — each device composites its slice of tiles, the cheapest possible
decomposition because tiles are embarrassingly parallel after binning. The
analog of CP/ring strategies in this domain (SURVEY §5.7).

Projection + binning run replicated (they are a small fraction of the work);
only the compositing loop is sharded; per-device tile outputs are
all-gathered for assembly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gstk_tpu.ops.binning import bin_gaussians
from gstk_tpu.ops.rasterize import (
    RasterizeConfig,
    _composite_fwd_loop,
    _tiles_to_image,
)

TILE_AXIS = "tiles"


def make_tile_mesh(n_devices: int) -> Mesh:
    import numpy as np

    return Mesh(np.asarray(jax.devices()[:n_devices]), (TILE_AXIS,))


def rasterize_tile_sharded(
    xys: jax.Array,
    depths: jax.Array,
    radii: jax.Array,
    conics: jax.Array,
    num_tiles_hit: jax.Array,
    colors: jax.Array,
    opacities: jax.Array,
    img_height: int,
    img_width: int,
    mesh: Mesh,
    background: jax.Array = None,
    config: RasterizeConfig = RasterizeConfig(),
) -> Tuple[jax.Array, jax.Array]:
    """Forward rasterization with the tile grid sharded over ``mesh``.

    The tile count is padded to a multiple of the mesh size; each device runs
    the standard compositing loop over its shard. Inference/rendering path
    (no VJP — training shards over cameras instead).
    """
    bw = config.block_width
    tile_bounds = (
        (img_width + bw - 1) // bw,
        (img_height + bw - 1) // bw,
    )
    num_tiles = tile_bounds[0] * tile_bounds[1]
    n_dev = mesh.shape[TILE_AXIS]
    pad_tiles = (-num_tiles) % n_dev

    isect = bin_gaussians(
        xys, depths, radii, num_tiles_hit, tile_bounds, bw,
        config.isect_capacity,
    )
    s_xy = xys[jnp.minimum(isect.gaussian_ids, xys.shape[0] - 1)]
    gid = jnp.minimum(isect.gaussian_ids, xys.shape[0] - 1)
    s_conic = conics[gid]
    s_color = colors[gid]
    s_opac = opacities[gid]
    bins = jnp.concatenate(
        [isect.tile_bins, jnp.zeros((pad_tiles, 2), jnp.int32)], axis=0
    )
    # tile-index offset per shard so pixel coordinates stay global
    tile_offsets = jnp.arange(num_tiles + pad_tiles, dtype=jnp.int32)

    def shard_fn(bins_local, tile_idx_local):
        # local compositing over this device's tiles, with global pixel
        # coords derived from the global tile indices
        acc, final_t = _composite_shard(
            s_xy, s_conic, s_color, s_opac, bins_local, tile_idx_local,
            tile_bounds, bw, config.chunk_size,
        )
        return acc, final_t

    acc, final_t = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(TILE_AXIS), P(TILE_AXIS)),
        out_specs=(P(TILE_AXIS), P(TILE_AXIS)),
        check_vma=False,
    )(bins, tile_offsets)

    acc = acc[:num_tiles]
    final_t = final_t[:num_tiles]
    img = _tiles_to_image(acc, tile_bounds, bw, img_height, img_width)
    final_t_img = _tiles_to_image(
        final_t[..., None], tile_bounds, bw, img_height, img_width
    )[..., 0]
    if background is not None:
        img = img + final_t_img[..., None] * background
    return img, 1.0 - final_t_img


def _composite_shard(
    s_xy, s_conic, s_color, s_opac, bins_local, tile_idx, tile_bounds,
    block_width, chunk,
):
    """Per-shard compositing: like _composite_fwd_loop but pixel coordinates
    come from the global tile indices of this shard."""
    import numpy as np

    from gstk_tpu.ops.rasterize import _chunk_geometry, _keep_weights

    n_local = bins_local.shape[0]
    P_ = block_width * block_width
    ch = s_color.shape[-1]
    cap = s_xy.shape[0]
    tiles_x = tile_bounds[0]
    tx = tile_idx % tiles_x
    ty = tile_idx // tiles_x
    p = jnp.arange(P_, dtype=jnp.int32)
    px = (tx[:, None] * block_width + p[None, :] % block_width).astype(
        jnp.float32
    )
    py = (ty[:, None] * block_width + p[None, :] // block_width).astype(
        jnp.float32
    )
    start, end = bins_local[:, 0], bins_local[:, 1]
    karange = jnp.arange(chunk, dtype=jnp.int32)

    def cond(state):
        i, _, dead, _ = state
        has_entries = start + i * chunk < end
        return jnp.any(has_entries & jnp.any(~dead, axis=-1))

    def body(state):
        i, t_run, dead, acc = state
        raw_idx = start[:, None] + i * chunk + karange[None, :]
        idx = jnp.clip(raw_idx, 0, cap - 1)
        in_range = raw_idx < end[:, None]
        alpha, valid, *_ = _chunk_geometry(s_xy, s_conic, s_opac, idx, px, py)
        valid = valid & in_range[:, None, :]
        a_k, t_prev, t_next, dead = _keep_weights(t_run, dead, alpha, valid)
        acc = acc + jnp.einsum(
            "tpk,tkc->tpc", t_prev * a_k, s_color[idx],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return i + 1, t_next, dead, acc

    t0 = jnp.ones((n_local, P_), jnp.float32)
    dead0 = jnp.zeros((n_local, P_), bool)
    acc0 = jnp.zeros((n_local, P_, ch), jnp.float32)
    _, final_t, _, acc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), t0, dead0, acc0)
    )
    return acc, final_t
