"""Naive numpy oracle for the full rasterization pipeline — tests only.

Independent re-derivation of the reference CUDA kernel semantics
(``rasterizer/cuda/csrc/forward.cu``, validated line-by-line against the
vendored pure-torch oracle ``rasterizer/_torch_impl.py:280-470``). Written as
explicit per-Gaussian / per-pixel loops in float64-free numpy so the
production JAX ops (:mod:`gstk_tpu.ops.projection`,
:mod:`gstk_tpu.ops.binning`, :mod:`gstk_tpu.ops.rasterize`) can be tested
against a totally separate implementation. Unvectorized and slow by design —
only run on tiny scenes in tests.

One deliberate deviation: the torch oracle's ``map_gaussian_to_intersects``
``break``s the whole loop on the first radius<=0 entry (_torch_impl.py:351),
whereas the CUDA kernel treats it per-thread as a skip (forward.cu:100); we
implement the CUDA (skip) semantics.
"""

from __future__ import annotations

import numpy as np


def quat_to_rotmat_np(quat):
    w, x, y, z = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    R = np.stack(
        [
            1 - 2 * (y * y + z * z),
            2 * (x * y - w * z),
            2 * (x * z + w * y),
            2 * (x * y + w * z),
            1 - 2 * (x * x + z * z),
            2 * (y * z - w * x),
            2 * (x * z - w * y),
            2 * (y * z + w * x),
            1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(quat.shape[:-1] + (3, 3))


def project_gaussians_np(
    means3d,
    scales,
    glob_scale,
    quats,
    viewmat,
    fullmat,
    fx,
    fy,
    cx,
    cy,
    img_height,
    img_width,
    block_width=16,
    clip_thresh=0.01,
):
    """Returns dict with xys, depths, radii, conics, compensation,
    num_tiles_hit, mask — one Gaussian at a time, straight-line math."""
    n = means3d.shape[0]
    tiles_x = (img_width + block_width - 1) // block_width
    tiles_y = (img_height + block_width - 1) // block_width
    tan_fovx = 0.5 * img_width / fx
    tan_fovy = 0.5 * img_height / fy

    xys = np.zeros((n, 2), np.float32)
    depths = np.zeros((n,), np.float32)
    radii = np.zeros((n,), np.int32)
    conics = np.zeros((n, 3), np.float32)
    comp = np.zeros((n,), np.float32)
    nth = np.zeros((n,), np.int32)
    mask = np.zeros((n,), bool)

    W = viewmat[:3, :3]
    for i in range(n):
        p_view = W @ means3d[i] + viewmat[:3, 3]
        z = p_view[2]
        is_close = z < clip_thresh

        R = quat_to_rotmat_np(quats[i])
        M = R * (glob_scale * scales[i])[None, :]
        cov3d = M @ M.T

        rz = 1.0 / z if z != 0 else 0.0
        tx = z * np.clip(p_view[0] * rz, -1.3 * tan_fovx, 1.3 * tan_fovx)
        ty = z * np.clip(p_view[1] * rz, -1.3 * tan_fovy, 1.3 * tan_fovy)
        J = np.array(
            [
                [fx * rz, 0.0, -fx * tx * rz * rz],
                [0.0, fy * rz, -fy * ty * rz * rz],
            ],
            np.float32,
        )
        T = J @ W
        cov2d = T @ cov3d @ T.T
        det_orig = cov2d[0, 0] * cov2d[1, 1] - cov2d[0, 1] ** 2
        cov2d[0, 0] += 0.3
        cov2d[1, 1] += 0.3
        det = cov2d[0, 0] * cov2d[1, 1] - cov2d[0, 1] ** 2
        comp_i = np.sqrt(max(det_orig / det, 0.0)) if det != 0 else 0.0
        det_valid = det != 0
        if det_valid:
            conic_i = (
                np.array([cov2d[1, 1], -cov2d[0, 1], cov2d[0, 0]], np.float32) / det
            )
            b = 0.5 * (cov2d[0, 0] + cov2d[1, 1])
            v1 = b + np.sqrt(max(b * b - det, 0.1))
            v2 = b - np.sqrt(max(b * b - det, 0.1))
            radius = np.ceil(3.0 * np.sqrt(max(v1, v2)))
        else:
            conic_i = np.zeros(3, np.float32)
            radius = 0.0

        ph = fullmat @ np.append(means3d[i], 1.0)
        rw = 1.0 / (ph[3] + 1e-6)
        u = 0.5 * img_width * ph[0] * rw - 0.5 + cx
        v = 0.5 * img_height * ph[1] * rw - 0.5 + cy

        tmin, tmax = _tile_bbox_np(
            np.array([u, v]), radius, (tiles_x, tiles_y), block_width
        )
        area = (tmax[0] - tmin[0]) * (tmax[1] - tmin[1])
        ok = (area > 0) and (not is_close) and det_valid
        if ok:
            xys[i] = (u, v)
            depths[i] = z
            radii[i] = np.int32(radius)
            conics[i] = conic_i
            comp[i] = comp_i
            nth[i] = area
            mask[i] = True
    return dict(
        xys=xys,
        depths=depths,
        radii=radii,
        conics=conics,
        compensation=comp,
        num_tiles_hit=nth,
        mask=mask,
    )


def _tile_bbox_np(xy, radius, tile_bounds, block_width):
    tc = xy / block_width
    tr = radius / block_width
    tl = np.trunc(tc - tr).astype(np.int64)
    br = np.trunc(tc + tr).astype(np.int64) + 1
    tmin = (
        np.clip(tl[0], 0, tile_bounds[0]),
        np.clip(tl[1], 0, tile_bounds[1]),
    )
    tmax = (
        np.clip(br[0], 0, tile_bounds[0]),
        np.clip(br[1], 0, tile_bounds[1]),
    )
    return tmin, tmax


def bin_gaussians_np(xys, depths, radii, tile_bounds, block_width):
    """Sorted (tile, depth) intersection list; returns (gaussian_ids, tile_ids,
    tile_bins)."""
    entries = []
    for i in range(xys.shape[0]):
        if radii[i] <= 0:
            continue
        tmin, tmax = _tile_bbox_np(xys[i], float(radii[i]), tile_bounds, block_width)
        for ty in range(tmin[1], tmax[1]):
            for tx in range(tmin[0], tmax[0]):
                entries.append((ty * tile_bounds[0] + tx, depths[i], i))
    entries.sort(key=lambda e: (e[0], e[1]))
    num_tiles = tile_bounds[0] * tile_bounds[1]
    tile_ids = np.array([e[0] for e in entries], np.int32).reshape(-1)
    gids = np.array([e[2] for e in entries], np.int32).reshape(-1)
    tile_bins = np.zeros((num_tiles, 2), np.int32)
    for t in range(num_tiles):
        tile_bins[t, 0] = np.searchsorted(tile_ids, t, side="left")
        tile_bins[t, 1] = np.searchsorted(tile_ids, t, side="right")
    return gids, tile_ids, tile_bins


def rasterize_np(
    img_height,
    img_width,
    gaussian_ids_sorted,
    tile_bins,
    xys,
    conics,
    colors,
    opacities,
    background,
    block_width=16,
):
    """Per-pixel front-to-back compositing, CUDA semantics
    (forward.cu:278-395): alpha clamp 0.999, skip sigma<0 and alpha<1/255,
    break when next_T <= 1e-4. Returns (img, final_T)."""
    tiles_x = (img_width + block_width - 1) // block_width
    channels = colors.shape[1]
    img = np.zeros((img_height, img_width, channels), np.float32)
    final_t = np.ones((img_height, img_width), np.float32)
    for i in range(img_height):
        for j in range(img_width):
            tile = (i // block_width) * tiles_x + (j // block_width)
            s, e = tile_bins[tile]
            t_run = 1.0
            acc = np.zeros(channels, np.float32)
            for idx in range(s, e):
                g = gaussian_ids_sorted[idx]
                dx = xys[g, 0] - j
                dy = xys[g, 1] - i
                a, b, c = conics[g]
                sigma = 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy
                if sigma < 0:
                    continue
                alpha = min(0.999, opacities[g] * np.exp(-sigma))
                if alpha < 1.0 / 255.0:
                    continue
                next_t = t_run * (1 - alpha)
                if next_t <= 1e-4:
                    break
                acc += t_run * alpha * colors[g]
                t_run = next_t
            img[i, j] = acc + t_run * background
            final_t[i, j] = t_run
    return img, final_t
