"""EWA projection of 3D Gaussians to screen space — pure JAX, fully vectorized.

TPU-native equivalent of the reference CUDA projection kernels
(``rasterizer/cuda/csrc/forward.cu:13-90`` forward,
``backward.cu:305-453`` backward). On TPU this op is purely elementwise over
the N Gaussians, so XLA fusion of the vectorized jnp formulation is already
near roofline; gradients come from JAX autodiff of the same formulas (the
CUDA analytic VJPs compute identical values). All intermediate divisions are
guarded so masked-out lanes (behind camera, degenerate covariance) carry no
NaNs into the autodiff graph.

Semantics replicated exactly (validated against the ported numpy oracle in
``gstk_tpu/ops/oracle.py`` / reference ``rasterizer/_torch_impl.py:280-340``):
  * view-space clamping of means to 1.3*tan(fov) before the EWA Jacobian,
  * +0.3 px isotropic screen-space blur with antialiasing compensation
    ``sqrt(det_orig / det_blur)``,
  * conic = inverse of 2D covariance; radius = ceil(3*sqrt(max eigenvalue))
    with the ``b^2 - det`` term clamped to >= 0.1,
  * pixel projection through the full (proj @ view) matrix with +1e-6
    homogeneous epsilon and the -0.5 pixel-center offset,
  * near-plane cull at z < clip_thresh (0.01) and det != 0 validity,
  * ``num_tiles_hit`` = clamped tile-bbox area.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp



class ProjectedGaussians(NamedTuple):
    """Screen-space Gaussians. All arrays are length-N, masked lanes zeroed."""

    cov3d: jax.Array  # (N, 6) upper-triangular 3D covariance
    xys: jax.Array  # (N, 2) pixel-space centers
    depths: jax.Array  # (N,) view-space z
    radii: jax.Array  # (N,) int32 pixel radius (0 => culled)
    conics: jax.Array  # (N, 3) inverse 2D covariance (a, b, c)
    compensation: jax.Array  # (N,) antialiasing opacity compensation
    num_tiles_hit: jax.Array  # (N,) int32 tile-bbox area
    mask: jax.Array  # (N,) bool visibility


# All geometry here is component-wise (N,) arithmetic — structure-of-arrays
# style. The obvious batched formulations (einsum "nij,nkj->nik" etc.) lower
# to (N,3)/(N,3,3) dots whose 3-wide minor dims pad to 128 lanes on TPU
# (~2.5 ms each in step traces at 131k capacity, ~6 GB/s effective) and
# whose MXU passes truncate to bf16 unless forced to HIGHEST; plain VPU
# f32 elementwise ops have neither problem.


def _cov3d_components(scales, glob_scale, quats):
    """Upper-triangular components of R diag(s^2) R^T as six (N,) arrays.

    Same math as the reference's scale_rot_to_cov3d
    (rasterizer/_torch_impl.py:116-150), unrolled per component.
    """
    w, x, y, z = (quats[..., i] for i in range(4))
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    s0 = glob_scale * scales[..., 0]
    s1 = glob_scale * scales[..., 1]
    s2 = glob_scale * scales[..., 2]
    m00, m01, m02 = r00 * s0, r01 * s1, r02 * s2
    m10, m11, m12 = r10 * s0, r11 * s1, r12 * s2
    m20, m21, m22 = r20 * s0, r21 * s1, r22 * s2
    c00 = m00 * m00 + m01 * m01 + m02 * m02
    c01 = m00 * m10 + m01 * m11 + m02 * m12
    c02 = m00 * m20 + m01 * m21 + m02 * m22
    c11 = m10 * m10 + m11 * m11 + m12 * m12
    c12 = m10 * m20 + m11 * m21 + m12 * m22
    c22 = m20 * m20 + m21 * m21 + m22 * m22
    return c00, c01, c02, c11, c12, c22


def scale_rot_to_cov3d(scales: jax.Array, glob_scale, quats: jax.Array) -> jax.Array:
    """(N,3) scales, (N,4) normalized wxyz quats -> (N,3,3) covariance."""
    c00, c01, c02, c11, c12, c22 = _cov3d_components(scales, glob_scale, quats)
    return jnp.stack(
        [
            jnp.stack([c00, c01, c02], axis=-1),
            jnp.stack([c01, c11, c12], axis=-1),
            jnp.stack([c02, c12, c22], axis=-1),
        ],
        axis=-2,
    )


def _project_cov3d_ewa(
    means3d, cov, viewmat, fx, fy, tan_fovx, tan_fovy
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """EWA perspective projection of the 3D covariance.

    ``cov`` is the 6-tuple of upper-tri components. Returns (cov2d (N,3)
    upper-tri [a, b, c], compensation (N,), t (N,3) view-space position).
    """
    c00, c01, c02, c11, c12, c22 = cov
    W = viewmat[..., :3, :3]
    p = viewmat[..., :3, 3]
    mx, my, mz = (means3d[..., i] for i in range(3))
    t0 = W[0, 0] * mx + W[0, 1] * my + W[0, 2] * mz + p[0]
    t1 = W[1, 0] * mx + W[1, 1] * my + W[1, 2] * mz + p[1]
    tz = W[2, 0] * mx + W[2, 1] * my + W[2, 2] * mz + p[2]
    t = jnp.stack([t0, t1, tz], axis=-1)

    tz_safe = jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)
    rz = 1.0 / tz_safe
    lim_x = 1.3 * tan_fovx
    lim_y = 1.3 * tan_fovy
    tx = tz * jnp.clip(t0 * rz, -lim_x, lim_x)
    ty = tz * jnp.clip(t1 * rz, -lim_y, lim_y)

    rz2 = rz * rz
    # J = [[fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]]; T = J @ W (N, 2, 3)
    fxr = fx * rz
    fyr = fy * rz
    gx = fx * tx * rz2
    gy = fy * ty * rz2
    T00 = fxr * W[0, 0] - gx * W[2, 0]
    T01 = fxr * W[0, 1] - gx * W[2, 1]
    T02 = fxr * W[0, 2] - gx * W[2, 2]
    T10 = fyr * W[1, 0] - gy * W[2, 0]
    T11 = fyr * W[1, 1] - gy * W[2, 1]
    T12 = fyr * W[1, 2] - gy * W[2, 2]

    def quad(u0, u1, u2, v0, v1, v2):  # u^T cov3d v
        return (
            c00 * u0 * v0 + c11 * u1 * v1 + c22 * u2 * v2
            + c01 * (u0 * v1 + u1 * v0)
            + c02 * (u0 * v2 + u2 * v0)
            + c12 * (u1 * v2 + u2 * v1)
        )

    a = quad(T00, T01, T02, T00, T01, T02)
    b = quad(T00, T01, T02, T10, T11, T12)
    c = quad(T10, T11, T12, T10, T11, T12)

    det_orig = a * c - b * b
    a = a + 0.3
    c = c + 0.3
    det_blur = a * c - b * b
    det_blur_safe = jnp.where(jnp.abs(det_blur) < 1e-12, 1e-12, det_blur)
    compensation = jnp.sqrt(jnp.maximum(det_orig / det_blur_safe, 0.0))
    return jnp.stack([a, b, c], axis=-1), compensation, t


def _cov2d_bounds(cov2d: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Conic (inverse cov), 3-sigma pixel radius, validity from (N,3) cov2d."""
    a, b, c = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    det = a * c - b * b
    valid = det != 0.0
    det_safe = jnp.where(valid, det, 1.0)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)
    half_tr = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(half_tr * half_tr - det, 0.1))
    v_max = half_tr + disc
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(v_max, 0.0)))
    return conic, radius, valid


def project_pix(fullmat: jax.Array, means3d: jax.Array, img_wh, center) -> jax.Array:
    """Project world points through proj@view to pixel coords (N, 2).

    Matches reference helpers.cuh:114-122 / _torch_impl.py:233-244:
    u = 0.5*W*ndc_x - 0.5 + cx with homogeneous eps 1e-6.
    """
    mx, my, mz = (means3d[..., i] for i in range(3))
    F = fullmat
    ph0 = F[0, 0] * mx + F[0, 1] * my + F[0, 2] * mz + F[0, 3]
    ph1 = F[1, 0] * mx + F[1, 1] * my + F[1, 2] * mz + F[1, 3]
    pw = F[3, 0] * mx + F[3, 1] * my + F[3, 2] * mz + F[3, 3]
    rw = 1.0 / (pw + 1e-6)
    u = 0.5 * img_wh[0] * ph0 * rw - 0.5 + center[0]
    v = 0.5 * img_wh[1] * ph1 * rw - 0.5 + center[1]
    return jnp.stack([u, v], axis=-1)


def tile_bbox(xys, radius, tile_bounds, block_width):
    """Per-Gaussian tile bounding box, truncation semantics as the oracle.

    radius is float, either (N,) (square bbox, the reference semantics) or
    (N, 2) per-axis half-extents (the tight footprint from
    ``tight_extents``); returns int32 (tile_min, tile_max) each (N, 2)
    clamped to [0, tiles_x] x [0, tiles_y].
    """
    tile_center = xys / block_width
    tile_radius = radius[..., None] if radius.ndim == xys.ndim - 1 else radius
    tile_radius = tile_radius / block_width
    top_left = jnp.trunc(tile_center - tile_radius).astype(jnp.int32)
    bottom_right = jnp.trunc(tile_center + tile_radius).astype(jnp.int32) + 1
    tile_min = jnp.stack(
        [
            jnp.clip(top_left[..., 0], 0, tile_bounds[0]),
            jnp.clip(top_left[..., 1], 0, tile_bounds[1]),
        ],
        axis=-1,
    )
    tile_max = jnp.stack(
        [
            jnp.clip(bottom_right[..., 0], 0, tile_bounds[0]),
            jnp.clip(bottom_right[..., 1], 0, tile_bounds[1]),
        ],
        axis=-1,
    )
    return tile_min, tile_max


def tight_extents(conics, opacities, radii):
    """Axis-aligned half-extents (pixels, (N, 2)) of each Gaussian's
    *visible* support — the exact-output tile-culling footprint.

    The reference bins every Gaussian into a square bbox of radius
    3*sqrt(lambda_max) (``compute_cov2d_bounds``, helpers.cuh:36-59 /
    forward.cu:71-76), but the compositing loop discards entries with
    ``alpha = op * exp(-sigma) < 1/255`` (forward.cu:329-340). Any tile that
    lies entirely outside the ellipse ``{sigma <= ln(255*op)}`` therefore
    contributes exactly nothing to the image or its gradients, in both the
    forward break logic and the backward recompute. The tight footprint is
    the intersection of the reference square with that ellipse's AABB:

        half_extent_x = sqrt(2*ln(255*op) * Sigma_xx),  Sigma = conic^{-1}
        (Sigma_xx = conic_c / det, Sigma_yy = conic_a / det)

    clipped to the reference radius so the footprint only ever *shrinks*
    (we never add contributions the reference's square would have cut).
    For anisotropic splats this removes the empty minor-axis slab of the
    square; for low-opacity splats the ellipse itself shrinks (op < 1/255
    culls the Gaussian outright). Outputs and gradients are bit-equivalent
    in exact arithmetic; only the intersection list (sort / gather /
    composite work) shrinks.

    Args: conics (N, 3), opacities (N,) in [0, 1] (post-compensation),
    radii (N,) float or int (0 = culled). Returns (N, 2) float32.
    """
    op = jnp.maximum(opacities.reshape(-1), 0.0)
    sig_cut = jnp.log(jnp.maximum(255.0 * op, 1e-12))
    ca, cb, cc = conics[:, 0], conics[:, 1], conics[:, 2]
    det = jnp.maximum(ca * cc - cb * cb, 1e-24)
    s2 = jnp.maximum(2.0 * sig_cut, 0.0) / det
    # conservative f32 margin: rounding must never drop a live tile
    margin = 1.0 + 1e-4
    wx = jnp.sqrt(jnp.maximum(s2 * cc, 0.0)) * margin + 1e-3
    wy = jnp.sqrt(jnp.maximum(s2 * ca, 0.0)) * margin + 1e-3
    r = radii.astype(jnp.float32)
    # inclusive alpha cutoff (alpha >= 1/255 composites): op == 1/255
    # exactly still contributes at sigma == 0
    visible = (r > 0) & (sig_cut >= 0.0)
    ext = jnp.stack([jnp.minimum(wx, r), jnp.minimum(wy, r)], axis=-1)
    return jnp.where(visible[:, None], ext, 0.0)


def project_gaussians(
    means3d: jax.Array,
    scales: jax.Array,
    glob_scale,
    quats: jax.Array,
    viewmat: jax.Array,
    fullmat: jax.Array,
    fx,
    fy,
    cx,
    cy,
    img_height: int,
    img_width: int,
    block_width: int = 16,
    clip_thresh: float = 0.01,
) -> ProjectedGaussians:
    """Project N Gaussians to screen space.

    Args mirror the reference API (rasterizer/project_gaussians.py:12): scales
    are linear (already exp'ed), quats normalized wxyz, viewmat (4,4)
    world->camera (OpenCV convention), fullmat = projmat @ viewmat.
    """
    tile_bounds = (
        (img_width + block_width - 1) // block_width,
        (img_height + block_width - 1) // block_width,
    )
    tan_fovx = 0.5 * img_width / fx
    tan_fovy = 0.5 * img_height / fy

    cov = _cov3d_components(scales, glob_scale, quats)
    cov2d, compensation, t = _project_cov3d_ewa(
        means3d, cov, viewmat, fx, fy, tan_fovx, tan_fovy
    )
    conic, radius_f, det_valid = _cov2d_bounds(cov2d)
    xys = project_pix(fullmat, means3d, (img_width, img_height), (cx, cy))
    tile_min, tile_max = tile_bbox(xys, radius_f, tile_bounds, block_width)
    tile_area = (tile_max[..., 0] - tile_min[..., 0]) * (
        tile_max[..., 1] - tile_min[..., 1]
    )
    depths = t[..., 2]
    is_close = depths < clip_thresh
    mask = (tile_area > 0) & (~is_close) & det_valid

    zero_if_masked = lambda x: jnp.where(
        mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim)), x, 0
    )
    tri = jnp.stack(
        [cov[0], cov[1], cov[2], cov[3], cov[4], cov[5]], axis=-1
    )
    return ProjectedGaussians(
        cov3d=zero_if_masked(tri),
        xys=zero_if_masked(xys),
        depths=zero_if_masked(depths),
        radii=jnp.where(mask, radius_f, 0.0).astype(jnp.int32),
        conics=zero_if_masked(conic),
        compensation=zero_if_masked(compensation),
        num_tiles_hit=jnp.where(mask, tile_area, 0).astype(jnp.int32),
        mask=mask,
    )
