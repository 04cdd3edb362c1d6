"""Small math utilities shared across the framework.

TPU-native re-implementations of the helpers the reference keeps in
``gs_toolkit/utils/comms.py:69-124`` (random quats, RGB<->SH DC conversion,
OpenGL projection matrix) and quaternion math used by the projection op.
All functions are pure jnp and differentiable.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# DC spherical-harmonic basis constant (Y_0^0 = 1/(2*sqrt(pi))).
SH_C0 = 0.28209479177387814


def rgb_to_sh(rgb: jax.Array) -> jax.Array:
    """RGB in [0,1] -> 0th SH coefficient (reference: utils/comms.py:87)."""
    return (rgb - 0.5) / SH_C0


def sh_to_rgb(sh: jax.Array) -> jax.Array:
    """0th SH coefficient -> RGB in [0,1] (reference: utils/comms.py:95)."""
    return sh * SH_C0 + 0.5


def random_quats(key: jax.Array, n: int) -> jax.Array:
    """Uniformly random unit quaternions, (n, 4) wxyz.

    Same construction as the reference (utils/comms.py:69-85): Shoemake's
    subgroup algorithm from three uniforms.
    """
    u, v, w = jnp.split(jax.random.uniform(key, (n, 3)), 3, axis=-1)
    two_pi = 2.0 * math.pi
    return jnp.concatenate(
        [
            jnp.sqrt(1.0 - u) * jnp.sin(two_pi * v),
            jnp.sqrt(1.0 - u) * jnp.cos(two_pi * v),
            jnp.sqrt(u) * jnp.sin(two_pi * w),
            jnp.sqrt(u) * jnp.cos(two_pi * w),
        ],
        axis=-1,
    )


def normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def quat_to_rotmat(quat: jax.Array) -> jax.Array:
    """Unit quaternion (..., 4) in wxyz order -> rotation matrix (..., 3, 3).

    Matches the convention of the reference oracle
    (rasterizer/_torch_impl.py:116-133); quats must already be normalized.
    """
    w, x, y, z = jnp.split(quat, 4, axis=-1)
    row0 = jnp.concatenate(
        [1.0 - 2.0 * (y * y + z * z), 2.0 * (x * y - w * z), 2.0 * (x * z + w * y)],
        axis=-1,
    )
    row1 = jnp.concatenate(
        [2.0 * (x * y + w * z), 1.0 - 2.0 * (x * x + z * z), 2.0 * (y * z - w * x)],
        axis=-1,
    )
    row2 = jnp.concatenate(
        [2.0 * (x * z - w * y), 2.0 * (y * z + w * x), 1.0 - 2.0 * (x * x + y * y)],
        axis=-1,
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def projection_matrix(znear: float, zfar: float, fovx, fovy) -> jax.Array:
    """OpenGL-style perspective projection matrix (4, 4).

    Same matrix as the reference (utils/comms.py:103-124); the rasterizer uses
    ``projmat @ viewmat`` only to project means to pixels, so together with
    :func:`gstk_tpu.ops.projection.project_pix` this reproduces
    u = fx*x/z + cx - 0.5 exactly.
    """
    fovx = jnp.asarray(fovx, jnp.float32)
    fovy = jnp.asarray(fovy, jnp.float32)
    t = znear * jnp.tan(0.5 * fovy)
    r = znear * jnp.tan(0.5 * fovx)
    n, f = znear, zfar
    zero = jnp.zeros_like(fovx)
    one = jnp.ones_like(fovx)
    rows = [
        jnp.stack([n / r, zero, zero, zero]),
        jnp.stack([zero, n / t, zero, zero]),
        jnp.stack(
            [zero, zero, (f + n) / (f - n) * one, -f * n / (f - n) * one]
        ),
        jnp.stack([zero, zero, one, zero]),
    ]
    return jnp.stack(rows, axis=0)
