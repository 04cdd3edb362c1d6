"""Learned camera-pose refinement (SE(3) / SO(3)xR3 deltas).

TPU-native equivalent of ``CameraOptimizer``
(``gs_toolkit/cameras/camera_optimizers.py:22-150``): a (num_cameras, 6)
tangent-space embedding, exp-mapped and composed onto each camera's c2w. The
reference registers a ``camera_opt`` Adam group (lr 1e-3, exp-decay to 5e-5;
method_configs.py:75-80) but its splat models never call ``apply_to_camera``
— a latent capability. Here it is functional and optional: pass the params
into the train step and compose with :func:`apply_to_camera`.
"""

from __future__ import annotations

import dataclasses
from typing import Literal

import jax
import jax.numpy as jnp

from gstk_tpu.core.cameras import Camera


@dataclasses.dataclass(frozen=True)
class CameraOptConfig:
    """Reference CameraOptimizerConfig (camera_optimizers.py:22-40) +
    its Adam group (method_configs.py:75-80)."""

    mode: Literal["off", "SO3xR3", "SE3"] = "off"
    trans_l2_penalty: float = 1e-2
    rot_l2_penalty: float = 1e-3
    lr: float = 1e-3
    lr_final: float = 5e-5
    max_steps: int = 30_000


def _safe_norm(x, axis=-1, keepdims=False):
    """Norm with a finite gradient at 0 (jnp.linalg.norm backward is 0/0
    there; the zero-initialized adjustments sit exactly at that point)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + 1e-24)


def init_camera_opt(num_cameras: int) -> jax.Array:
    """Zero pose adjustments: (num_cameras, 6) [translation, so3 tangent]."""
    return jnp.zeros((num_cameras, 6), jnp.float32)


def pose_regularizer(adjustments: jax.Array, cfg: CameraOptConfig) -> jax.Array:
    """L2 pose penalty over all cameras (camera_optimizers.py:125-133)."""
    return (
        jnp.mean(_safe_norm(adjustments[:, :3]))
        * cfg.trans_l2_penalty
        + jnp.mean(_safe_norm(adjustments[:, 3:]))
        * cfg.rot_l2_penalty
    )


def exp_map_so3xr3(tangent: jax.Array) -> jax.Array:
    """(.., 6) [t, omega] -> (.., 3, 4) with R = exp(omega), independent t."""
    t = tangent[..., :3]
    omega = tangent[..., 3:]
    theta = _safe_norm(omega, keepdims=True)
    theta_safe = jnp.maximum(theta, 1e-8)
    axis = omega / theta_safe
    k = _skew(axis)
    s = jnp.sin(theta)[..., None]
    c = jnp.cos(theta)[..., None]
    eye = jnp.broadcast_to(jnp.eye(3), k.shape)
    big = eye + s * k + (1.0 - c) * (k @ k)
    # small-angle fallback: I + skew(omega)
    small = eye + _skew(omega)
    R = jnp.where((theta > 1e-6)[..., None], big, small)
    return jnp.concatenate([R, t[..., None]], axis=-1)


def exp_map_se3(tangent: jax.Array) -> jax.Array:
    """(.., 6) [rho, omega] -> (.., 3, 4) full SE(3) exponential."""
    rho = tangent[..., :3]
    omega = tangent[..., 3:]
    theta = _safe_norm(omega, keepdims=True)
    theta_safe = jnp.maximum(theta, 1e-8)
    axis = omega / theta_safe
    k = _skew(axis)
    s = jnp.sin(theta)[..., None]
    c = jnp.cos(theta)[..., None]
    eye = jnp.broadcast_to(jnp.eye(3), k.shape)
    R_big = eye + s * k + (1.0 - c) * (k @ k)
    V_big = (
        eye
        + ((1.0 - c) / theta_safe[..., None]) * k
        + ((theta[..., None] - s) / theta_safe[..., None]) * (k @ k)
    )
    R_small = eye + _skew(omega)
    V_small = eye + 0.5 * _skew(omega)
    use_big = (theta > 1e-6)[..., None]
    R = jnp.where(use_big, R_big, R_small)
    V = jnp.where(use_big, V_big, V_small)
    t = (V @ rho[..., None])[..., 0]
    return jnp.concatenate([R, t[..., None]], axis=-1)


def _skew(v: jax.Array) -> jax.Array:
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def apply_to_camera(
    camera: Camera,
    adjustment: jax.Array,
    mode: Literal["SO3xR3", "SE3", "off"] = "SO3xR3",
) -> Camera:
    """Compose a learned (6,) delta onto a camera's c2w.

    Right-multiplied (``c2w @ adj``) like the reference's
    ``apply_to_camera`` (camera_optimizers.py:110-123): the delta acts in
    the camera's local frame."""
    if mode == "off":
        return camera
    delta = (
        exp_map_so3xr3(adjustment) if mode == "SO3xR3" else exp_map_se3(adjustment)
    )
    R0 = camera.c2w[:3, :3]
    R = R0 @ delta[:3, :3]
    t = R0 @ delta[:3, 3] + camera.c2w[:3, 3]
    return camera._replace(c2w=jnp.concatenate([R, t[:, None]], axis=1))
