"""Scene bounds: axis-aligned and oriented boxes.

Equivalent of the reference ``SceneBox`` / ``OrientedBox``
(``gs_toolkit/data/scene_box.py:15-120``), used for crop-box filtered
rendering (vanilla_gs.py:703-718) and export cropping. Pure jnp,
jit-friendly: ``within`` returns a mask instead of indices so the static-
shape render path can AND it with the alive mask.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp



class SceneBox(NamedTuple):
    """Axis-aligned box: aabb (2, 3) [min; max]."""

    aabb: jax.Array

    def within(self, points: jax.Array) -> jax.Array:
        lo, hi = self.aabb[0], self.aabb[1]
        return jnp.all((points >= lo) & (points <= hi), axis=-1)

    def get_center(self) -> jax.Array:
        return 0.5 * (self.aabb[0] + self.aabb[1])

    def get_diagonal_length(self) -> jax.Array:
        return jnp.linalg.norm(self.aabb[1] - self.aabb[0])


class OrientedBox(NamedTuple):
    """Oriented box: rotation R (3,3), translation T (3,), scale S (3,)."""

    R: jax.Array
    T: jax.Array
    S: jax.Array

    def within(self, points: jax.Array) -> jax.Array:
        """Mask of points inside the box (scene_box.py:75-100)."""
        local = (points - self.T) @ self.R  # R columns are box axes
        half = 0.5 * self.S
        return jnp.all(jnp.abs(local) <= half, axis=-1)

    @staticmethod
    def from_params(rpy: jax.Array, position: jax.Array, scale: jax.Array):
        """Build from roll/pitch/yaw (radians), center, and extents."""
        cr, sr = jnp.cos(rpy[0]), jnp.sin(rpy[0])
        cp, sp = jnp.cos(rpy[1]), jnp.sin(rpy[1])
        cy, sy = jnp.cos(rpy[2]), jnp.sin(rpy[2])
        rx = jnp.asarray([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
        ry = jnp.asarray([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
        rz = jnp.asarray([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
        return OrientedBox(R=rz @ ry @ rx, T=position, S=scale)
