"""GaussianScene — the padded, static-shape Gaussian parameter pytree.

The reference stores Gaussians as a ``torch.nn.ParameterDict`` whose leading
dimension N changes on every densify/cull (vanilla_gs.py:126-174, 282-342) —
impossible under XLA's static-shape compilation model. The TPU-native design
keeps a fixed *capacity* C with an ``alive`` mask: refinement edits lanes in
place (split/dup write into free slots, cull clears the mask) so the jitted
train step never recompiles. Capacity growth is an explicit, host-side
re-padding between steps (amortized, bucketed).

Parameterization matches the reference exactly: log scales, logit opacities,
wxyz quats (normalized at use), SH features split into dc + rest.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gstk_tpu.ops.sh import num_sh_bases
from gstk_tpu.utils.math import random_quats, rgb_to_sh


class GaussianScene(NamedTuple):
    """Padded Gaussian parameters. All leading dims are the static capacity."""

    means: jax.Array  # (C, 3)
    scales: jax.Array  # (C, 3) log-scales
    quats: jax.Array  # (C, 4) wxyz (not necessarily normalized)
    features_dc: jax.Array  # (C, 3) SH degree-0 coefficients
    features_rest: jax.Array  # (C, K-1, 3) higher SH coefficients
    opacities: jax.Array  # (C, 1) logit opacities
    alive: jax.Array  # (C,) bool

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    @property
    def num_alive(self) -> jax.Array:
        return jnp.sum(self.alive.astype(jnp.int32))

    def params(self) -> Dict[str, jax.Array]:
        """The optimizable parameter dict (alive mask excluded)."""
        return {
            "means": self.means,
            "scales": self.scales,
            "quats": self.quats,
            "features_dc": self.features_dc,
            "features_rest": self.features_rest,
            "opacities": self.opacities,
        }

    def with_params(self, params: Dict[str, jax.Array]) -> "GaussianScene":
        return self._replace(**params)


def _knn_mean_dist(points: np.ndarray, k: int = 3) -> np.ndarray:
    """Mean distance to the k nearest neighbors (scale init, reference
    vanilla_gs.py:136-140 / k_nearest_sklearn:260-280)."""
    from scipy.spatial import cKDTree

    tree = cKDTree(points)
    # k+1 because the nearest neighbor of each point is itself.
    d, _ = tree.query(points, k=k + 1)
    return d[:, 1:].mean(axis=1)


def init_scene(
    key: jax.Array,
    capacity: int,
    seed_points: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    num_random: int = 50_000,
    random_scale: float = 10.0,
    sh_degree: int = 3,
    init_opacity: float = 0.1,
) -> GaussianScene:
    """Create a scene from SfM seed points (positions, rgb in [0,255]) or
    random init, padded to ``capacity``.

    Mirrors the reference ``populate_modules`` (vanilla_gs.py:126-174): kNN
    mean-distance log scales, Shoemake random quats, RGB2SH DC features,
    logit(0.1) opacities.
    """
    kq, kp, kc = jax.random.split(key, 3)
    if seed_points is not None and seed_points[0].shape[0] > 0:
        pts = np.asarray(seed_points[0], np.float32)
        rgb = np.asarray(seed_points[1], np.float32)
    else:
        pts = np.asarray(
            (jax.random.uniform(kp, (num_random, 3)) - 0.5) * random_scale,
            np.float32,
        )
        rgb = None
    n = pts.shape[0]
    if n > capacity:
        raise ValueError(f"seed points ({n}) exceed capacity ({capacity})")

    avg_dist = np.maximum(_knn_mean_dist(pts), 1e-7)
    scales = np.log(avg_dist)[:, None].repeat(3, axis=1).astype(np.float32)

    dim_sh = num_sh_bases(sh_degree)
    if rgb is not None:
        dc = np.asarray(rgb_to_sh(jnp.asarray(rgb / 255.0)), np.float32)
    else:
        dc = np.asarray(jax.random.uniform(kc, (n, 3)), np.float32)

    def pad(x, fill=0.0):
        out = np.full((capacity,) + x.shape[1:], fill, x.dtype)
        out[:n] = x
        return jnp.asarray(out)

    quats = np.zeros((capacity, 4), np.float32)
    quats[:, 0] = 1.0
    quats[:n] = np.asarray(random_quats(kq, n))
    alive = np.zeros((capacity,), bool)
    alive[:n] = True

    logit = float(np.log(init_opacity / (1.0 - init_opacity)))
    opac = np.full((capacity, 1), logit, np.float32)

    return GaussianScene(
        means=pad(pts),
        scales=pad(scales),
        quats=jnp.asarray(quats),
        features_dc=pad(dc),
        features_rest=jnp.zeros((capacity, dim_sh - 1, 3), jnp.float32),
        opacities=jnp.asarray(opac),
        alive=jnp.asarray(alive),
    )


def grow_scene(scene: GaussianScene, new_capacity: int) -> GaussianScene:
    """Host-side capacity growth (pad with dead lanes)."""
    assert new_capacity >= scene.capacity

    def pad(x):
        pad_width = [(0, new_capacity - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad_width)

    quats = pad(scene.quats)
    quats = quats.at[scene.capacity :, 0].set(1.0)
    return GaussianScene(
        means=pad(scene.means),
        scales=pad(scene.scales),
        quats=quats,
        features_dc=pad(scene.features_dc),
        features_rest=pad(scene.features_rest),
        opacities=pad(scene.opacities),
        alive=pad(scene.alive),
    )
