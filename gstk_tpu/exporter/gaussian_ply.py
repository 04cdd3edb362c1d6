"""Gaussian splat PLY export/import with the standard attribute layout.

Matches the reference ``ExportGaussianSplat``
(``gs_toolkit/scripts/exporter.py:83-147``): binary-little-endian PLY with
x,y,z,nx,ny,nz,f_dc_{0..2},f_rest_{...},opacity,scale_{0..2},rot_{0..3};
f_rest flattened channel-major ((N, K-1, 3) -> (N, 3*(K-1)) via transpose),
raw parameter space (log scales, logit opacities, unnormalized quats) — the
interchange format every 3DGS web viewer reads. Only alive lanes are written.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from gstk_tpu.core.gaussians import GaussianScene
from gstk_tpu.utils.io import read_ply, write_ply


def export_gaussian_ply(path, scene: GaussianScene) -> int:
    """Write alive Gaussians to a PLY. Returns the number written."""
    alive = np.asarray(scene.alive)
    xyz = np.asarray(scene.means)[alive].astype(np.float32)
    n = xyz.shape[0]
    f_dc = np.asarray(scene.features_dc)[alive].astype(np.float32)
    rest = np.asarray(scene.features_rest)[alive].astype(np.float32)
    f_rest = rest.transpose(0, 2, 1).reshape(n, -1)
    opac = np.asarray(scene.opacities)[alive].astype(np.float32)[:, 0]
    scales = np.asarray(scene.scales)[alive].astype(np.float32)
    quats = np.asarray(scene.quats)[alive].astype(np.float32)

    props = {"x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2]}
    zeros = np.zeros(n, np.float32)
    props.update({"nx": zeros, "ny": zeros.copy(), "nz": zeros.copy()})
    for i in range(3):
        props[f"f_dc_{i}"] = f_dc[:, i]
    for i in range(f_rest.shape[1]):
        props[f"f_rest_{i}"] = f_rest[:, i]
    props["opacity"] = opac
    for i in range(3):
        props[f"scale_{i}"] = scales[:, i]
    for i in range(4):
        props[f"rot_{i}"] = quats[:, i]
    write_ply(Path(path), {"vertex": props})
    return n


def load_gaussian_ply(path) -> GaussianScene:
    """Read a splat PLY back into a GaussianScene (capacity == count)."""
    import jax.numpy as jnp

    v = read_ply(path)["vertex"]
    n = len(v)
    names = v.dtype.names
    n_rest = sum(1 for p in names if p.startswith("f_rest_"))
    k_rest = n_rest // 3
    xyz = np.stack([v["x"], v["y"], v["z"]], axis=-1).astype(np.float32)
    f_dc = np.stack([v[f"f_dc_{i}"] for i in range(3)], axis=-1).astype(np.float32)
    if n_rest:
        f_rest = np.stack(
            [v[f"f_rest_{i}"] for i in range(n_rest)], axis=-1
        ).astype(np.float32)
        f_rest = f_rest.reshape(n, 3, k_rest).transpose(0, 2, 1)
    else:
        f_rest = np.zeros((n, 0, 3), np.float32)
    scales = np.stack([v[f"scale_{i}"] for i in range(3)], axis=-1).astype(np.float32)
    quats = np.stack([v[f"rot_{i}"] for i in range(4)], axis=-1).astype(np.float32)
    return GaussianScene(
        means=jnp.asarray(xyz),
        scales=jnp.asarray(scales),
        quats=jnp.asarray(quats),
        features_dc=jnp.asarray(f_dc),
        features_rest=jnp.asarray(f_rest),
        opacities=jnp.asarray(v["opacity"].astype(np.float32))[:, None],
        alive=jnp.ones((n,), bool),
    )
