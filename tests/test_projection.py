"""Projection op vs the numpy oracle (CUDA semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from gstk_tpu.ops.oracle import project_gaussians_np
from gstk_tpu.ops.projection import project_gaussians

from tests._scenes import make_camera, make_gaussians


def _run_both(rng, n=400):
    cam = make_camera()
    means, scales, quats, _, _ = make_gaussians(rng, n)
    ref = project_gaussians_np(
        means, scales, 1.0, quats, cam["viewmat"], cam["fullmat"],
        cam["fx"], cam["fy"], cam["cx"], cam["cy"], cam["img_h"], cam["img_w"],
    )
    out = jax.jit(
        lambda m, s, q: project_gaussians(
            m, s, 1.0, q,
            jnp.asarray(cam["viewmat"]), jnp.asarray(cam["fullmat"]),
            cam["fx"], cam["fy"], cam["cx"], cam["cy"],
            cam["img_h"], cam["img_w"],
        )
    )(means, scales, quats)
    return ref, jax.tree.map(np.asarray, out)


def test_projection_matches_oracle(rng):
    ref, out = _run_both(rng)
    np.testing.assert_array_equal(out.mask, ref["mask"])
    m = ref["mask"]
    assert m.sum() > 100  # scene sanity: most Gaussians visible
    np.testing.assert_allclose(out.xys[m], ref["xys"][m], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out.depths[m], ref["depths"][m], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(out.radii[m], ref["radii"][m])
    np.testing.assert_allclose(out.conics[m], ref["conics"][m], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        out.compensation[m], ref["compensation"][m], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(out.num_tiles_hit[m], ref["num_tiles_hit"][m])


def test_projection_masks_behind_camera(rng):
    cam = make_camera()
    means, scales, quats, _, _ = make_gaussians(rng, 50)
    means[:, 2] = -np.abs(means[:, 2])  # all behind the camera
    out = project_gaussians(
        means, scales, 1.0, quats,
        jnp.asarray(cam["viewmat"]), jnp.asarray(cam["fullmat"]),
        cam["fx"], cam["fy"], cam["cx"], cam["cy"], cam["img_h"], cam["img_w"],
    )
    assert not bool(np.any(out.mask))
    assert int(np.sum(out.num_tiles_hit)) == 0


def test_projection_grads_finite(rng):
    """Masked lanes must not inject NaNs into gradients."""
    cam = make_camera()
    means, scales, quats, _, _ = make_gaussians(rng, 64)
    means[::7, 2] = -1.0  # some behind camera

    def loss(m, s, q):
        out = project_gaussians(
            m, s, 1.0, q,
            jnp.asarray(cam["viewmat"]), jnp.asarray(cam["fullmat"]),
            cam["fx"], cam["fy"], cam["cx"], cam["cy"],
            cam["img_h"], cam["img_w"],
        )
        return (
            jnp.sum(out.xys**2)
            + jnp.sum(out.conics**2)
            + jnp.sum(out.depths**2)
            + jnp.sum(out.compensation**2)
        )

    grads = jax.grad(loss, argnums=(0, 1, 2))(means, scales, quats)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))


def test_projection_grads_match_fd(rng):
    """Finite-difference check of d xys / d means on visible Gaussians."""
    cam = make_camera()
    means, scales, quats, _, _ = make_gaussians(rng, 8)

    def f(m):
        out = project_gaussians(
            m, scales, 1.0, quats,
            jnp.asarray(cam["viewmat"]), jnp.asarray(cam["fullmat"]),
            cam["fx"], cam["fy"], cam["cx"], cam["cy"],
            cam["img_h"], cam["img_w"],
        )
        return jnp.sum(jnp.sin(out.xys)) + jnp.sum(jnp.cos(out.conics))

    g = np.asarray(jax.grad(f)(jnp.asarray(means)))
    eps = 1e-3
    for i in [0, 3, 5]:
        for j in range(3):
            mp = means.copy(); mp[i, j] += eps
            mm = means.copy(); mm[i, j] -= eps
            fd = (float(f(jnp.asarray(mp))) - float(f(jnp.asarray(mm)))) / (2 * eps)
            np.testing.assert_allclose(g[i, j], fd, rtol=2e-2, atol=2e-3)
