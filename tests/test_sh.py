"""SH evaluation vs direct formula checks."""

import jax
import jax.numpy as jnp
import numpy as np

from gstk_tpu.ops.sh import eval_sh_bases, num_sh_bases, spherical_harmonics


def test_num_bases():
    assert [num_sh_bases(d) for d in range(5)] == [1, 4, 9, 16, 25]


def test_degree0_is_constant(rng):
    dirs = rng.normal(size=(10, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    bases = np.asarray(eval_sh_bases(1, jnp.asarray(dirs)))
    np.testing.assert_allclose(bases, 0.28209479177387814, rtol=1e-6)


def test_orthonormality(rng):
    """Monte-Carlo orthonormality of the 25 bases over the sphere."""
    n = 200_000
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    bases = np.asarray(eval_sh_bases(25, jnp.asarray(dirs, dtype=jnp.float32)))
    gram = (bases.T @ bases) / n * (4 * np.pi)
    np.testing.assert_allclose(gram, np.eye(25), atol=0.15)


def test_schedule_truncates(rng):
    dirs = rng.normal(size=(5, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    coeffs = rng.normal(size=(5, 25, 3)).astype(np.float32)
    c0 = np.asarray(spherical_harmonics(0, jnp.asarray(dirs), jnp.asarray(coeffs)))
    np.testing.assert_allclose(
        c0, coeffs[:, 0, :] * 0.28209479177387814, rtol=1e-5
    )
    c2 = np.asarray(spherical_harmonics(2, jnp.asarray(dirs), jnp.asarray(coeffs)))
    manual = np.asarray(
        eval_sh_bases(9, jnp.asarray(dirs))
    )[..., None] * coeffs[:, :9, :]
    np.testing.assert_allclose(c2, manual.sum(axis=1), rtol=1e-5, atol=1e-6)


def test_grad_only_to_coeffs(rng):
    dirs = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    coeffs = jnp.asarray(rng.normal(size=(4, 9, 3)).astype(np.float32))

    g_dirs, g_coeffs = jax.grad(
        lambda d, c: jnp.sum(spherical_harmonics(2, d, c) ** 2), argnums=(0, 1)
    )(dirs, coeffs)
    assert float(jnp.abs(g_dirs).max()) == 0.0  # viewdir grads stopped
    assert float(jnp.abs(g_coeffs).max()) > 0.0
