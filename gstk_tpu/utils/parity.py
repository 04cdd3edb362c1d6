"""Hardware parity check: pallas kernels vs the portable JAX path.

The bf16-split exact dot (``ops/raster_pallas._mxu_dot``) and the
segment-broadcast limb recombination (``ops/segment_kernel``) are
precision contracts that only exercise on real TPU hardware (interpret
mode runs f32 throughout). ``bench.py`` runs this before timing so every
driver bench implicitly re-validates them (VERDICT round-2 item 8);
``tests/test_tpu_smoke.py`` asserts the same contract under pytest.

Mirrors the reference's torch-vs-CUDA gradcheck strategy
(``/root/reference/rasterizer/tests/test_rasterize.py``) but as a
runtime guard rather than an opt-in test.
"""

from __future__ import annotations

import numpy as np


def check_pallas_parity(rtol_img=1e-3, atol_img=1e-4, rtol_grad=5e-3,
                        attr_layout="auto"):
    """Render + differentiate a small deterministic scene through both
    backends and assert closeness. Raises AssertionError on divergence.

    Returns a dict of max abs/rel deviations (for logging)."""
    import jax
    import jax.numpy as jnp

    from gstk_tpu.ops.projection import project_gaussians
    from gstk_tpu.ops.rasterize import RasterizeConfig, rasterize

    rng = np.random.default_rng(0)
    n = 2000
    img_h, img_w = 96, 128
    # scene/camera mirror tests/_scenes.py (camera at origin looking +z)
    means = np.stack(
        [
            rng.uniform(-3.0, 3.0, n),
            rng.uniform(-2.25, 2.25, n),
            rng.uniform(2.0, 8.0, n),
        ],
        axis=-1,
    ).astype(np.float32)
    scales = np.exp(rng.uniform(-2.5, -0.5, (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opacities = rng.uniform(0.2, 0.95, n).astype(np.float32)
    fx = 0.5 * img_w / np.tan(0.5 * np.deg2rad(60.0))
    fy = fx
    cx, cy = img_w / 2.0, img_h / 2.0
    viewmat = np.eye(4, dtype=np.float32)
    tan_fovx, tan_fovy = 0.5 * img_w / fx, 0.5 * img_h / fy
    near, far = 0.001, 1000.0
    projmat = np.array(
        [
            [1.0 / tan_fovx, 0, 0, 0],
            [0, 1.0 / tan_fovy, 0, 0],
            [0, 0, (far + near) / (far - near), -far * near / (far - near)],
            [0, 0, 1.0, 0],
        ],
        np.float32,
    )
    fullmat = projmat @ viewmat

    proj = project_gaussians(
        jnp.asarray(means), jnp.asarray(scales), 1.0, jnp.asarray(quats),
        jnp.asarray(viewmat), jnp.asarray(fullmat),
        fx, fy, cx, cy, img_h, img_w,
    )

    results = {}
    for backend in ("pallas", "jax"):
        cfg = RasterizeConfig(
            chunk_size=32, isect_capacity=1 << 15, backend=backend,
            attr_layout=attr_layout,
        )

        def loss(xys, conics, cols, opac):
            img, alpha = rasterize(
                xys, proj.depths, proj.radii, conics, proj.num_tiles_hit,
                cols, opac, img_height=img_h, img_width=img_w,
                background=jnp.zeros(3), config=cfg,
            )
            return jnp.sum(img * 0.5) + jnp.sum(alpha), img

        (val, img), grads = jax.jit(
            jax.value_and_grad(loss, argnums=(0, 1, 2, 3), has_aux=True)
        )(proj.xys, proj.conics, jnp.asarray(colors), jnp.asarray(opacities))
        results[backend] = (
            float(val), np.asarray(img), [np.asarray(g) for g in grads]
        )

    v_p, img_p, g_p = results["pallas"]
    v_j, img_j, g_j = results["jax"]
    np.testing.assert_allclose(img_p, img_j, rtol=rtol_img, atol=atol_img)
    np.testing.assert_allclose(v_p, v_j, rtol=1e-4)
    for a, b in zip(g_p, g_j):
        np.testing.assert_allclose(
            a, b, rtol=rtol_grad, atol=1e-3 * max(1.0, np.abs(b).max())
        )
    img_dev = float(np.abs(img_p - img_j).max())
    grad_dev = float(
        max(
            np.abs(a - b).max() / max(1.0, np.abs(b).max())
            for a, b in zip(g_p, g_j)
        )
    )
    return {"max_img_abs_dev": img_dev, "max_grad_rel_dev": grad_dev}


def check_pallas_parity_all_layouts():
    """Parity for BOTH attribute layouts. 'auto' resolves to 'wide' at the
    small parity scene, so the transposed path (which auto-activates in
    production above 400k Gaussians — exactly where run_quality.sh trains)
    must be forced explicitly or it would never see a hardware gate."""
    devs = {"wide": check_pallas_parity(attr_layout="wide")}
    devs["transposed"] = check_pallas_parity(attr_layout="transposed")
    return devs
