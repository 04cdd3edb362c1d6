"""Crop-box rendering + mask generation fallbacks."""

import jax
import jax.numpy as jnp
import numpy as np

from gstk_tpu.core.scene_box import SceneBox
from gstk_tpu.exporter.mask_generation import generate_masks, register_mask_model
from gstk_tpu.models.vanilla import render_scene
from gstk_tpu.ops.rasterize import RasterizeConfig

from tests.test_model import _camera, _scene, H, W


def test_crop_box_filters_render(rng):
    scene = _scene(rng)
    cfg = RasterizeConfig(chunk_size=16, isect_capacity=1 << 13)
    full = render_scene(
        scene, _camera(), H, W, sh_degree=0,
        background=jnp.zeros(3), raster_config=cfg,
    )
    # a tiny box around the origin excludes most gaussians
    box = SceneBox(aabb=jnp.asarray([[-0.2, -0.2, -0.2], [0.2, 0.2, 0.2]]))
    cropped = render_scene(
        scene, _camera(), H, W, sh_degree=0,
        background=jnp.zeros(3), raster_config=cfg, crop_box=box,
    )
    assert float(jnp.sum(cropped["alpha"])) < float(jnp.sum(full["alpha"]))


def test_mask_generation_fallbacks(rng):
    imgs = [rng.uniform(0, 1, (16, 20, 3)).astype(np.float32)] * 2
    accs = [rng.uniform(0, 1, (16, 20)).astype(np.float32)] * 2
    masks = generate_masks(imgs, method="threshold", accumulations=accs)
    assert masks[0].shape == (16, 20) and masks[0].dtype == bool
    masks = generate_masks(imgs, method="box", box=(0.25, 0.25, 0.75, 0.75))
    assert masks[0].sum() == 8 * 10
    masks = generate_masks(imgs, method="none")
    assert masks[0].all()

    register_mask_model("fake", lambda ims, prompt: [
        np.zeros(im.shape[:2], bool) for im in ims
    ])
    masks = generate_masks(imgs, prompt="a cup", method="fake")
    assert not masks[0].any()
