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


def test_grounded_sam_local_checkpoints(tmp_path, rng):
    """The real GroundingDINO->SAM chain through transformers with tiny
    random local checkpoints (docs/WEIGHTS.md contract for text-prompted
    offline-tsdf masking)."""
    import pytest

    transformers = pytest.importorskip("transformers")
    from gstk_tpu.exporter import mask_generation as mg

    gdir, sdir = tmp_path / "gdino", tmp_path / "sam"
    gcfg = transformers.GroundingDinoConfig(
        text_config={"hidden_size": 32, "num_hidden_layers": 2,
                     "num_attention_heads": 2, "intermediate_size": 64,
                     "vocab_size": 30522},
        backbone_config={"model_type": "swin", "embed_dim": 16,
                         "depths": [1, 1, 2], "num_heads": [1, 2, 4],
                         "image_size": 64, "out_indices": [1, 2, 3]},
        d_model=32, encoder_layers=1, decoder_layers=1,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64, num_queries=10,
        num_feature_levels=4,
    )
    transformers.GroundingDinoForObjectDetection(gcfg).save_pretrained(gdir)
    vocab = tmp_path / "vocab.txt"
    vocab.write_text(
        "\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
                   "object", "sphere", "a", "."])
    )
    tok = transformers.BertTokenizerFast(str(vocab))
    gproc = transformers.GroundingDinoProcessor(
        image_processor=transformers.GroundingDinoImageProcessor(
            size={"shortest_edge": 64, "longest_edge": 64}
        ),
        tokenizer=tok,
    )
    gproc.save_pretrained(gdir)

    scfg = transformers.SamConfig(
        vision_config={"hidden_size": 32, "num_hidden_layers": 2,
                       "num_attention_heads": 2, "intermediate_size": 48,
                       "image_size": 64, "patch_size": 8,
                       "global_attn_indexes": [1]},
        prompt_encoder_config={"image_embedding_size": 8,
                               "image_size": 64, "patch_size": 8},
    )
    transformers.SamModel(scfg).save_pretrained(sdir)
    transformers.SamProcessor(
        transformers.SamImageProcessor(
            size={"longest_edge": 64},
            pad_size={"height": 64, "width": 64},
        )
    ).save_pretrained(sdir)

    assert mg.try_load_grounded_sam(gdir, sdir, box_threshold=0.0)
    img = rng.uniform(0, 255, (48, 64, 3)).astype(np.uint8)
    masks = mg.generate_masks([img], prompt="sphere", method="grounded_sam")
    assert len(masks) == 1
    assert masks[0].shape == (48, 64)
    assert masks[0].dtype == bool
