"""Slow integration: Trainer with densification converges on a synthetic
dataset (the in-repo stand-in for the MipNeRF-360 quality target —
BASELINE.md training-quality row; real-scene PSNR needs real data)."""

import numpy as np
import pytest

from gstk_tpu.data.dataparser import DataparserConfig
from gstk_tpu.data.synthetic import generate_synthetic_dataset
from gstk_tpu.models.vanilla import VanillaConfig
from gstk_tpu.train.trainer import Trainer, TrainerConfig


@pytest.mark.slow
def test_trainer_converges_with_densification(tmp_path):
    data = generate_synthetic_dataset(
        tmp_path / "data", n_points=600, n_views=10, img_wh=(80, 60)
    )
    cfg = TrainerConfig(
        data=data,
        output_dir=tmp_path / "out",
        max_num_iterations=220,
        steps_per_save=1000,
        steps_per_eval_all_images=0,
        log_every=20,
        model=VanillaConfig(
            sh_degree=1, num_downscales=0, warmup_length=40,
            refine_every=50, background_color="black",
            sh_degree_interval=100,
        ),
        dataparser=DataparserConfig(
            data=data, eval_mode="interval", eval_interval=5,
            downscale_factor=1,
        ),
        isect_capacity=1 << 15,
        raster_chunk=16,
    )
    trainer = Trainer(cfg)
    trainer.setup()
    trainer.train()
    results = trainer.eval_all(step=cfg.max_num_iterations)
    assert results["eval_psnr"] > 18.0, results  # 220 steps is a smoke budget; the reference recipe runs 15k
    # densification ran (refine fired at least once past warmup)
    assert int(trainer.state.scene.num_alive) > 0
