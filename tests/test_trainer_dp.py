"""Trainer with automatic data parallelism over the virtual CPU mesh."""

import jax
import numpy as np

from gstk_tpu.data.dataparser import DataparserConfig
from gstk_tpu.data.synthetic import generate_synthetic_dataset
from gstk_tpu.models.vanilla import VanillaConfig
from gstk_tpu.train.trainer import Trainer, TrainerConfig


def test_trainer_auto_dp(tmp_path):
    assert jax.device_count() >= 2
    data = generate_synthetic_dataset(
        tmp_path / "data", n_points=300, n_views=8, img_wh=(64, 48)
    )
    cfg = TrainerConfig(
        data=data,
        output_dir=tmp_path / "out",
        max_num_iterations=6,
        steps_per_save=100,
        steps_per_eval_all_images=0,
        log_every=2,
        model=VanillaConfig(
            sh_degree=1, num_downscales=0, warmup_length=2, refine_every=3,
            background_color="black",
        ),
        dataparser=DataparserConfig(
            data=data, eval_mode="interval", eval_interval=4,
            downscale_factor=1,
        ),
        isect_capacity=1 << 13,
        raster_chunk=16,
        data_parallel="auto",
    )
    trainer = Trainer(cfg)
    trainer.setup()
    assert trainer.mesh is not None
    trainer.train()
    assert int(trainer.state.step) == 6
    # eval still works on the replicated state
    res = trainer.eval_all(step=6)
    assert np.isfinite(res["eval_psnr"])


def test_trainer_param_sharding(tmp_path, rng):
    """Trainer with param_sharding=auto trains with the state sharded on
    the capacity axis across the virtual 8-device mesh."""
    from gstk_tpu.data.synthetic import generate_synthetic_dataset
    from gstk_tpu.data.dataparser import DataparserConfig
    from gstk_tpu.models.vanilla import VanillaConfig
    from gstk_tpu.train.trainer import Trainer, TrainerConfig

    data = generate_synthetic_dataset(
        tmp_path / "data", n_points=200, n_views=4, img_wh=(48, 32)
    )
    cfg = TrainerConfig(
        output_dir=tmp_path / "out",
        max_num_iterations=4,
        steps_per_save=4,
        steps_per_eval_all_images=0,
        isect_capacity=1 << 12,
        raster_chunk=16,
        model=VanillaConfig(
            sh_degree=1, warmup_length=0, num_downscales=0,
        ),
        dataparser=DataparserConfig(
            data=data, eval_mode="interval", eval_interval=4,
            downscale_factor=1,
        ),
        data_parallel="off",
        param_sharding="auto",
    )
    t = Trainer(cfg)
    t.setup()
    assert t.gauss_mesh is not None
    assert "gauss" in str(t.state.scene.means.sharding)
    t.train()
    assert "gauss" in str(t.state.scene.means.sharding)
