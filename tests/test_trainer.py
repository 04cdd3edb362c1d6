"""Trainer integration: full loop on a fixture dataset, checkpoint resume."""

import dataclasses

import numpy as np

from gstk_tpu.data.dataparser import DataparserConfig
from gstk_tpu.models.vanilla import VanillaConfig
from gstk_tpu.train import checkpoint as ckpt
from gstk_tpu.train.trainer import Trainer, TrainerConfig

from tests.test_data import _make_dataset


def _config(data, out, iters=12):
    return TrainerConfig(
        data=data,
        output_dir=out,
        max_num_iterations=iters,
        steps_per_save=10,
        steps_per_eval_all_images=0,
        log_every=5,
        model=VanillaConfig(
            sh_degree=1, num_downscales=1, resolution_schedule=4,
            warmup_length=2, refine_every=5, background_color="black",
        ),
        dataparser=DataparserConfig(
            data=data, eval_mode="interval", eval_interval=3
        ),
        isect_capacity=1 << 13,
        raster_chunk=16,
    )


def test_trainer_end_to_end(tmp_path, rng):
    data = _make_dataset(tmp_path, rng)
    cfg = _config(data, tmp_path / "out")
    trainer = Trainer(cfg)
    trainer.setup()
    assert trainer.datamanager.num_train == 4
    trainer.train()
    # checkpoint written
    path = ckpt.latest_checkpoint(cfg.run_dir / "ckpts")
    assert path is not None
    assert int(trainer.state.step) == cfg.max_num_iterations
    # metrics jsonl written
    assert (cfg.run_dir / "metrics.jsonl").exists()
    # eval renders work
    results = trainer.eval_all(step=12)
    assert "eval_psnr" in results and np.isfinite(results["eval_psnr"])


def test_trainer_resume(tmp_path, rng):
    data = _make_dataset(tmp_path, rng)
    cfg = _config(data, tmp_path / "out", iters=10)
    t1 = Trainer(cfg)
    t1.setup()
    t1.train()

    cfg2 = dataclasses.replace(
        cfg, max_num_iterations=14, load_dir=cfg.run_dir / "ckpts"
    )
    t2 = Trainer(cfg2)
    t2.setup()
    assert int(t2.state.step) == 10  # resumed
    t2.train()
    assert int(t2.state.step) == 14
