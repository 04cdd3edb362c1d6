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
    # eval renders work; the one-dispatch device eval path must agree with
    # the per-frame host loop
    results = trainer.eval_all(step=12)
    assert "eval_psnr" in results and np.isfinite(results["eval_psnr"])
    frames = trainer.datamanager.eval_frames
    p_dev, s_dev = trainer._eval_all_device(frames)
    p_host, s_host = trainer._eval_all_host(frames)
    np.testing.assert_allclose(np.mean(p_dev), np.mean(p_host), rtol=1e-4)
    np.testing.assert_allclose(np.mean(s_dev), np.mean(s_host), rtol=1e-4)


def test_trainer_save_disabled_and_eval_image_cadence(tmp_path, rng):
    """steps_per_save=0 disables checkpointing (ZeroDivisionError
    regression, caught by the r5 mono smoke); steps_per_eval_image
    renders ONE cycling eval view per cadence (reference eval_iteration,
    engine/trainer.py:527-577)."""
    import json

    data = _make_dataset(tmp_path, rng)
    cfg = dataclasses.replace(
        _config(data, tmp_path / "out", iters=6),
        steps_per_save=0, steps_per_eval_image=2,
    )
    trainer = Trainer(cfg)
    trainer.setup()
    trainer.train()
    # no periodic saves — only the unconditional end-of-training one
    ckpts = sorted((cfg.run_dir / "ckpts").glob("step-*.ckpt.npz"))
    assert [p.name for p in ckpts] == ["step-000000006.ckpt.npz"]
    recs = [json.loads(line)
            for line in (cfg.run_dir / "metrics.jsonl").open()]
    evals = [r for r in recs if "eval_image_psnr" in r]
    assert [r["step"] for r in evals] == [1, 3, 5]
    assert all(np.isfinite(r["eval_image_psnr"]) for r in evals)
    # cycles through the split (2 eval frames in the fixture)
    assert [int(r["eval_image_idx"]) for r in evals] == [1, 0, 1]


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


def test_trainer_resume_past_densify_growth(tmp_path, rng):
    """A checkpoint written AFTER capacity growth must resume into a fresh
    trainer whose initial capacity is smaller (reference semantics: params
    resize to the checkpoint's N, vanilla_gs.py:236-258)."""
    data = _make_dataset(tmp_path, rng)
    cfg = _config(data, tmp_path / "out", iters=10)
    t1 = Trainer(cfg)
    t1.setup()
    t1.train()
    cap1 = t1.state.scene.capacity

    # simulate a post-growth checkpoint: grow to 2x and save
    from gstk_tpu.core.gaussians import grow_scene
    from gstk_tpu.train.step import init_train_state

    grown = init_train_state(grow_scene(t1.state.scene, cap1 * 2))
    grown = grown._replace(step=t1.state.step)
    ckpt.save_checkpoint(cfg.run_dir / "ckpts", grown, True)

    cfg2 = dataclasses.replace(
        cfg, max_num_iterations=12, load_dir=cfg.run_dir / "ckpts"
    )
    t2 = Trainer(cfg2)
    t2.setup()
    assert t2.state.scene.capacity == cap1 * 2
    assert int(t2.state.step) == 10
    t2.train()
    assert int(t2.state.step) == 12


def test_isect_growth_switches_to_bands(tmp_path):
    """Past the 2^20 sort ceiling the trainer must add rasterization bands
    instead of growing the buffer into the lax.sort cliff."""
    import dataclasses

    from gstk_tpu.data.synthetic import generate_synthetic_dataset
    from gstk_tpu.train.trainer import Trainer, TrainerConfig
    from gstk_tpu.configs.methods import method_configs

    ds = generate_synthetic_dataset(
        tmp_path / "ds", n_points=200, n_views=4, img_wh=(48, 32)
    )
    cfg = method_configs()["gaussian-splatting"]
    cfg = dataclasses.replace(
        cfg, data=ds, output_dir=tmp_path / "out", max_num_iterations=1,
        steps_per_eval_image=0, steps_per_eval_all_images=0,
        isect_capacity=1 << 12, data_parallel="off",
        dataparser=dataclasses.replace(
            cfg.dataparser, data=ds, eval_mode="interval", eval_interval=3,
            downscale_factor=1,
        ),
    )
    tr = Trainer(cfg)
    tr.setup()
    # below the ceiling: capacity grows to the next 3-bit-mantissa bucket
    # with >= 1.2x headroom over the observed count
    n = int(0.95 * (1 << 12))
    tr._maybe_grow({"num_alive": 0, "num_intersects": n})
    assert tr.raster_cfg.isect_capacity >= 1.2 * n
    assert tr.raster_cfg.isect_capacity <= 1 << 13
    assert tr.raster_cfg.isect_capacity % 1024 == 0
    assert tr.raster_cfg.bands == 1
    # at the ceiling (2^21 since the round-3 sort measurement —
    # tools/bench_sort.py showed no 2^21 cliff): bands grow instead
    tr.raster_cfg = dataclasses.replace(
        tr.raster_cfg, isect_capacity=1 << 21
    )
    tr._maybe_grow({"num_alive": 0, "num_intersects": int(0.95 * (1 << 21))})
    assert tr.raster_cfg.isect_capacity == 1 << 21
    assert tr.raster_cfg.bands == 2
    # borderline per-band load keeps both bands (hysteresis: shrink only
    # when a merged band would sit well under the growth trigger)
    tr._maybe_grow(
        {"num_alive": 0, "num_intersects": int(0.4 * (1 << 21))}
    )
    assert tr.raster_cfg.bands == 2
    # once the post-reset transient passes, bands merge back
    tr._maybe_grow(
        {"num_alive": 0, "num_intersects": int(0.2 * (1 << 21))}
    )
    assert tr.raster_cfg.bands == 1
    # gaussian capacity saturates at max_capacity without resizing
    cap = tr.state.scene.capacity
    tr.config = dataclasses.replace(tr.config, max_capacity=cap)
    tr._maybe_grow({"num_alive": int(0.9 * cap), "num_intersects": 0})
    assert tr.state.scene.capacity == cap


def test_mid_window_isect_spike_triggers_growth(tmp_path):
    """Every step's intersection count must be examined: a densification
    spike on a NON-logged step previously truncated up to log_every-1
    consecutive renders with no growth signal (binning drops the
    farthest-sorted intersections past capacity). The trainer keeps each
    step's device-scalar count in a window and feeds the window PEAK to
    _maybe_grow at the next fetch boundary."""
    import dataclasses

    from gstk_tpu.data.synthetic import generate_synthetic_dataset
    from gstk_tpu.configs.methods import method_configs

    ds = generate_synthetic_dataset(
        tmp_path / "ds", n_points=200, n_views=4, img_wh=(48, 32)
    )
    cfg = method_configs()["gaussian-splatting"]
    cfg = dataclasses.replace(
        cfg, data=ds, output_dir=tmp_path / "out", max_num_iterations=1,
        steps_per_eval_image=0, steps_per_eval_all_images=0,
        isect_capacity=1 << 12, data_parallel="off",
        dataparser=dataclasses.replace(
            cfg.dataparser, data=ds, eval_mode="interval", eval_interval=3,
            downscale_factor=1,
        ),
    )
    tr = Trainer(cfg)
    tr.setup()
    cap0 = tr.raster_cfg.isect_capacity
    # simulate the window: steps 1..4 were quiet, step 3 spiked past the
    # buffer; the fetched (logged) step itself reads quiet again
    spike = int(1.5 * cap0)
    tr._isect_window.extend([100.0, 100.0, float(spike), 100.0])
    grown = tr._drain_isect_window({"num_alive": 0, "num_intersects": 50})
    assert grown["num_intersects"] == spike
    assert tr._isect_window == []  # drained
    tr._maybe_grow(grown)
    assert tr.raster_cfg.isect_capacity >= 1.2 * spike
    # quiet window: metrics pass through untouched
    tr._isect_window.extend([10.0, 20.0])
    out = tr._drain_isect_window({"num_alive": 0, "num_intersects": 30})
    assert out["num_intersects"] == 30
def test_train_loop_drains_isect_window(tmp_path, rng):
    """The real train loop populates the window every step and drains it at
    each log boundary (so a spike is never examined later than log_every
    steps after it happened)."""
    data = _make_dataset(tmp_path, rng)
    cfg = _config(data, tmp_path / "out", iters=7)
    tr = Trainer(cfg)
    tr.setup()
    tr.train()
    assert tr._isect_window == []


def test_renderer_reads_checkpoint_raster_meta(tmp_path):
    """The standalone Renderer (gs-eval/gs-render/gs-export path) must floor
    its band count at the checkpoint's persisted trained bands: a densified
    scene can need more bands than resolution-based auto-banding provides,
    and truncated intersections silently wreck offline eval (observed PSNR
    20.1 -> 15.2 on the 15k run's checkpoint before this wiring)."""
    import jax

    from gstk_tpu.core.gaussians import init_scene
    from gstk_tpu.render.renderer import Renderer
    from gstk_tpu.train.step import init_train_state

    scene = init_scene(jax.random.PRNGKey(0), 256, num_random=64)
    state = init_train_state(scene)
    path = ckpt.save_checkpoint(
        tmp_path / "ckpts", state, True,
        extras={"bands": 3, "isect_capacity": 1 << 20},
    )
    r = Renderer(path)
    # small render: auto would pick 1 band; the trained floor wins
    assert r._raster_for(64, 48).bands == 3
    # large render: resolution-auto exceeds the floor
    assert r._raster_for(2400, 1600).bands == max(3, -(-2400 * 1600 // 640_000))
    # explicit raster_config is never overridden
    from gstk_tpu.ops.rasterize import RasterizeConfig

    r2 = Renderer(path, raster_config=RasterizeConfig(bands=1))
    assert r2._raster_for(64, 48).bands == 1
    # a meta-less checkpoint behaves as before (pure auto)
    path2 = ckpt.save_checkpoint(tmp_path / "ckpts2", state, True)
    r3 = Renderer(path2)
    assert r3._raster_for(64, 48).bands == 1
    # the default config also floors isect capacity at the checkpoint's
    # grown value (the trainer runs to 2^21 before banding; a 2^20 default
    # truncated intersections: observed 22.93 -> 21.37 eval PSNR on the
    # 240-view 15k checkpoint)
    path3 = ckpt.save_checkpoint(
        tmp_path / "ckpts3", state, True,
        extras={"bands": 1, "isect_capacity": 1 << 21},
    )
    r4 = Renderer(path3)
    assert r4.raster_config.isect_capacity == 1 << 21
    assert r3.raster_config.isect_capacity == 1 << 20  # meta-less default


def test_cache_quantization_lossless_roundtrip():
    """uint8 GT-cache quantization is bit-exact for 8-bit-derived images
    and refuses non-8-bit floats (trainer._quantize_cache_images)."""
    import jax.numpy as jnp

    from gstk_tpu.train.trainer import (
        _dequantize_image,
        _quantize_cache_images,
    )

    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (3, 8, 9, 3), dtype=np.uint8)
    imgs = (u8.astype(np.float32) / 255.0).astype(np.float32)
    cached = _quantize_cache_images(imgs)
    assert cached.dtype == jnp.uint8
    back = np.asarray(_dequantize_image(cached[1]))
    assert np.array_equal(back, imgs[1])  # bit-exact

    hdr = imgs + np.float32(1e-4)  # not exact 8-bit multiples
    cached2 = _quantize_cache_images(hdr)
    assert cached2.dtype == jnp.float32
    assert np.array_equal(np.asarray(_dequantize_image(cached2[0])), hdr[0])
