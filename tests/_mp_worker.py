"""Worker process for the true multi-process data-parallel test.

Run by tests/test_multiprocess_dp.py:
    python tests/_mp_worker.py <pid> <nproc> <port> <data_dir> <out_dir>
with JAX_PLATFORMS=cpu and XLA_FLAGS=--xla_force_host_platform_device_count=2
set by the parent, so 2 processes x 2 virtual devices = a 4-device global
DP mesh across a real process boundary (reference analog:
mp.spawn + dist.init_process_group, scripts/train.py:60-118).
"""

import dataclasses
import json
import sys
from pathlib import Path


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, data_dir, out_dir = sys.argv[3], sys.argv[4], Path(sys.argv[5])

    import numpy as np
    import jax

    # sitecustomize pins JAX_PLATFORMS=axon (the TPU tunnel); force CPU
    # before any backend initialization (CLAUDE.md gotcha)
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc
    assert jax.device_count() == 2 * nproc

    from gstk_tpu.configs.methods import method_configs
    from gstk_tpu.train.trainer import Trainer

    cfg = method_configs()["gaussian-splatting"]
    cfg = dataclasses.replace(
        cfg,
        data=Path(data_dir),
        output_dir=out_dir / "outputs",
        experiment_name="mp",
        max_num_iterations=6,
        steps_per_save=1000,
        steps_per_eval_image=0,
        steps_per_eval_all_images=0,
        isect_capacity=8192,
        raster_chunk=16,
        log_every=100,
        data_parallel="auto",
        dataparser=dataclasses.replace(
            cfg.dataparser, data=Path(data_dir), eval_mode="interval",
            eval_interval=5, downscale_factor=1,
        ),
        model=dataclasses.replace(
            cfg.model, sh_degree=1, warmup_length=2, refine_every=3,
            resolution_schedule=10**9, num_downscales=0,
        ),
    )
    trainer = Trainer(cfg)
    trainer.setup()

    # per-host camera shard: record the global frame identities this host
    # sees (disjointness asserted by the parent)
    shard_names = sorted(
        ",".join(f"{v:.5f}" for v in np.asarray(f.c2w)[:, 3])
        for f in trainer.datamanager.train_frames
    )

    trainer.train()

    # replicated state must be identical across processes: checksum a few
    # arrays (refinement ran at steps 3 and 6 via refine_every=3)
    s = trainer.state
    sums = {
        "means": float(np.sum(np.asarray(jax.device_get(s.scene.means)))),
        "opac": float(np.sum(np.asarray(jax.device_get(s.scene.opacities)))),
        "alive": int(np.sum(np.asarray(jax.device_get(s.scene.alive)))),
        "adam_mu_means": float(
            np.sum(np.asarray(jax.device_get(s.adam.mu["means"])))
        ),
        "step": int(s.step),
    }
    (out_dir / f"result_{pid}.json").write_text(
        json.dumps({"shard": shard_names, "sums": sums})
    )
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
