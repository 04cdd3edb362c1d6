"""gs-train: train a Gaussian Splatting method.

Equivalent of the reference entrypoint (``gs_toolkit/scripts/train.py:200-245``):
``gs-train <method> --data <dir> [--nested.flags ...]``. Saves the resolved
config YAML next to outputs (reloaded by eval/render/export), then runs the
trainer. Multi-host: pass --coordinator/--num-processes/--process-id (the
jax.distributed analog of the reference's --machine.* flags).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

from gstk_tpu.configs.cli import parse_cli
from gstk_tpu.configs.methods import experimental_methods, method_configs
from gstk_tpu.configs.serialize import save_config
from gstk_tpu.train.trainer import Trainer


def main(argv=None) -> None:
    if argv is None:
        import sys as _sys

        argv = _sys.argv[1:]
    if argv and argv[0] in experimental_methods:
        # 1:1 with the reference's method table: sugar_pipeline.py exists
        # there as a zero-byte placeholder (no config, no class). The slot
        # is reserved here and refuses to run rather than silently
        # training a different model.
        raise SystemExit(
            f"method '{argv[0]}' is a reserved slot: the reference ships "
            "pipelines/sugar_pipeline.py as an empty placeholder with no "
            "implementation; use surface-gs for surface-aligned refinement."
        )
    method, config = parse_cli(
        "Train a TPU-native Gaussian Splatting model", method_configs(), argv
    )
    if str(config.dataparser.data) == ".":
        config.dataparser = dataclasses.replace(
            config.dataparser, data=config.data
        )
    if config.experiment_name == "experiment":
        config.experiment_name = Path(config.data).name or "experiment"

    trainer = Trainer(config)
    trainer.setup()
    save_config(config.run_dir / "config.yml", config)
    trainer.train()
    results = trainer.eval_all(step=config.max_num_iterations)
    if results:
        print(f"Final eval: {results}")


if __name__ == "__main__":
    main()
