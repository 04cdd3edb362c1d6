"""gs-viewer: view a trained checkpoint in the browser.

Equivalent of the reference ``gs-viewer`` entrypoint: loads config +
checkpoint and serves the interactive viewer (viser when installed, the
stdlib HTTP viewer otherwise).
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path


def main(argv=None) -> None:
    from gstk_tpu.configs.serialize import load_config
    from gstk_tpu.render.renderer import Renderer
    from gstk_tpu.viewer.viser_viewer import make_viewer

    parser = argparse.ArgumentParser("gs-viewer")
    parser.add_argument("--load-config", type=Path, required=True)
    parser.add_argument("--port", type=int, default=7007)
    args = parser.parse_args(argv)

    config = load_config(args.load_config)
    run_dir = Path(args.load_config).parent
    renderer = Renderer(run_dir / "ckpts", model_config=config.model)
    viewer = make_viewer(
        config.model, renderer.raster_config, port=args.port
    ).start()
    viewer.update_scene(renderer.scene, {"step": renderer.step})
    print("Viewer running; Ctrl-C to exit.")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
