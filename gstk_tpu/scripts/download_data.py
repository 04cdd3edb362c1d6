"""gs-download-data: dataset download registry.

Equivalent of the reference ``gs-download-data``
(``gs_toolkit/scripts/downloads/download_data.py``). Keeps the same dataset
registry surface; actual downloads require network access (this build
environment has none — the command degrades to printing the URL so users can
fetch out-of-band).
"""

from __future__ import annotations

import argparse
import shutil
import subprocess
from pathlib import Path

DATASETS = {
    "mipnerf360": {
        "url": "http://storage.googleapis.com/gresearch/refraw360/360_v2.zip",
        "description": "MipNeRF-360 scenes (garden, bicycle, ...)",
    },
    "nerfstudio-poster": {
        "url": "https://data.nerf.studio/nerfstudio-data-mirror/nerfstudio/poster.zip",
        "description": "nerfstudio poster capture",
    },
    "blender": {
        "url": "https://drive.google.com/uc?id=18JxhpWD-4ZmuFKLzKlAw-w5PpzZxXOcG",
        "description": "NeRF synthetic Blender scenes",
    },
    "eyefultower": {
        "url": "https://github.com/facebookresearch/EyefulTower",
        "description": (
            "Eyeful Tower capture set (reference downloads/eyeful_tower.py;"
            " per-scene S3 fetch documented at the repo)"
        ),
    },
}


def main(argv=None) -> None:
    parser = argparse.ArgumentParser("gs-download-data")
    parser.add_argument("dataset", choices=sorted(DATASETS) + ["list"])
    parser.add_argument("--save-dir", type=Path, default=Path("data"))
    args = parser.parse_args(argv)

    if args.dataset == "list":
        for name, info in DATASETS.items():
            print(f"{name}: {info['description']}\n  {info['url']}")
        return

    info = DATASETS[args.dataset]
    args.save_dir.mkdir(parents=True, exist_ok=True)
    target = args.save_dir / f"{args.dataset}.zip"
    if shutil.which("wget") is None and shutil.which("curl") is None:
        print(f"No downloader available. Fetch manually:\n  {info['url']}")
        return
    tool = ["wget", "-O", str(target)] if shutil.which("wget") else [
        "curl", "-L", "-o", str(target)
    ]
    try:
        subprocess.run(tool + [info["url"]], check=True, timeout=3600)
        shutil.unpack_archive(str(target), str(args.save_dir / args.dataset))
        print(f"Extracted to {args.save_dir / args.dataset}")
    except Exception as e:  # zero-egress environments
        print(f"Download failed ({e}). Fetch manually:\n  {info['url']}")


if __name__ == "__main__":
    main()
