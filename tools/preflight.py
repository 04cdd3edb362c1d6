"""Hardware-parity preflight gate (VERDICT r4 item 6).

The pallas kernels' precision contracts (bf16-split exact dots, limb
recombination, Mosaic layout behavior) only exercise on real TPU hardware
— the CPU suite passes silently after a kernel edit that breaks them
(round 4's excess-precision-elision bug was caught only by the hardware
parity gate). This module turns that discipline from a CLAUDE.md
convention into an enforced mechanism:

- ``kernel_hash()`` fingerprints every file that can change device
  numerics (kernels, binning, projection, losses, parity harness).
- A *stamp* (``.preflight_stamp.json``, untracked) records the hash at
  the moment a hardware parity run last PASSED.
- ``check()`` says whether the working tree's kernels match the stamp.
- ``bench.py`` refreshes the stamp whenever its own hardware parity
  phase passes; ``tools/preflight.sh`` runs the fuller TPU smoke suite
  and stamps on success; ``tools/run_quality.sh`` refuses to launch a
  training run on stale kernels (override: GSTK_SKIP_PREFLIGHT=1).

A kernel edit therefore cannot produce a committed training/quality
number without a hardware parity run in between.

Usage:
  python tools/preflight.py check    # exit 0 fresh / 1 stale (prints why)
  python tools/preflight.py stamp --source <name>   # record current hash
  python tools/preflight.py hash     # print the hash
"""

from __future__ import annotations

import hashlib
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
STAMP_PATH = REPO / ".preflight_stamp.json"

# Every file whose edit can change what the TPU computes in the hot path.
# Keep sorted; adding a file here invalidates the stamp (by design).
KERNEL_FILES = [
    "gstk_tpu/ops/binning.py",
    "gstk_tpu/ops/projection.py",
    "gstk_tpu/ops/raster_pallas.py",
    "gstk_tpu/ops/rasterize.py",
    "gstk_tpu/ops/segment_kernel.py",
    "gstk_tpu/ops/sh.py",
    "gstk_tpu/utils/losses.py",
    "gstk_tpu/utils/parity.py",
]


def kernel_hash() -> str:
    h = hashlib.sha256()
    for rel in KERNEL_FILES:
        p = REPO / rel
        h.update(rel.encode())
        h.update(b"\0")
        h.update(p.read_bytes() if p.exists() else b"<missing>")
        h.update(b"\0")
    return h.hexdigest()


def read_stamp() -> dict | None:
    try:
        with open(STAMP_PATH) as f:
            return json.load(f)
    except Exception:
        return None


def write_stamp(source: str) -> dict:
    stamp = {
        "hash": kernel_hash(),
        "source": source,
        "time": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(STAMP_PATH, "w") as f:
        json.dump(stamp, f, indent=1)
        f.write("\n")
    return stamp


def check(verbose: bool = True) -> bool:
    """True iff the current kernel files carry a passing hardware stamp."""
    stamp = read_stamp()
    cur = kernel_hash()
    if stamp is None:
        if verbose:
            print(
                "preflight: NO STAMP — no recorded hardware parity run for "
                "the current kernels.\nRun `bash tools/preflight.sh` (TPU "
                "smoke tests + bench parity) to create one.",
                file=sys.stderr,
            )
        return False
    if stamp.get("hash") != cur:
        if verbose:
            print(
                "preflight: STALE — kernel files changed since the last "
                f"hardware parity pass ({stamp.get('time')}, "
                f"source={stamp.get('source')}).\nRun `bash "
                "tools/preflight.sh` before producing numbers, or set "
                "GSTK_SKIP_PREFLIGHT=1 to override knowingly.",
                file=sys.stderr,
            )
        return False
    if verbose:
        print(
            f"preflight: fresh (stamped {stamp.get('time')} via "
            f"{stamp.get('source')})",
            file=sys.stderr,
        )
    return True


def main(argv: list[str]) -> int:
    cmd = argv[0] if argv else "check"
    if cmd == "hash":
        print(kernel_hash())
        return 0
    if cmd == "stamp":
        source = "manual"
        if "--source" in argv:
            source = argv[argv.index("--source") + 1]
        stamp = write_stamp(source)
        print(f"preflight: stamped {stamp['hash'][:16]}… via {source}")
        return 0
    if cmd == "check":
        return 0 if check() else 1
    print(f"preflight: unknown command {cmd!r}", file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
