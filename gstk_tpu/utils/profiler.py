"""Two-tier profiling: running-mean section timers + XLA/XProf traces.

Port of the reference profiler (``gs_toolkit/utils/profiler.py:53-227``):
``time_function`` decorates host-side sections with running means printed at
exit; the heavy tier captures device traces — ``jax.profiler`` TensorBoard
traces at fixed steps replace the reference's torch.profiler chrome traces
(utils/profiler.py:138-186).
"""

from __future__ import annotations

import atexit
import functools
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict, Optional


class Profiler:
    """Running-average wall-clock profiler (reference utils/profiler.py:189)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    def update(self, name: str, dt: float) -> None:
        self.totals[name] += dt
        self.counts[name] += 1

    def report(self) -> str:
        rows = sorted(
            self.totals.items(), key=lambda kv: kv[1], reverse=True
        )
        lines = ["Profiler (mean over calls):"]
        for name, total in rows:
            n = self.counts[name]
            lines.append(f"  {name}: {total / n * 1e3:.2f} ms x {n}")
        return "\n".join(lines)


PROFILER = Profiler()
_printed = False


def _print_at_exit():
    global _printed
    if not _printed and PROFILER.totals:
        _printed = True
        print(PROFILER.report(), flush=True)


atexit.register(_print_at_exit)


def time_function(fn):
    """Decorator: accumulate wall time under the function's qualname."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        PROFILER.update(fn.__qualname__, time.perf_counter() - t0)
        return out

    return wrapper


class timer:
    """Context manager: ``with timer("section"): ...``"""

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        PROFILER.update(self.name, time.perf_counter() - self.t0)


class DeviceTrace:
    """Capture an XProf/TensorBoard device trace for steps in [start, end)
    (replaces the reference's torch chrome traces at steps [12, 17])."""

    def __init__(self, log_dir, start_step: int = 12, end_step: int = 17):
        self.log_dir = str(log_dir)
        self.start_step = start_step
        self.end_step = end_step
        self._active = False

    def maybe_start(self, step: int) -> None:
        import jax

        if step == self.start_step and not self._active:
            Path(self.log_dir).mkdir(parents=True, exist_ok=True)
            jax.profiler.start_trace(self.log_dir)
            self._active = True

    def maybe_stop(self, step: int) -> None:
        import jax

        if self._active and step >= self.end_step:
            jax.profiler.stop_trace()
            self._active = False
