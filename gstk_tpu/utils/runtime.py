"""Process-level runtime knobs shared by every entry point."""

from __future__ import annotations

_CACHE_DIR = "/root/.cache/jax_comp"


def enable_persistent_compile_cache(cache_dir: str = _CACHE_DIR) -> None:
    """Point JAX at the persistent compilation cache.

    Through the tunneled TPU compiler a cold compile of the step/render
    programs costs minutes; the persistent cache turns warm starts into
    ~1 s. The trainer always did this, but standalone gs-eval/gs-render/
    gs-export paid a full cold compile EVERY invocation (observed:
    offline gs-eval at 0.22 fps where the render itself takes ~4 s) —
    every CLI entry point now calls this before first jit."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
