"""Runtime helpers: persistent XLA compilation cache, stage timing.

The reference tracks per-stage wall time with ad-hoc ``timeit`` prints
(/root/reference/bin/mercat2.py:230,299,335). StageTimer is the structured
equivalent; ``enable_compilation_cache`` amortizes XLA compile time across
runs (first compile of the sort kernel is tens of seconds; subsequent runs
hit the on-disk cache).
"""

from __future__ import annotations

import os
import time


_CACHE_ENABLED = False


def enable_compilation_cache(path: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache (idempotent)."""
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    import jax

    path = path or os.environ.get(
        "MERCAT2_TPU_CACHE", os.path.expanduser("~/.cache/mercat2_tpu/xla")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _CACHE_ENABLED = True


def mem_use() -> str:
    """Current host RAM usage, GB (reference's mem_use,
    /root/reference/bin/mercat2.py:31-32)."""
    try:
        import psutil

        return f"{psutil.virtual_memory().used / 1024**3:.2f} GB"
    except ImportError:  # pragma: no cover
        return "n/a"


class DebugTrace:
    """Optional observability for ``-debug`` runs: prints host RAM at each
    stage (the reference gates the same prints on its hidden ``-debug``
    flag) and records a ``jax.profiler`` trace for TPU timeline analysis."""

    def __init__(self, enabled: bool, trace_dir=None):
        self.enabled = enabled
        self.trace_dir = str(trace_dir) if trace_dir else None
        self._trace = None

    def __enter__(self):
        if self.enabled and self.trace_dir:
            import jax

            self._trace = jax.profiler.trace(self.trace_dir)
            self._trace.__enter__()
            print(f"[debug] jax profiler trace -> {self.trace_dir}")
        return self

    def __exit__(self, *exc):
        if self._trace is not None:
            self._trace.__exit__(*exc)
        return False

    def stage(self, name: str) -> None:
        if self.enabled:
            print(f"[debug] {name}: host RAM {mem_use()}")


class StageTimer:
    """Named wall-clock stage timer with a report() summary."""

    def __init__(self, verbose: bool = True):
        self.verbose = verbose
        self.stages: list[tuple[str, float]] = []
        self._t0: float | None = None
        self._name: str | None = None

    def start(self, name: str) -> None:
        self.stop()
        self._name = name
        self._t0 = time.perf_counter()

    def stop(self) -> None:
        if self._t0 is not None:
            dt = time.perf_counter() - self._t0
            self.stages.append((self._name, dt))
            if self.verbose:
                print(f"Time to {self._name}: {round(dt, 2)} seconds")
            self._t0 = None
            self._name = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.stop()
        return False
