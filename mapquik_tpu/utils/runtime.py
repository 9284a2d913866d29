"""Runtime configuration: persistent XLA compilation cache + timers.

The persistent cache is OPT-IN via MAPQUIK_JAX_CACHE=<dir> (or an explicit path
argument): on this environment's tunneled-TPU backend, reading back cached TPU
executables hangs the process indefinitely (measured: fresh-cache bench 76s total,
populated-cache bench stuck >8min in deserialization), so it must not be on by
default. On plain CPU/TPU backends it works normally and saves recompiles.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager


_CACHE_ENABLED = False


def enable_compilation_cache(path: str | None = None) -> None:
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    import jax

    cache_dir = path or os.environ.get("MAPQUIK_JAX_CACHE")
    if not cache_dir:
        return
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _CACHE_ENABLED = True
    except Exception:
        pass  # older jax or read-only fs: run without the cache


class Timer:
    """Lightweight phase timer mirroring the reference's per-phase printouts
    (src/closures.rs:81,91-92,177,210-211)."""

    def __init__(self):
        self.phases = {}

    @contextmanager
    def phase(self, name: str):
        t0 = time.time()
        yield
        self.phases[name] = self.phases.get(name, 0.0) + (time.time() - t0)

    def report(self) -> str:
        return " | ".join(f"{k}: {v:.2f}s" for k, v in self.phases.items())


def max_rss_gb() -> float:
    import resource

    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0 / 1024.0


@contextmanager
def profile_trace(trace_dir: str | None):
    """jax.profiler trace capture (TensorBoard/Perfetto format) around a phase.

    The reference's only tracing is Instant::now() spans (src/closures.rs:81,91);
    this adds device-level tracing (SURVEY.md §5 plan). No-op when trace_dir is
    falsy or the profiler is unavailable on the backend."""
    if not trace_dir:
        yield
        return
    import jax

    try:
        jax.profiler.start_trace(trace_dir)
    except Exception as e:  # backend without profiler support
        print(f"Warning: profiler unavailable ({type(e).__name__}); continuing without trace.")
        yield
        return
    try:
        yield
    finally:
        try:
            jax.profiler.stop_trace()
            print(f"Profiler trace written to {trace_dir}.")
        except Exception:
            pass
