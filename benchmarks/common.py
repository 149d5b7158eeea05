"""Shared benchmark plumbing: compile cache, timing, JSON emission.

Methodology (see ARCHITECTURE.md "Performance"): the tunneled TPU runtime
charges ~30-70 ms per dispatch with tens-of-ms variance, so every benchmark
scans enough work on device per dispatch to dominate that noise, warms up
once (compile), and reports the best of ``repeats`` wall-clock timings of a
full dispatch including host materialization of the (tiny) outputs.
"""

from __future__ import annotations

import json
import time


def setup_jax_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def best_time(fn, repeats: int = 3) -> float:
    """Best wall-clock of ``repeats`` calls; ``fn`` must materialize its
    outputs on host (np.asarray / float) before returning."""
    fn()  # compile + warm up
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def emit(obj: dict):
    print(json.dumps(obj), flush=True)


BASELINE_ITER_SAMPLES_PER_S = 8.87e4  # reference CPU whole-machine, SURVEY §6
