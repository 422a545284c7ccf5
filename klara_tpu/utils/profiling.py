"""Profiling helpers (SURVEY.md §5: the reference only ever used `@time`;
here runs can capture full XLA device traces)."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace_profile(logdir: str | None = None, label: str = "klara_tpu"):
    """Context manager: wall-time a block and (optionally) capture a
    jax.profiler trace viewable in TensorBoard/Perfetto.

        with trace_profile("/tmp/trace"):
            chain = job.run(key, x0)
    """
    t0 = time.perf_counter()
    if logdir is not None:
        with jax.profiler.trace(logdir):
            yield
    else:
        yield
    dt = time.perf_counter() - t0
    print(f"[{label}] {dt:.3f}s" + (f" (trace: {logdir})" if logdir else ""))
