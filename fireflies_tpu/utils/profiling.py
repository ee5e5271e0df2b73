"""Tracing, timing and metrics (SURVEY.md §5 'Tracing / profiling').

The reference's observability is a timeit harness and print(loss)
(rasterization.py:775-814, :601).  Here:

  * `time_it(fn, *args)` — median wall time with compile excluded
    (block_until_ready-aware), the micro-bench primitive;
  * `Throughput` — renders/sec counters for long jobs (the north-star
    metric is renders/sec/chip);
  * `MetricsLogger` — structured JSONL per-step metrics;
  * `trace(path)` — context manager around jax.profiler for TensorBoard
    traces;
  * `debug_nans()` — context manager enabling jax NaN checks (the rebuild's
    'sanitizer', SURVEY.md §5 race-detection row).
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path

import jax


def time_it(fn, *args, repeats: int = 10, warmup: int = 1, **kwargs) -> dict:
    """Median/min wall-clock seconds of fn(*args), post-warmup."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return {
        "median_s": times[len(times) // 2],
        "min_s": times[0],
        "max_s": times[-1],
        "repeats": repeats,
    }


class Throughput:
    """Rolling renders/sec (or any unit/sec) counter."""

    def __init__(self):
        self._start = time.perf_counter()
        self._count = 0

    def add(self, n: int = 1) -> None:
        self._count += n

    @property
    def per_second(self) -> float:
        dt = time.perf_counter() - self._start
        return self._count / dt if dt > 0 else 0.0

    def reset(self) -> None:
        self._start = time.perf_counter()
        self._count = 0


class MetricsLogger:
    """Append-only JSONL metrics (step, wall time, arbitrary scalars)."""

    def __init__(self, path: str | Path | None = None, echo: bool = True):
        self._path = Path(path) if path else None
        self._echo = echo
        self._t0 = time.perf_counter()
        if self._path:
            self._path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, step: int, **scalars) -> None:
        record = {
            "step": int(step),
            "wall_s": round(time.perf_counter() - self._t0, 4),
        }
        for k, v in scalars.items():
            record[k] = float(v)
        line = json.dumps(record)
        if self._path:
            with open(self._path, "a") as f:
                f.write(line + "\n")
        if self._echo:
            print(line)


@contextlib.contextmanager
def trace(log_dir: str | Path):
    """jax.profiler trace for TensorBoard ('tensorboard --logdir=...')."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Enable jax NaN debugging within the block."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
