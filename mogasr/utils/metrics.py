"""Structured metrics/logging and profiling hooks (SURVEY.md §5).

- JSONL metrics: every run appends per-step dicts to ``runs/<name>/metrics.jsonl``
  (WER, loglik, RTF, throughput) — greppable observability without a server.
- Timing: wall-clock around ``block_until_ready`` (the honest way to time XLA).
- Profiling: ``trace()`` wraps a block in ``jax.profiler.trace`` producing
  XProf/Perfetto dumps; ``jax.named_scope`` annotates pipeline stages.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Iterator, Optional

import jax


class RunLogger:
    def __init__(self, run_dir: str, echo: bool = True):
        self.run_dir = run_dir
        self.echo = echo
        os.makedirs(run_dir, exist_ok=True)
        self.path = os.path.join(run_dir, "metrics.jsonl")

    def log(self, record: Dict[str, Any]) -> None:
        record = dict(record, time=time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(record, default=_to_py) + "\n")
        if self.echo:
            short = {k: v for k, v in record.items() if k != "time"}
            print(json.dumps(short, default=_to_py))

    def save_config(self, cfg) -> None:
        with open(os.path.join(self.run_dir, "config.json"), "w") as f:
            f.write(cfg.to_json())


def _to_py(x):
    try:
        return float(x)
    except (TypeError, ValueError):
        return str(x)


_FENCE_FN = None


def device_fence() -> None:
    """Block until all work enqueued so far on the default device finishes.

    PJRT executes a device's programs in launch order, so blocking on a
    freshly enqueued no-op program waits for everything before it.
    (jax.effects_barrier alone only waits for side-effecting computations.)
    The no-op is jitted once at module scope — a per-call jit would re-trace
    and put its compile time inside the measured interval.
    """
    import jax.numpy as jnp

    global _FENCE_FN
    if _FENCE_FN is None:
        _FENCE_FN = jax.jit(lambda x: x + 1)
    jax.block_until_ready(_FENCE_FN(jnp.zeros(())))
    jax.effects_barrier()


class Timer:
    """Wall-clock timer that forces device completion at both edges."""

    def __enter__(self):
        device_fence()
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        device_fence()
        self.seconds = time.perf_counter() - self.t0
        return False


def timed(fn, *args, reps: int = 1, warmup: int = 1):
    """Run fn reps times after warmup; returns (last_result, sec_per_call)."""
    out = None
    for _ in range(warmup):
        out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return out, (time.perf_counter() - t0) / reps


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace when log_dir given; no-op otherwise."""
    if log_dir:
        with jax.profiler.trace(log_dir):
            yield
    else:
        yield


def rtf(audio_seconds: float, wall_seconds: float) -> float:
    """Real-time factor: processing time / audio time (lower is better)."""
    return wall_seconds / max(audio_seconds, 1e-9)
