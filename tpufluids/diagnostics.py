"""Observability: structured metrics, blow-up detection, profiling.

The reference's instrumentation is stdout prints of the step index,
cudaEvent kernel milliseconds and particle/merge counts (solver.cu:
172-197; solver-unidyn.cu:314-348), plus per-stage
``cudaGetLastError`` string comparisons.  Here:

* per-step metrics (StepMetrics) stream to JSONL;
* a NaN/blow-up guard halts the run and dumps a checkpoint (the analog
  of the reference's fail-fast CUDA_CHECK_RETURN, FluidGPU.cuh:34-41);
* ``profile`` wraps a region in a jax.profiler trace with honest
  ``block_until_ready`` fencing.
"""

from __future__ import annotations

import contextlib
import json
import time

import jax
import numpy as np


class MetricsLogger:
    """Append per-step metrics dicts as JSON lines."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "a", buffering=1)

    def log(self, step: int, metrics, wall_s: float | None = None):
        """``metrics`` is a StepMetrics (stacked over a chunk) or dict."""
        if hasattr(metrics, "_asdict"):
            metrics = metrics._asdict()
        rec = {"step": int(step)}
        if wall_s is not None:
            rec["wall_s"] = float(wall_s)
        for k, v in metrics.items():
            v = np.asarray(v)
            rec[k] = float(v.reshape(-1)[-1])  # last step of the chunk
        self._f.write(json.dumps(rec) + "\n")
        return rec

    def close(self):
        self._f.close()


class BlowUpError(RuntimeError):
    pass


def check_state(state, cfg, max_speed: float = 1e3,
                dump_path: str | None = None) -> None:
    """Halt on NaN/Inf or runaway velocity; optionally dump a checkpoint
    first so the failure is inspectable/resumable."""
    pos = np.asarray(state.pos)
    vel = np.asarray(state.vel)
    bad = []
    if not np.isfinite(pos).all():
        bad.append("non-finite positions")
    if not np.isfinite(vel).all():
        bad.append("non-finite velocities")
    alive = np.asarray(state.alive)
    speed = np.linalg.norm(vel, axis=-1)
    if np.any(alive & (speed > max_speed)):
        bad.append(f"speed exceeds {max_speed}")
    if bad:
        if dump_path is not None:
            from tpufluids.io import checkpoint
            checkpoint.save(dump_path, state, cfg)
            bad.append(f"state dumped to {dump_path}")
        raise BlowUpError("; ".join(bad))


@contextlib.contextmanager
def profile(name: str, arrays=(), trace_dir: str | None = None):
    """Wall-time a region with block_until_ready fencing; optionally
    capture a jax.profiler trace (Perfetto-compatible)."""
    ctx = (jax.profiler.trace(trace_dir) if trace_dir
           else contextlib.nullcontext())
    with ctx:
        t0 = time.perf_counter()
        holder = {}
        yield holder
        for a in arrays:
            jax.block_until_ready(a)
        holder["seconds"] = time.perf_counter() - t0
        holder["name"] = name
