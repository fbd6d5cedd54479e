"""Profiling / tracing helpers.

The reference's only profiling is an opt-in cProfile around the whole run
(graph_mpe_runner.py:42-46, dumped top-30 cumtime at :196-202) plus
commented-out wall-clock phase timers (:145-155).  TPU-native equivalents:

- ``phase_timer``    per-phase wall-clock that MATERIALIZES device values
                     (np.asarray) before reading the clock — on the axon
                     tunnel ``block_until_ready`` does not actually wait.
- ``trace``          context manager around ``jax.profiler.trace`` producing
                     a TensorBoard/XProf trace directory.
- ``compile_report`` one-line cost analysis of a jitted function (FLOPs,
                     bytes accessed) from XLA's own cost model.
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import numpy as np

import jax


@contextlib.contextmanager
def phase_timer(name: str, sink: dict | None = None, result_ref: list | None = None):
    """Times a phase; pass ``result_ref=[device_array]`` to force-materialize
    its first element before stopping the clock."""
    t0 = time.perf_counter()
    yield
    if result_ref:
        jax.tree.map(np.asarray, result_ref[0])
    dt = time.perf_counter() - t0
    if sink is not None:
        sink[name] = sink.get(name, 0.0) + dt
    else:
        print(f"[{name}] {dt*1e3:.1f} ms", flush=True)


@contextlib.contextmanager
def trace(log_dir: str):
    with jax.profiler.trace(log_dir):
        yield
    print(f"profiler trace written to {log_dir}", flush=True)


def compile_report(fn: Callable, *args: Any, **kwargs: Any) -> dict:
    """Compile ``fn`` and report XLA's cost analysis (flops, bytes)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    out = {
        "flops": float(cost.get("flops", float("nan"))),
        "bytes_accessed": float(cost.get("bytes accessed", float("nan"))),
    }
    try:
        mem = compiled.memory_analysis()
        out["peak_bytes"] = int(
            getattr(mem, "temp_size_in_bytes", 0)
            + getattr(mem, "argument_size_in_bytes", 0)
            + getattr(mem, "output_size_in_bytes", 0)
        )
    except Exception:
        pass
    return out
