"""Multi-host initialization and scaling measurement.

jax.distributed wiring for pod-slice training (the reference has no
distributed backend to port — SURVEY §5.8): call :func:`initialize` once per
host before any jax computation; afterwards ``jax.devices()`` spans the slice
and every Mesh built by parallel.mesh covers all hosts, with collectives
riding ICI within a slice and DCN across slices automatically.

The scaling harness measures the camera-batched train step at geometric
device counts to produce the 1-chip / 1-host / N-host efficiency curve
(north-star: ≥80% at 2 hosts).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed for multi-host execution.

    With no arguments, relies on the cluster environment (TPU pod runtime
    autodetects). No-op if already initialized or single-process.
    """
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (RuntimeError, ValueError) as e:
        # already initialized / single-process contexts
        print(f"jax.distributed.initialize skipped: {e}")


def measure_scaling(step_fn_factory, device_counts=None, iters: int = 10):
    """Step-time vs device count for a batched step.

    step_fn_factory(n_devices) must return a zero-arg callable running one
    batched step with batch == n_devices (after its own warmup). Returns
    {n: {"ms": ..., "efficiency": ...}} with efficiency relative to perfect
    weak scaling from the smallest count.
    """
    if device_counts is None:
        n = len(jax.devices())
        device_counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= n]
    results = {}
    base = None
    for n_dev in device_counts:
        fn = step_fn_factory(n_dev)
        fn()  # warmup/compile
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        ms = (time.perf_counter() - t0) / iters * 1000
        # weak scaling: n_dev cameras processed per step
        throughput = n_dev / ms
        if base is None:
            base = throughput
        results[n_dev] = {"ms": round(ms, 2),
                          "cams_per_ms": round(throughput, 4),
                          "efficiency": round(throughput / (base * n_dev /
                                                            device_counts[0]), 4)}
    return results
