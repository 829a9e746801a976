"""Benchmark timing helpers.

On this TPU's remote-execution backend, ``jax.block_until_ready`` does
NOT reliably wait for computation to finish (dispatches are acknowledged
asynchronously), so every measurement must force a device->host transfer
of data that depends on the computation. ``sync(state)`` pulls the small
``done`` flags — an output of the same executable — which cannot be
materialized before the whole step program has run.
"""

from __future__ import annotations

import time

import numpy as np


def sync(state) -> np.ndarray:
    """Force completion of all pending work on ``state`` by pulling its
    done flags to the host."""
    return np.asarray(state.done)


def measure_throughput(runner, state, dev, chunk_steps: int, batch: int, iters: int = 3):
    """Steady-state trajectories*steps/s: warmup (compile) + timed iters,
    synced by a host pull. Returns (rate, final_state)."""
    state = runner(state, dev)
    sync(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = runner(state, dev)
    sync(state)
    elapsed = time.perf_counter() - t0
    return batch * chunk_steps * iters / elapsed, state
