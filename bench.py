"""Benchmark harness: trajectories*steps/sec/chip on the bundled hard.cnf.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline anchor: the reference publishes no numbers (BASELINE.md) and no
Rust toolchain exists in this image, so the baseline is MEASURED live on
this host: a single-threaded C++ implementation of the same ODE semantics
(odesat_tpu/native/odesat_native.cc, odesat_baseline_steps_per_sec) runs
the identical fixed-step workload on one CPU core. If the native library
cannot build, the derived cost-model fallback from BASELINE.md is used
(2e5 steps/s, matching the measured ~190-200k steps/s on this host).
"""

import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from odesat_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from odesat_tpu.cnf import compile_formula, normalize_cnf_variables, parse_dimacs_file
from odesat_tpu.models.ode import formula_device, init_state, make_chunk_runner
from odesat_tpu.utils.config import ODEConfig

FALLBACK_BASELINE_TRAJ_STEPS_PER_SEC = 2.0e5  # cost-model fallback, see module doc

HERE = os.path.dirname(os.path.abspath(__file__))


def probe_backend(timeout_s: float) -> str | None:
    """None when device enumeration completes in time; an outage
    description when it times out.

    The tunnel-backed TPU platform hangs `jax.devices()` indefinitely
    during a backend outage (observed 2026-08-17: >600 s, infrastructure
    not framework), which would hang this whole benchmark. Healthy
    enumeration takes seconds — compiles are the slow part, not the
    probe — so a generous timeout only ever fires on a genuine outage.
    Probed in a subprocess (same env/sitecustomize, same platform
    selection) because a hung in-process backend init cannot be
    cancelled. A FAST nonzero exit is NOT an outage — it means jax or
    the platform plugin is broken — so that case re-raises with the
    subprocess stderr instead of blaming infrastructure."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
    except subprocess.TimeoutExpired:
        return (
            "accelerator backend unreachable: device enumeration did not "
            f"complete within {timeout_s:.0f}s (backend outage, not a "
            "framework failure — rerun when the device tunnel is restored)"
        )
    if r.returncode != 0:
        raise RuntimeError(
            "backend probe failed fast — framework problem, not an outage:\n"
            + r.stderr.decode("utf-8", "replace")
        )
    return None


def measure_baseline(normalized) -> float:
    """Single-core CPU steps/s on the same instance (C++; measured live).
    Best of three — the host CPU is shared, so single measurements swing
    with load and would jitter the vs_baseline ratio."""
    try:
        from odesat_tpu import native

        if native.is_available():
            # max over several short runs: the host CPU is shared, and a
            # loaded core halves the measured baseline (the TPU number is
            # stable — only this ratio's denominator swings)
            return max(
                native.baseline_steps_per_sec(
                    normalized, steps=20000, dt=0.01, zeta=0.001
                )
                for _ in range(5)
            )
    except Exception:  # noqa: BLE001 — benchmark must not die on baseline
        pass
    return FALLBACK_BASELINE_TRAJ_STEPS_PER_SEC


def bench_fixed_step(batch_size: int = 16384, chunk_steps: int = 16384, repeats: int = 3):
    from odesat_tpu.utils.timing import measure_throughput

    formula = parse_dimacs_file(os.path.join(HERE, "tests", "data", "hard.cnf"))
    _, normalized = normalize_cnf_variables(formula)
    fa = compile_formula(normalized)
    # fused kernel on TPU; bfloat16 matmuls are the documented throughput
    # mode (f32 now forces true-f32 3-pass MXU for parity — solutions are
    # oracle-verified either way, only trajectory statistics shift)
    ode = ODEConfig(step_size=0.01, dv_strategy="auto", matmul_dtype="bfloat16")
    zeta = ode.resolve_zeta(fa.density)

    dev = formula_device(fa)
    runner = make_chunk_runner(fa, zeta, ode, chunk_steps)
    state = init_state(fa, batch_size, jax.random.PRNGKey(0), ode)
    rate, _ = measure_throughput(runner, state, dev, chunk_steps, batch_size, iters=repeats)
    return rate, normalized


def main():
    timeout_s = float(os.environ.get("ODESAT_BENCH_DEVICE_TIMEOUT", "600"))
    outage = probe_backend(timeout_s) if timeout_s > 0 else None
    if outage is not None:
        print(
            json.dumps(
                {
                    "metric": "trajectories*steps/sec/chip (hard.cnf, fixed dt=0.01, b=16384)",
                    "value": 0.0,
                    "unit": "traj*steps/s",
                    "vs_baseline": 0.0,
                    "error": outage,
                }
            )
        )
        sys.exit(1)
    rate, normalized = bench_fixed_step()
    baseline = measure_baseline(normalized)
    # chunk 16384 matches what the solve loops escalate to on long runs
    # (models/ode.py chunk growth), so this is the served steady state
    result = {
        "metric": "trajectories*steps/sec/chip (hard.cnf, fixed dt=0.01, b=16384)",
        "value": round(rate, 1),
        "unit": "traj*steps/s",
        "vs_baseline": round(rate / baseline, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
