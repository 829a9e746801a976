"""Benchmark harness: trajectories*steps/sec/chip on the bundled hard.cnf.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline anchor: the reference publishes no numbers (BASELINE.md) and no
Rust toolchain exists in this image, so the comparison uses the derived
cost model from BASELINE.md: one reference fixed step on hard.cnf is one
compute_derivatives pass over 160 clauses x 3 literals (~480 literal
visits through a heap-allocated slab, src/system.rs:25-91) plus a clamped
update. A generously fast single-core estimate is 1e6 steps/s (1 us/step)
for one trajectory => baseline 1e6 trajectories*steps/s.
"""

import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from odesat_tpu.cnf import compile_formula, normalize_cnf_variables, parse_dimacs_file
from odesat_tpu.models.ode import formula_device, init_state, make_chunk_runner
from odesat_tpu.utils.config import ODEConfig

RUST_SINGLE_CORE_TRAJ_STEPS_PER_SEC = 1.0e6  # derived cost model, see module doc

HERE = os.path.dirname(os.path.abspath(__file__))


def bench_fixed_step(batch_size: int = 16384, chunk_steps: int = 2000, repeats: int = 3):
    from odesat_tpu.utils.timing import measure_throughput

    formula = parse_dimacs_file(os.path.join(HERE, "tests", "data", "hard.cnf"))
    _, normalized = normalize_cnf_variables(formula)
    fa = compile_formula(normalized)
    ode = ODEConfig(step_size=0.01, dv_strategy="auto")  # fused kernel on TPU
    zeta = ode.resolve_zeta(fa.density)

    dev = formula_device(fa)
    runner = make_chunk_runner(fa, zeta, ode, chunk_steps)
    state = init_state(fa, batch_size, jax.random.PRNGKey(0), ode)
    rate, _ = measure_throughput(runner, state, dev, chunk_steps, batch_size, iters=repeats)
    return rate


def main():
    rate = bench_fixed_step()
    result = {
        "metric": "trajectories*steps/sec/chip (hard.cnf, fixed dt=0.01, b=16384)",
        "value": round(rate, 1),
        "unit": "traj*steps/s",
        "vs_baseline": round(rate / RUST_SINGLE_CORE_TRAJ_STEPS_PER_SEC, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
