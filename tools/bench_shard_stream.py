"""Single-chip shard-overhead measurement for the clause-sharded
streaming path (VERDICT round 1, item 1 done-criterion).

With one real chip we cannot time a multi-device clause mesh, but the
per-step cost structure can be measured exactly: the clause-sharded path
is (per-RHS Pallas kernel + XLA Euler step in a scan) vs the
whole-chunk stream kernel's (everything fused in one launch, state
resident in VMEM). Running the shard kernel at n_shards=1 on the same
instance quantifies the per-step kernel-launch + HBM round-trip
overhead a clause shard pays — the number RESULTS.md reports.

Usage: python tools/bench_shard_stream.py [batch] [chunk]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from odesat_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from odesat_tpu.cnf import normalize_cnf_variables
from odesat_tpu.models.ode import formula_device, init_state
from odesat_tpu.ops.shard_stream import (
    compile_stream_sharded,
    make_single_device_runner,
)
from odesat_tpu.ops.stream_pallas import make_stream_chunk, stream_supported
from odesat_tpu.preprocess import preprocess_formula
from odesat_tpu.utils.config import ODEConfig
from odesat_tpu.utils.generate import random_ksat
from odesat_tpu.utils.timing import measure_throughput


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    formula = random_ksat(1000, 4300, k=3, seed=7, planted=True)
    t0 = time.perf_counter()
    reduced, _ = preprocess_formula(formula, 7.0)
    print(f"preprocess: {time.perf_counter() - t0:.1f}s -> "
          f"{reduced.num_clauses} clauses / {reduced.varnum} vars")
    _, normalized = normalize_cnf_variables(reduced)

    ode = ODEConfig(step_size=0.01, matmul_dtype="bfloat16")

    # clause-sharded path at n_shards=1: per-RHS kernel + XLA step scan
    fa, plan = compile_stream_sharded(normalized, 1)
    dev = formula_device(fa, matmul_dtype=ode.matmul_dtype)
    runner = make_single_device_runner(fa, 0.001, ode, chunk)
    state = init_state(fa, B, jax.random.PRNGKey(0), ode)
    rate_shard, _ = measure_throughput(runner, state, dev, chunk, B, iters=3)
    print(f"shard-stream RHS (S=1): {rate_shard:.3e} traj*steps/s")

    # whole-chunk clause-shard kernel at S=1 (in-kernel reduce degenerates;
    # validates + prices the non-collective body on real hardware)
    from odesat_tpu.ops.shard_chunk import make_shard_chunk_call

    call = make_shard_chunk_call(fa, 0.001, ode, chunk)

    def chunk_runner(st, dv):
        v, xs, xl, dt2, done = call(
            st.v, st.xs, st.xl, st.dt, st.done,
            dv.planes[0], dv.span_lo[0], dv.span_bias[0], dv.clause_mask,
        )
        from odesat_tpu.models.ode import ODEState

        return ODEState(v, xs, xl, dt2, done)

    jit_chunk = jax.jit(chunk_runner, donate_argnums=0)
    state_c = init_state(fa, B, jax.random.PRNGKey(0), ode)
    rate_sc, _ = measure_throughput(jit_chunk, state_c, dev, chunk, B, iters=3)
    print(f"shard-chunk kernel (S=1, whole chunk): {rate_sc:.3e} traj*steps/s")

    # whole-chunk stream kernel on the same instance (its own layout)
    from odesat_tpu.cnf.arrays import compile_formula

    fa2 = compile_formula(normalized, bucket=True, window_sort=True)
    assert stream_supported(fa2, 2)
    kern = make_stream_chunk(fa2, 0.001, ode, chunk)
    state2 = init_state(fa2, B, jax.random.PRNGKey(0), ode)
    dev2 = formula_device(fa2)
    rate_chunk, _ = measure_throughput(kern, state2, dev2, chunk, B, iters=3)
    print(f"whole-chunk stream kernel: {rate_chunk:.3e} traj*steps/s")
    print(f"per-step-launch overhead factor: {rate_chunk / rate_shard:.2f}x")
    print(f"shard-chunk overhead factor: {rate_chunk / rate_sc:.2f}x")


if __name__ == "__main__":
    main()
