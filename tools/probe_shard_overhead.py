"""One-off probe: where does the clause-shard per-step overhead live?

Times (a) the fused fixed-step kernel as a single launch, (b) the same
launch inside a scan of N steps, (c) the whole-chunk stream kernel at
chunk=1 and chunk=N — separating per-launch cost, scan overhead, and
the kernels' intrinsic per-step cost.
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
    make_fused_clause_step,
    make_single_device_runner,
)
from odesat_tpu.ops.stream_pallas import make_stream_chunk
from odesat_tpu.preprocess import preprocess_formula
from odesat_tpu.utils.config import ODEConfig
from odesat_tpu.utils.generate import random_ksat
from odesat_tpu.utils.timing import sync


def timeit(fn, *args, iters=5):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    N = 100

    formula = random_ksat(1000, 4300, k=3, seed=7, planted=True)
    reduced, _ = preprocess_formula(formula, 7.0)
    _, normalized = normalize_cnf_variables(reduced)
    ode = ODEConfig(step_size=0.01, matmul_dtype="bfloat16")

    fa, plan = compile_stream_sharded(normalized, 1)
    print(f"Np={plan.n_vars_padded} Mp={plan.mp_local} spans={len(plan.span_meta)} "
          f"R={plan.planes.shape[1]} widths={sorted(set(w for _,_,w,_ in plan.span_meta))}")
    dev = formula_device(fa, matmul_dtype=ode.matmul_dtype)
    state = init_state(fa, B, jax.random.PRNGKey(0), ode)

    step = make_fused_clause_step(fa, 0.001, ode)
    one = jax.jit(lambda st, dv: step(st, dv))
    t_one = timeit(one, state, dev)
    print(f"fused fixed-step single launch: {t_one*1e3:.3f} ms")

    runner = make_single_device_runner(fa, 0.001, ode, N)
    t_scan = timeit(lambda st: runner(jax.tree.map(jnp.copy, st), dev), state)
    print(f"scan of {N}: {t_scan*1e3:.2f} ms -> {t_scan/N*1e3:.3f} ms/step")

    from odesat_tpu.cnf.arrays import compile_formula

    fa2 = compile_formula(normalized, bucket=True, window_sort=True)
    state2 = init_state(fa2, B, jax.random.PRNGKey(0), ode)
    dev2 = formula_device(fa2)
    for chunk in (1, N):
        kern = make_stream_chunk(fa2, 0.001, ode, chunk, donate=False)
        t = timeit(kern, state2, dev2)
        print(f"whole-chunk stream chunk={chunk}: {t*1e3:.2f} ms -> {t/chunk*1e3:.3f} ms/step")


if __name__ == "__main__":
    main()
