"""Sweep fused-kernel knobs (traj_block) on the real TPU.

Usage: python tools/sweep_fused.py [blocks ...]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

from odesat_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from odesat_tpu.cnf import compile_formula, normalize_cnf_variables, parse_dimacs_file
from odesat_tpu.models.ode import formula_device, init_state
from odesat_tpu.ops.fused_pallas import make_fused_chunk
from odesat_tpu.utils.config import ODEConfig
from odesat_tpu.utils.timing import measure_throughput

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def main():
    # args (any order): [--uf N] [--adaptive] traj_block[:interleave] ...
    argv = sys.argv[1:]
    uf = None
    adaptive = False
    specs = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--uf":
            uf = int(argv[i + 1])
            i += 2
        elif a == "--adaptive":
            adaptive = True
            i += 1
        elif ":" in a:
            tb, il = a.split(":")
            specs.append((int(tb), int(il)))
            i += 1
        else:
            specs.append((int(a), 1))
            i += 1
    specs = specs or [(256, 1), (512, 1), (1024, 1), (2048, 1)]
    if uf:
        from odesat_tpu.utils.generate import uf_instance

        formula = uf_instance(uf, seed=0)
    else:
        formula = parse_dimacs_file(os.path.join(HERE, "tests", "data", "hard.cnf"))
    _, normalized = normalize_cnf_variables(formula)
    fa = compile_formula(normalized)
    ode = (
        ODEConfig(tolerance=1e-3, matmul_dtype="bfloat16")
        if adaptive
        else ODEConfig(step_size=0.01, matmul_dtype="bfloat16")
    )
    zeta = ode.resolve_zeta(fa.density)
    dev = formula_device(fa)
    B, chunk = 16384, 2000
    for tb, il in specs:
        runner = make_fused_chunk(fa, zeta, ode, chunk, traj_block=tb, interleave=il)
        state = init_state(fa, B, jax.random.PRNGKey(0), ode)
        rate, _ = measure_throughput(runner, state, dev, chunk, B, iters=3)
        print(f"traj_block={tb:5d} interleave={il}  {rate:.3e} traj*steps/s")


if __name__ == "__main__":
    main()
