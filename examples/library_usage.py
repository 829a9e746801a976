"""Library API tour: everything the CLI does, programmatically.

Run: python examples/library_usage.py [path/to/file.cnf]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Honor an explicit JAX_PLATFORMS (e.g. =cpu) even when a site boot hook
# pins the platform via jax.config — same convention as the CLI.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import odesat_tpu as ot

path = sys.argv[1] if len(sys.argv) > 1 else "tests/data/easy.cnf"

# 1. parse + preprocess (native C++ when available) + normalize
formula = ot.parse_dimacs(open(path).read())
reduced, trace = ot.preprocess_formula(formula, target_ratio=7.0)
var_mapping, normalized = ot.normalize_cnf_variables(reduced)
print(f"{formula.num_clauses} clauses / {formula.varnum} vars "
      f"-> {reduced.num_clauses} / {reduced.varnum} after preprocessing")

# 2. batched ODE solve (auto-selects the fused Pallas kernel on TPU)
config = ot.SolverConfig(
    ode=ot.ODEConfig(steps=20_000),  # adaptive step, tolerance 1e-3
    batch_size=1024,
    seed=0,
)
result = ot.simulate_batch(normalized, config)
print(f"solved={result.any_solved} after {result.steps} steps "
      f"in {result.wall_time_s:.2f}s ({result.done.sum()} trajectories)")

# 3. map back through normalization + witness reconstruction, then verify
assignment = ot.cnf.map_values_by_indices(var_mapping, result.best_assignment())
ot.reconstruct_witness(assignment, trace)
print("verified:", ot.evaluate_cnf(assignment, formula))

# 4. the stochastic engine on the same formula
stoch_result = ot.search(normalized, ot.SolverConfig(
    ode=ot.ODEConfig(steps=100_000), batch_size=256, seed=1))
print("stoch solved:", stoch_result.solved_index is not None)

# 5. multi-device: shard trajectories (and clauses) over a mesh
if len(jax.devices()) > 1:
    from odesat_tpu.parallel import make_mesh

    mesh = make_mesh(len(jax.devices()), 1)
    result = ot.simulate_batch(normalized, config, mesh=mesh)
    print("sharded solve:", result.any_solved)

    # the stochastic engine shards the same way (per-device PRNG streams)
    s = ot.search(normalized, ot.SolverConfig(
        ode=ot.ODEConfig(steps=50_000), batch_size=len(jax.devices()) * 64,
        seed=2), mesh=mesh)
    print("sharded stoch:", s.solved_index is not None)

    # huge CNFs: put devices on the clause axis instead — compile_for_mesh
    # lays the clause arrays out as identically-shaped shard segments and
    # the step runs the clause-sharded streaming kernel with dv psum'd
    # over ICI (ops/shard_stream.py)
    if len(jax.devices()) % 2 == 0:
        mesh2 = make_mesh(len(jax.devices()) // 2, 2)
        result = ot.simulate_batch(normalized, config, mesh=mesh2)
        print("clause-sharded solve:", result.any_solved)

# 6. serving: same-shape instances reuse the compiled kernel (plus an
# on-disk compilation cache across processes)
from odesat_tpu.utils.cache import enable_compilation_cache
from odesat_tpu.utils.generate import uf_instance

enable_compilation_cache()
for seed in range(3):
    _, inst = ot.normalize_cnf_variables(uf_instance(100, seed=seed))
    r = ot.simulate_batch(inst, ot.SolverConfig(
        ode=ot.ODEConfig(step_size=0.01, steps=5000), batch_size=512, seed=seed))
    print(f"instance {seed}: solved={r.any_solved} in {r.wall_time_s:.2f}s"
          + (" (compile)" if seed == 0 else " (cached kernel)"))
