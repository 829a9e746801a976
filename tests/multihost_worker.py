"""Worker for tests/test_multihost.py: one of two coordinated CPU
processes. Initializes distributed JAX, builds the pod mesh, runs a
sharded solve chunk over the GLOBAL mesh, and checks the all-gathered
result against a locally-computed single-device reference.

argv: coordinator_address num_processes process_id
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from jax.sharding import NamedSharding

from odesat_tpu.cnf import compile_formula, normalize_cnf_variables, parse_dimacs_file
from odesat_tpu.models.ode import formula_device, init_state, make_chunk_runner
from odesat_tpu.parallel.multihost import initialize_distributed, make_pod_mesh
from odesat_tpu.parallel.sharded import (
    STATE_SPECS,
    dev_specs_for,
    make_sharded_chunk_runner,
)
from odesat_tpu.utils.config import ODEConfig


def to_global(x, sharding):
    """Host-local full array -> global sharded array (every process holds
    the same full value, so each device shard is a slice of it)."""
    import jax.numpy as jnp

    arr = jnp.asarray(x)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])


def main():
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    initialize_distributed(coordinator_address=coord, num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    n_dev = len(jax.devices())
    assert n_dev == 4 * nproc, n_dev

    mesh = make_pod_mesh()  # traj axis over every device in the job
    data = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "hard.cnf")
    formula = parse_dimacs_file(data)
    _, normalized = normalize_cnf_variables(formula)
    fa = compile_formula(normalized)
    ode = ODEConfig(step_size=0.01)
    B = 2 * n_dev

    state = init_state(fa, B, jax.random.PRNGKey(0), ode)
    dev = formula_device(fa)

    # reference on this process's local devices (deterministic inputs)
    ref = make_chunk_runner(fa, 0.001, ode, 8)(
        jax.tree.map(lambda x: x.copy(), state), dev
    )
    ref_v = np.asarray(ref.v)

    gstate = jax.tree.map(
        lambda x, s: to_global(x, NamedSharding(mesh, s)), state, STATE_SPECS
    )
    gdev = jax.tree.map(
        lambda x, s: to_global(x, NamedSharding(mesh, s)), dev, dev_specs_for(dev)
    )
    runner = make_sharded_chunk_runner(fa, 0.001, ode, 8, mesh)
    out = runner(gstate, gdev)

    from jax.experimental import multihost_utils

    v_global = multihost_utils.process_allgather(out.v, tiled=True)
    np.testing.assert_allclose(np.asarray(v_global), ref_v, rtol=1e-6, atol=1e-7)
    print(f"MULTIHOST_OK pid={pid}", flush=True)


if __name__ == "__main__":
    main()
