"""Coverage for the utility modules: generation, timing, logging, config."""

import jax
import numpy as np

from odesat_tpu.cnf import evaluate_cnf
from odesat_tpu.utils.config import ODEConfig, SolverConfig, zeta_for_density
from odesat_tpu.utils.generate import random_ksat, uf_instance
from odesat_tpu.utils.logging import Throughput, chunk_metrics
from odesat_tpu.utils.timing import sync


def test_zeta_table():
    """Density thresholds match the reference (src/system.rs:164-173)."""
    assert zeta_for_density(7.0) == 0.1
    assert zeta_for_density(6.0) == 0.1
    assert zeta_for_density(5.0) == 0.01
    assert zeta_for_density(4.9) == 0.01
    assert zeta_for_density(1.6) == 0.001


def test_resolve_zeta_override():
    assert ODEConfig(zeta=0.5).resolve_zeta(1.0) == 0.5
    assert ODEConfig().resolve_zeta(7.0) == 0.1


def test_random_ksat_shape_and_widths():
    f = random_ksat(50, 200, k=3, seed=1)
    assert f.varnum == 50
    assert f.num_clauses == 200
    assert all(len(c) == 3 for c in f.clauses)
    assert all(len({lit.variable for lit in c}) == 3 for c in f.clauses)


def test_random_ksat_planted_is_sat():
    f = random_ksat(30, 200, k=3, seed=2, planted=True)
    # the hidden assignment must satisfy; recover it by replaying the rng
    rng = np.random.default_rng(2)
    hidden = rng.integers(0, 2, size=31).astype(bool)
    assignment = {v: bool(hidden[v]) for v in range(1, 31)}
    assert evaluate_cnf(assignment, f)


def test_uf_instance():
    f = uf_instance(100, seed=3)
    assert f.varnum == 100
    assert f.num_clauses == 426


def test_chunk_metrics_and_throughput():
    from odesat_tpu.cnf import compile_formula
    from odesat_tpu.models.ode import init_state

    f = random_ksat(10, 30, k=3, seed=4)
    from odesat_tpu.cnf import normalize_cnf_variables

    _, norm = normalize_cnf_variables(f)
    fa = compile_formula(norm, clause_pad=8, var_pad=8)
    state = init_state(fa, 4, jax.random.PRNGKey(0), ODEConfig())
    metrics = chunk_metrics(state, steps_run=10)
    assert metrics["batch"] == 4
    assert metrics["solved"] == 0
    assert "dt_med" in metrics
    assert sync(state).shape == (4,)

    tp = Throughput(batch_size=4)
    tp.add(100)
    assert tp.rate() > 0


def test_solver_config_with_ode():
    config = SolverConfig().with_ode(step_size=0.5)
    assert config.ode.step_size == 0.5
    assert config.ode.tolerance == 1e-3


def test_random_local_ksat_rejects_narrow_window():
    import pytest

    from odesat_tpu.utils.generate import random_local_ksat

    with pytest.raises(ValueError, match="locality"):
        random_local_ksat(100, 10, k=3, locality=2)


def test_profile_dir_writes_trace(tmp_path):
    """--profile-dir captures a jax.profiler trace around the solve loop."""
    import os

    from odesat_tpu.cnf import normalize_cnf_variables
    from odesat_tpu.models.ode import simulate_batch
    from odesat_tpu.utils.generate import random_ksat

    formula = random_ksat(20, 60, k=3, seed=0)
    _, normalized = normalize_cnf_variables(formula)
    prof = str(tmp_path / "trace")
    config = SolverConfig(
        ode=ODEConfig(step_size=0.01, steps=32),
        batch_size=4,
        seed=0,
        chunk_steps=16,
        profile_dir=prof,
    )
    simulate_batch(normalized, config)
    found = [
        os.path.join(r, f)
        for r, _, files in os.walk(prof)
        for f in files
    ]
    assert found, "profiler produced no trace files"


def test_chunk_growth_respects_wall_budget():
    """Chunk escalation must bound the grown chunk's predicted duration
    by the remaining wall budget — the budget is only checked between
    chunks, so an unbounded 16x growth could overshoot it by minutes."""
    import time
    from types import SimpleNamespace

    import numpy as np

    from odesat_tpu.models.loop import drive_chunks
    from odesat_tpu.utils.config import ODEConfig, SolverConfig

    sizes = []
    state0 = SimpleNamespace(done=np.zeros(1, dtype=bool))

    def make_runner(n):
        sizes.append(n)

        def run(state):
            time.sleep(0.02)  # ~0.02 s per chunk regardless of n (stub)
            return state

        return run

    config = SolverConfig(
        ode=ODEConfig(step_size=0.01),
        chunk_steps=10,
        # 8 warm-up chunks cost ~0.16 s, leaving <=0.14 s at the growth
        # decision: the steps-proportional prediction caps the grown
        # chunk at ~70 steps, well under the uncapped 16x jump to 160
        wall_clock_budget_s=0.3,
    )
    drive_chunks(
        state0,
        make_runner,
        config,
        budget=None,
        should_stop=lambda st, done: False,
    )
    # growth happened (the budget allows more than one 10-step chunk)…
    assert len(sizes) >= 2 and sizes[0] == 10
    for grown in sizes[1:]:
        # …but every grown chunk was capped by remaining_s / (s per step):
        # at ~0.02 s per 10-step chunk the full budget never supports the
        # uncapped 16x jump to 160 steps, let alone GROW_CAP
        assert grown < 160


def test_device_dispatch_plan():
    """The shared device-loop gate + sizing (models/loop.py): the user's
    chunk_steps always stands (a review found the min/max ordering once
    clamped below it), the slice scales down with batch so one dispatch
    stays ~1s, and budgets/cadences/wall-clocks gate eligibility."""
    from odesat_tpu.models.loop import device_dispatch_plan
    from odesat_tpu.utils.config import ODEConfig, SolverConfig

    mk = lambda **kw: SolverConfig(ode=ODEConfig(step_size=0.01), **kw)  # noqa: E731

    ok, d = device_dispatch_plan(mk(batch_size=1, chunk_steps=256), None)
    assert ok and d == 262144  # capped for tiny batches
    ok, d = device_dispatch_plan(mk(batch_size=16384, chunk_steps=256), None)
    assert ok and d == (1 << 28) // 16384  # ~1s of work per dispatch
    # a user chunk larger than the cap is never clamped below itself
    ok, d = device_dispatch_plan(mk(batch_size=16384, chunk_steps=500000), None)
    assert ok and d == 500000
    # budget clips the slice and gates out when <= one chunk
    ok, d = device_dispatch_plan(mk(batch_size=4, chunk_steps=256), 1000)
    assert ok and d == 1000
    ok, _ = device_dispatch_plan(mk(batch_size=4, chunk_steps=256), 256)
    assert not ok
    # wall budgets and cadences keep host-paced chunks
    ok, _ = device_dispatch_plan(
        mk(batch_size=4, chunk_steps=256, wall_clock_budget_s=5.0), None
    )
    assert not ok
    ok, _ = device_dispatch_plan(
        mk(batch_size=4, chunk_steps=256, log_every_chunks=2), None
    )
    assert not ok
