"""Checkpoint/resume round-trip (SURVEY.md §5)."""

import os

import jax
import numpy as np

from odesat_tpu.cnf import compile_formula, normalize_cnf_variables, parse_dimacs_file
from odesat_tpu.models.ode import ODEState, init_state
from odesat_tpu.utils.checkpoint import load_state, save_state
from odesat_tpu.utils.config import ODEConfig


def test_checkpoint_roundtrip(tmp_path, data_dir):
    formula = parse_dimacs_file(os.path.join(data_dir, "small.cnf"))
    _, normalized = normalize_cnf_variables(formula)
    fa = compile_formula(normalized, clause_pad=8, var_pad=8)
    state = init_state(fa, 4, jax.random.PRNGKey(0), ODEConfig())

    path = str(tmp_path / "ckpt.npz")
    save_state(path, state, steps=123)
    restored, steps = load_state(path, ODEState)

    assert steps == 123
    for a, b in zip(state, restored):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_from_checkpoint(tmp_path, data_dir):
    """A solve checkpointed mid-run and resumed must account resumed
    steps against the budget and finish."""
    import dataclasses
    from odesat_tpu.models.ode import simulate_batch
    from odesat_tpu.utils.config import ODEConfig, SolverConfig

    formula = parse_dimacs_file(os.path.join(data_dir, "hard.cnf"))
    _, normalized = normalize_cnf_variables(formula)
    path = str(tmp_path / "resume.npz")

    config = SolverConfig(
        ode=ODEConfig(step_size=0.01, steps=200),
        batch_size=4,
        seed=9,
        chunk_steps=50,
        checkpoint_path=path,
        checkpoint_every_chunks=1,
    )
    r1 = simulate_batch(normalized, config)
    assert os.path.exists(path)

    resumed = dataclasses.replace(config, resume_from=path, checkpoint_every_chunks=0)
    r2 = simulate_batch(normalized, resumed)
    # snapshot taken at a 50-step boundary; resumed run continues to 200
    assert r2.steps == 200


def test_checkpoint_cadence_respected_for_small_batches(tmp_path, data_dir):
    """The small-batch chunk-growth heuristic must not defeat explicit
    checkpoint cadence (regression: B=8 runs grew the chunk to the whole
    budget, so no checkpoint was ever written)."""
    import os

    from odesat_tpu.cnf import normalize_cnf_variables, parse_dimacs_file
    from odesat_tpu.models.ode import simulate_batch
    from odesat_tpu.utils.config import ODEConfig, SolverConfig

    formula = parse_dimacs_file(os.path.join(data_dir, "hard.cnf"))
    _, normalized = normalize_cnf_variables(formula)
    path = str(tmp_path / "cadence.npz")
    config = SolverConfig(
        ode=ODEConfig(step_size=0.01, steps=512),
        batch_size=8,
        seed=5,
        chunk_steps=128,
        checkpoint_path=path,
        checkpoint_every_chunks=2,
    )
    simulate_batch(normalized, config)
    assert os.path.exists(path)


def test_stoch_checkpoint_resume(tmp_path, data_dir):
    """The stoch loop has the same ops plumbing as the ODE loop
    (VERDICT round 1): snapshots are written on cadence and a resumed
    search accounts the resumed steps against the budget."""
    import dataclasses

    from odesat_tpu.models.stoch import StochState, search
    from odesat_tpu.utils.config import SolverConfig

    formula = parse_dimacs_file(os.path.join(data_dir, "hard.cnf"))
    _, normalized = normalize_cnf_variables(formula)
    path = str(tmp_path / "stoch.npz")

    config = SolverConfig(
        ode=ODEConfig(steps=64),
        batch_size=4,
        seed=0,
        chunk_steps=16,
        checkpoint_path=path,
        checkpoint_every_chunks=1,
    )
    first = search(normalized, config)
    assert first.steps == 64
    assert os.path.exists(path)

    restored, steps = load_state(path, StochState)
    assert 0 < steps <= 64
    assert restored.v.shape[0] == 4

    resumed_config = dataclasses.replace(
        config, resume_from=path, checkpoint_path=None, checkpoint_every_chunks=0
    )
    resumed = search(normalized, resumed_config)
    # budget counts from the snapshot's step counter
    assert resumed.steps == 64
