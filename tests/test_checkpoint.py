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
    restored, steps, layout = load_state(path, ODEState)

    assert steps == 123
    assert layout is None  # no mesh layout recorded by direct save_state
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

    restored, steps, layout = load_state(path, StochState)
    assert 0 < steps <= 64
    assert restored.v.shape[0] == 4
    assert layout == (1, 1)  # search records the (traj, clause) layout

    resumed_config = dataclasses.replace(
        config, resume_from=path, checkpoint_path=None, checkpoint_every_chunks=0
    )
    resumed = search(normalized, resumed_config)
    # budget counts from the snapshot's step counter
    assert resumed.steps == 64


def test_cross_engine_resume_rejected(tmp_path, data_dir):
    """An ODE snapshot resumed by the stoch engine (and vice versa, and a
    hybrid snapshot by either) must fail with a clean ValueError, not a
    raw KeyError/TypeError."""
    import pytest

    from odesat_tpu.models.stoch import StochState, init_stoch_state
    from odesat_tpu.utils.checkpoint import save_hybrid_state

    formula = parse_dimacs_file(os.path.join(data_dir, "small.cnf"))
    _, normalized = normalize_cnf_variables(formula)
    fa = compile_formula(normalized, clause_pad=8, var_pad=8)
    ode_state = init_state(fa, 4, jax.random.PRNGKey(0), ODEConfig())
    stoch_state = init_stoch_state(fa, 4, jax.random.PRNGKey(1))

    ode_path = str(tmp_path / "ode.npz")
    save_state(ode_path, ode_state, steps=10)
    with pytest.raises(ValueError, match="do not match StochState"):
        load_state(ode_path, StochState)

    hyb_path = str(tmp_path / "hyb.npz")
    save_hybrid_state(hyb_path, ode_state, stoch_state, steps=10)
    with pytest.raises(ValueError, match="hybrid snapshot"):
        load_state(hyb_path, ODEState)


def test_mesh_layout_clause_mismatch_rejected_traj_resharding_allowed(
    tmp_path, data_dir
):
    """The clause axis changes the compiled clause order, so a
    clause-mismatched ODE resume must be rejected — but the trajectory
    axis is pure data parallelism for the ODE state (nothing reorders),
    so resuming an ODE snapshot on a different --devices count is legal
    resharding and must succeed."""
    import dataclasses

    import pytest

    from odesat_tpu.models.ode import simulate_batch
    from odesat_tpu.parallel.mesh import make_mesh
    from odesat_tpu.utils.config import SolverConfig

    formula = parse_dimacs_file(os.path.join(data_dir, "hard.cnf"))
    _, normalized = normalize_cnf_variables(formula)
    path = str(tmp_path / "mesh.npz")
    config = SolverConfig(
        ode=ODEConfig(step_size=0.01, steps=100),
        batch_size=8,
        seed=3,
        chunk_steps=50,
        checkpoint_path=path,
        checkpoint_every_chunks=1,
    )
    simulate_batch(normalized, config, mesh=make_mesh(8, 1))
    assert os.path.exists(path)

    resumed = dataclasses.replace(config, resume_from=path, checkpoint_every_chunks=0)
    # traj resharding: the (8,1) snapshot resumes unsharded (1,1)
    res = simulate_batch(normalized, resumed)
    assert res.steps >= 100
    # clause mismatch is the dangerous one and still rejects
    with pytest.raises(ValueError, match="resume with the same"):
        simulate_batch(normalized, resumed, mesh=make_mesh(4, 2))


def test_stoch_mesh_layout_mismatch_still_fully_rejected(tmp_path, data_dir):
    """The stoch engine's per-device key layout depends on the traj
    width, so its snapshots keep the FULL (traj, clause) check."""
    import pytest

    from odesat_tpu.utils.checkpoint import validate_mesh_layout

    # traj-only difference: rejected with the default full check...
    with pytest.raises(ValueError, match="resume with the same"):
        validate_mesh_layout((8, 1), None, what="stoch snapshot")
    # ...but legal for traj-insensitive (ODE) resumes
    validate_mesh_layout((8, 1), None, what="ODE snapshot", traj_sensitive=False)
    # clause difference always rejects
    with pytest.raises(ValueError, match="resume with the same"):
        validate_mesh_layout((1, 2), None, what="ODE snapshot", traj_sensitive=False)


def test_hybrid_snapshot_field_mismatch_clean_error(tmp_path):
    """A hybrid snapshot whose per-engine fields don't match the current
    state classes (cross-version or corrupted file) must fail with the
    clean resume-with-the-engine-that-wrote-it error, not a KeyError."""
    import numpy as np
    import pytest

    from odesat_tpu.models.ode import ODEState
    from odesat_tpu.models.stoch import StochState
    from odesat_tpu.utils.checkpoint import load_hybrid_state

    path = str(tmp_path / "hybrid_bad.npz")
    np.savez(
        path,
        ode_fields=np.asarray(["v", "mystery"]),
        stoch_fields=np.asarray(list(StochState._fields)),
        ode_v=np.zeros((2, 4)),
        ode_mystery=np.zeros((2,)),
        steps=np.asarray(10),
        **{f"stoch_{f}": np.zeros((2,)) for f in StochState._fields},
    )
    with pytest.raises(ValueError, match="engine version that wrote it"):
        load_hybrid_state(path, ODEState, StochState)
