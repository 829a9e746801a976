"""Fused multi-step Pallas chunk vs the lax.scan path: states must agree
after a whole chunk, for both integrators (interpret mode on CPU)."""

import jax
import numpy as np
import pytest

from odesat_tpu.cnf import compile_formula, normalize_cnf_variables
from odesat_tpu.models.ode import formula_device, init_state, make_step_fn
from odesat_tpu.ops.fused_pallas import fused_supported, make_fused_chunk
from odesat_tpu.utils.config import ODEConfig
from odesat_tpu.utils.generate import random_ksat


def _fixture(seed=0, n_vars=30, n_clauses=80, B=8):
    formula = random_ksat(n_vars, n_clauses, k=3, seed=seed)
    _, normalized = normalize_cnf_variables(formula)
    fa = compile_formula(normalized)
    return fa


def _scan(fa, ode, state, steps, zeta):
    step = make_step_fn(fa, zeta, ode)
    dev = formula_device(fa)
    for _ in range(steps):
        state = step(state, dev)
    return state


@pytest.mark.parametrize("mode", ["fixed", "adaptive"])
@pytest.mark.parametrize("seed", [0, 1])
def test_fused_chunk_matches_scan(mode, seed):
    fa = _fixture(seed)
    assert fused_supported(fa)
    ode = ODEConfig(
        step_size=0.02 if mode == "fixed" else None,
        tolerance=1e-3,
        dv_strategy="gather",
    )
    zeta = 0.05
    state0 = init_state(fa, 8, jax.random.PRNGKey(seed), ode)

    steps = 12
    ref = _scan(fa, ode, state0, steps, zeta)
    fused = make_fused_chunk(fa, zeta, ode, steps, interpret=True)
    out = fused(state0)

    np.testing.assert_allclose(np.asarray(out.v), np.asarray(ref.v), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.xs), np.asarray(ref.xs), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.xl), np.asarray(ref.xl), rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(out.done), np.asarray(ref.done))
    if mode == "adaptive":
        np.testing.assert_allclose(np.asarray(out.dt), np.asarray(ref.dt), rtol=2e-4)


def test_fused_freeze_preserves_solution():
    """A solved trajectory entering a fused chunk must come out unchanged
    (up to idempotent clamps)."""
    fa = _fixture(3)
    ode = ODEConfig(step_size=0.02)
    state = init_state(fa, 8, jax.random.PRNGKey(3), ode)

    fused = make_fused_chunk(fa, 0.05, ode, 30, interpret=True)
    out1 = fused(state)
    if not np.asarray(out1.done).any():
        pytest.skip("no trajectory solved in 30 steps for this seed")
    out2 = fused(out1)
    done1 = np.asarray(out1.done)
    np.testing.assert_array_equal(
        np.asarray(out2.v)[done1], np.asarray(out1.v)[done1]
    )


def test_fused_runner_integration():
    """make_chunk_runner dispatches dv_strategy='fused' to the kernel."""
    from odesat_tpu.models.ode import make_chunk_runner

    fa = _fixture(4)
    ode = ODEConfig(step_size=0.02, dv_strategy="fused")
    runner = make_chunk_runner(fa, 0.05, ode, 10)
    state = init_state(fa, 8, jax.random.PRNGKey(4), ode)
    dev = formula_device(fa)
    out = runner(state, dev)
    assert np.isfinite(np.asarray(out.v)).all()


@pytest.mark.parametrize("B", [1, 5, 100])
def test_fused_odd_batch_sizes(B):
    """Batches not divisible by 8 are padded internally with frozen rows."""
    fa = _fixture(6)
    ode = ODEConfig(step_size=0.02)
    state = init_state(fa, B, jax.random.PRNGKey(6), ode)
    fused = make_fused_chunk(fa, 0.05, ode, 5, interpret=True)
    out = fused(state)
    assert out.v.shape[0] == B
    # parity vs scan path
    ref = _scan(fa, ODEConfig(step_size=0.02, dv_strategy="gather"), state, 5, 0.05)
    np.testing.assert_allclose(np.asarray(out.v), np.asarray(ref.v), rtol=2e-4, atol=2e-5)


def test_fused_rejects_float64():
    """f64 runs must not silently downcast through the f32 kernel
    (reference is f64 throughout, src/system.rs:6-11)."""
    fa = _fixture()
    with pytest.raises(ValueError, match="float64"):
        make_fused_chunk(fa, 0.001, ODEConfig(step_size=0.01, dtype="float64"), 4)


def test_fused_rejects_shared_dt_via_runner():
    from odesat_tpu.models.ode import make_chunk_runner

    fa = _fixture()
    ode = ODEConfig(dt_mode="shared", dv_strategy="fused")
    with pytest.raises(ValueError, match="shared"):
        make_chunk_runner(fa, 0.001, ode, 4)


@pytest.mark.parametrize("rigidity", ["paper", "reference"])
def test_fused_exact_zero_clause_values(rigidity):
    """v pinned at exactly +-1 makes satisfied literals' clause values
    exactly 0.0 — the only state where the reference-mode gate
    (valk == c, src/system.rs:73) actually fires, and the edge the
    A1/A2 contribution forms (where(is_min, A2 + b*valk, A1) and the
    gate-multiply b*(valk*gate); ops/fused_pallas.py) must keep
    f32-exact vs the scan path."""
    import jax.numpy as jnp

    fa = _fixture(5)
    ode = ODEConfig(step_size=0.02, rigidity=rigidity)
    state0 = init_state(fa, 8, jax.random.PRNGKey(5), ode)
    v = np.asarray(state0.v).copy()
    # pin every other variable to an exact +-1 so some clauses hold a
    # zero-value literal while others stay unsatisfied
    v[:, 0::2] = np.where(v[:, 0::2] >= 0, 1.0, -1.0)
    state0 = state0._replace(v=jnp.asarray(v))

    steps = 8
    ref = _scan(fa, ode, state0, steps, 0.05)
    fused = make_fused_chunk(fa, 0.05, ode, steps, interpret=True)
    out = fused(state0)

    np.testing.assert_allclose(np.asarray(out.v), np.asarray(ref.v), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.xs), np.asarray(ref.xs), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.xl), np.asarray(ref.xl), rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(out.done), np.asarray(ref.done))
