"""HBM-streaming multi-step Pallas chunk vs the lax.scan path: states
must agree after a whole chunk, for both integrators and both rigidity
modes, on a width-bucketed mixed-width formula (interpret mode on CPU).
"""

import random

import jax
import numpy as np
import pytest

from odesat_tpu.cnf import compile_formula, normalize_cnf_variables
from odesat_tpu.cnf.formula import CNFFormula, Literal
from odesat_tpu.models.ode import formula_device, init_state, make_step_fn
from odesat_tpu.ops.stream_pallas import make_stream_chunk, stream_supported
from odesat_tpu.utils.config import ODEConfig
from odesat_tpu.utils.generate import random_ksat


def _mixed_fixture(seed=0, n_vars=40, per_width=40, widths=(2, 3, 3, 3, 4, 5)):
    """Mixed clause widths → multiple static buckets, like preprocessed
    formulas whose VE resolvents widen K (reference: src/cnf.rs:481-498)."""
    rng = random.Random(seed)
    clauses = []
    for w in widths:
        for _ in range(per_width):
            vs = rng.sample(range(n_vars), w)
            clauses.append(tuple(Literal(v, rng.random() < 0.5) for v in vs))
    _, normalized = normalize_cnf_variables(CNFFormula(clauses, n_vars))
    return compile_formula(normalized, bucket=True, min_bucket=16)


def _scan(fa, ode, state, steps, zeta):
    step = make_step_fn(fa, zeta, ode)
    dev = formula_device(fa)
    for _ in range(steps):
        state = step(state, dev)
    return state


@pytest.mark.parametrize("mode", ["fixed", "adaptive"])
@pytest.mark.parametrize("rigidity", ["paper", "reference"])
def test_stream_chunk_matches_scan(mode, rigidity):
    fa = _mixed_fixture()
    assert stream_supported(fa)
    assert len(fa.bucket_slices) > 1  # exercises per-bucket span widths
    ode = ODEConfig(
        step_size=0.02 if mode == "fixed" else None,
        tolerance=1e-3,
        dv_strategy="gather",
        rigidity=rigidity,
    )
    zeta = 0.05
    state0 = init_state(fa, 8, jax.random.PRNGKey(0), ode)

    steps = 12
    ref = _scan(fa, ode, state0, steps, zeta)
    out = make_stream_chunk(fa, zeta, ode, steps, interpret=True)(state0)

    np.testing.assert_allclose(np.asarray(out.v), np.asarray(ref.v), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.xs), np.asarray(ref.xs), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.xl), np.asarray(ref.xl), rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(out.done), np.asarray(ref.done))
    if mode == "adaptive":
        np.testing.assert_allclose(np.asarray(out.dt), np.asarray(ref.dt), rtol=2e-4)


def test_stream_single_bucket_uniform_width():
    """Uniform-width (unbucketed) formulas run through the same kernel."""
    formula = random_ksat(30, 80, k=3, seed=5)
    _, normalized = normalize_cnf_variables(formula)
    fa = compile_formula(normalized)
    assert len(fa.bucket_slices) == 1
    ode = ODEConfig(step_size=0.02, dv_strategy="gather")
    state0 = init_state(fa, 8, jax.random.PRNGKey(5), ode)
    ref = _scan(fa, ode, state0, 10, 0.05)
    out = make_stream_chunk(fa, 0.05, ode, 10, interpret=True)(state0)
    np.testing.assert_allclose(np.asarray(out.v), np.asarray(ref.v), rtol=2e-4, atol=2e-5)


def test_stream_freeze_preserves_solution():
    """A solved trajectory entering a streamed chunk must come out
    unchanged (fixed mode freezes after the detecting step,
    reference: src/system.rs:141-154)."""
    fa = _mixed_fixture(seed=3, widths=(2, 3, 3))
    ode = ODEConfig(step_size=0.02)
    state = init_state(fa, 8, jax.random.PRNGKey(3), ode)

    fn = make_stream_chunk(fa, 0.05, ode, 30, interpret=True)
    out1 = fn(state)
    if not np.asarray(out1.done).any():
        pytest.skip("no trajectory solved in 30 steps for this seed")
    out2 = fn(out1)
    done1 = np.asarray(out1.done)
    np.testing.assert_array_equal(np.asarray(out2.v)[done1], np.asarray(out1.v)[done1])


@pytest.mark.parametrize("B", [1, 5, 100])
def test_stream_odd_batch_sizes(B):
    """Batches not divisible by the trajectory block are padded with
    frozen rows internally."""
    fa = _mixed_fixture(seed=6, widths=(2, 3, 4))
    ode = ODEConfig(step_size=0.02, dv_strategy="gather")
    state = init_state(fa, B, jax.random.PRNGKey(6), ode)
    out = make_stream_chunk(fa, 0.05, ode, 5, interpret=True)(state)
    assert out.v.shape[0] == B
    ref = _scan(fa, ode, state, 5, 0.05)
    np.testing.assert_allclose(np.asarray(out.v), np.asarray(ref.v), rtol=2e-4, atol=2e-5)


def test_stream_rejects_unit_clauses():
    clauses = [(Literal(0, False),), (Literal(0, True), Literal(1, False))]
    _, normalized = normalize_cnf_variables(CNFFormula(clauses, 2))
    fa = compile_formula(normalized)
    assert not stream_supported(fa)
    with pytest.raises(ValueError):
        make_stream_chunk(fa, 0.05, ODEConfig(step_size=0.02), 5, interpret=True)


def test_stream_runner_integration():
    """make_chunk_runner dispatches dv_strategy='stream' to the kernel."""
    from odesat_tpu.models.ode import make_chunk_runner

    fa = _mixed_fixture(seed=4, widths=(2, 3, 4))
    ode = ODEConfig(step_size=0.02, dv_strategy="stream")
    runner = make_chunk_runner(fa, 0.05, ode, 10)
    state = init_state(fa, 8, jax.random.PRNGKey(4), ode)
    dev = formula_device(fa)
    out = runner(state, dev)
    assert np.isfinite(np.asarray(out.v)).all()


def test_stream_windowed_locality():
    """window_sort + locally-structured clauses -> narrow per-span
    variable windows; parity with the scan path must hold."""
    from odesat_tpu.ops.stream_pallas import _build_planes, _span_budgets
    from odesat_tpu.utils.generate import random_local_ksat

    formula = random_local_ksat(512, 1536, k=3, locality=64, seed=2)
    _, normalized = normalize_cnf_variables(formula)
    fa = compile_formula(normalized, window_sort=True)
    max_rows, total_rows = _span_budgets(fa)
    # windows must be far narrower than the padded variable count
    _, spans, _ = _build_planes(fa, np.float32)
    widths = [w for _, _, w, _, _ in spans]
    assert max(widths) <= 384 < fa.n_vars_padded

    ode = ODEConfig(step_size=0.02, dv_strategy="gather")
    state0 = init_state(fa, 8, jax.random.PRNGKey(2), ode)
    ref = _scan(fa, ode, state0, 10, 0.05)
    out = make_stream_chunk(fa, 0.05, ode, 10, interpret=True)(state0)
    np.testing.assert_allclose(np.asarray(out.v), np.asarray(ref.v), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.xs), np.asarray(ref.xs), rtol=2e-4, atol=2e-5)


def test_stream_rejects_non_span_aligned_pads():
    """Formulas compiled with tiny clause pads (clause_pad < 128) are not
    streamable — stream_supported must say so instead of crashing (found
    via the 2-device multichip dry run, which pads to 8)."""
    formula = random_ksat(6, 12, k=3, seed=8)
    _, normalized = normalize_cnf_variables(formula)
    fa = compile_formula(normalized, clause_pad=8, var_pad=8)
    assert not stream_supported(fa)
    from odesat_tpu.ops.stoch_pallas import stoch_stream_supported

    assert not stoch_stream_supported(fa)


def test_stream_rejects_float64():
    from odesat_tpu.utils.config import ODEConfig
    from odesat_tpu.utils.generate import random_ksat

    formula = random_ksat(120, 500, k=3, seed=1)
    _, normalized = normalize_cnf_variables(formula)
    fa = compile_formula(normalized)
    with pytest.raises(ValueError, match="float64"):
        make_stream_chunk(fa, 0.001, ODEConfig(step_size=0.01, dtype="float64"), 4)
