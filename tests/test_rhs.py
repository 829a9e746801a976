"""Fused RHS vs the NumPy oracle transcription of the reference kernel
(SURVEY.md §4: both rigidity variants, all dv strategies)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odesat_tpu.cnf import compile_formula, normalize_cnf_variables
from odesat_tpu.ops.oracle import compute_derivatives_oracle
from odesat_tpu.ops.rhs import build_onehot, compute_derivatives
from tests.conftest import random_formula


def _setup(seed, n_vars=12, n_clauses=30, max_width=4, min_width=1):
    rng = np.random.default_rng(seed)
    formula = random_formula(rng, n_vars, n_clauses, max_width, min_width)
    _, normalized = normalize_cnf_variables(formula)
    fa = compile_formula(normalized, dtype=np.float64, clause_pad=8, var_pad=8)
    v = rng.uniform(-1, 1, size=fa.n_vars_padded)
    xs = rng.uniform(0.001, 0.999, size=fa.n_clauses_padded)
    xl = rng.uniform(1.0, 50.0, size=fa.n_clauses_padded)
    return formula, normalized, fa, v, xs, xl


def _jax_rhs(fa, v, xs, xl, zeta, rigidity, dv_strategy, batch=False):
    kwargs = dict(
        lit_var=jnp.asarray(fa.lit_var),
        sign=jnp.asarray(fa.sign),
        lit_mask=jnp.asarray(fa.lit_mask),
        clause_mask=jnp.asarray(fa.clause_mask),
        var_occ=jnp.asarray(fa.var_occ),
        occ_mask=jnp.asarray(fa.occ_mask),
        zeta=zeta,
        rigidity=rigidity,
        dv_strategy=dv_strategy,
    )
    if dv_strategy == "onehot":
        kwargs["onehot"] = build_onehot(
            jnp.asarray(fa.lit_var), jnp.asarray(fa.lit_mask), fa.n_vars_padded, dtype=jnp.float64
        )
    f = lambda v_, xs_, xl_: compute_derivatives(v_, xs_, xl_, **kwargs)  # noqa: E731
    if batch:
        f = jax.vmap(f)
    return f(jnp.asarray(v), jnp.asarray(xs), jnp.asarray(xl))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("rigidity", ["paper", "reference"])
@pytest.mark.parametrize("dv_strategy", ["gather", "segment_sum", "onehot"])
def test_rhs_matches_oracle(seed, rigidity, dv_strategy):
    # onehot cannot represent the infinite unit-clause gradients
    # (inf * 0 = NaN in the matmul), so it is only exercised on
    # width>=2 formulas; gather/segment preserve the reference's
    # inf semantics exactly (src/system.rs:43-70)
    min_width = 2 if dv_strategy == "onehot" else 1
    formula, normalized, fa, v, xs, xl = _setup(seed, min_width=min_width)
    zeta = 0.01

    dv_o, dxs_o, dxl_o, allsat_o = compute_derivatives_oracle(
        v.copy(), xs.copy(), xl.copy(), normalized, zeta, rigidity=rigidity
    )
    dv, dxs, dxl, allsat = _jax_rhs(fa, v, xs, xl, zeta, rigidity, dv_strategy)

    np.testing.assert_allclose(np.asarray(dv)[: fa.n_vars], dv_o[: fa.n_vars], rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(dxs)[: fa.n_clauses], dxs_o[: fa.n_clauses], rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(dxl)[: fa.n_clauses], dxl_o[: fa.n_clauses], rtol=1e-9
    )
    assert bool(allsat) == allsat_o
    # padded regions contribute nothing
    assert np.all(np.asarray(dv)[fa.n_vars :] == 0)
    assert np.all(np.asarray(dxs)[fa.n_clauses :] == 0)
    assert np.all(np.asarray(dxl)[fa.n_clauses :] == 0)


def test_rhs_vmap_batches():
    _, normalized, fa, v, xs, xl = _setup(7)
    B = 5
    rng = np.random.default_rng(99)
    vb = rng.uniform(-1, 1, size=(B, fa.n_vars_padded))
    xsb = rng.uniform(0.001, 0.999, size=(B, fa.n_clauses_padded))
    xlb = rng.uniform(1.0, 50.0, size=(B, fa.n_clauses_padded))
    dv, dxs, dxl, allsat = _jax_rhs(fa, vb, xsb, xlb, 0.1, "paper", "gather", batch=True)
    assert dv.shape == (B, fa.n_vars_padded)
    assert allsat.shape == (B,)
    for b in range(B):
        dv1, _, _, _ = _jax_rhs(fa, vb[b], xsb[b], xlb[b], 0.1, "paper", "gather")
        np.testing.assert_array_equal(np.asarray(dv)[b], np.asarray(dv1))


def test_tie_semantics_duplicate_min():
    """Two literals attaining the same min: both get g = 0.5*q*min
    (second_min == min after removing one instance; src/system.rs:50-55)."""
    from odesat_tpu.cnf.formula import CNFFormula, Literal

    formula = CNFFormula([(Literal(0), Literal(1), Literal(2))], 3)
    fa = compile_formula(formula, dtype=np.float64, clause_pad=8, var_pad=8)
    v = np.zeros(fa.n_vars_padded)
    v[:3] = [0.5, 0.5, -0.2]  # values: 0.5, 0.5, 1.2 -> min dup at slots 0,1
    xs = np.full(fa.n_clauses_padded, 0.5)
    xl = np.full(fa.n_clauses_padded, 2.0)

    dv_o, *_ = compute_derivatives_oracle(v.copy(), xs.copy(), xl.copy(), formula, 0.1)
    dv, *_ = _jax_rhs(fa, v, xs, xl, 0.1, "reference", "gather")
    np.testing.assert_allclose(np.asarray(dv)[:3], dv_o[:3], rtol=1e-9)


def test_duplicate_literals_in_clause_match_oracle():
    """batch/inter skip preprocessing, so clauses can reach the kernels
    with duplicate literals (the reference walks them twice too:
    src/system.rs:35-90). Tie semantics: the duplicated min leaves
    second_min == min."""
    import jax

    from odesat_tpu.cnf import compile_formula
    from odesat_tpu.cnf.formula import CNFFormula, Literal
    from odesat_tpu.models.ode import formula_device, init_state, make_step_fn
    from odesat_tpu.ops.oracle import compute_derivatives_oracle
    from odesat_tpu.utils.config import ODEConfig

    clauses = [
        (Literal(0, False), Literal(0, False), Literal(1, True)),  # dup literal
        (Literal(1, False), Literal(1, True), Literal(2, False)),  # tautology
        (Literal(2, False), Literal(0, True), Literal(1, False)),
    ]
    formula = CNFFormula(clauses, 3)
    fa = compile_formula(formula, clause_pad=8, var_pad=8)
    ode = ODEConfig(step_size=0.01)
    state = init_state(fa, 1, jax.random.PRNGKey(0), ode)
    dev = formula_device(fa)
    step = make_step_fn(fa, 0.001, ode)
    out = step(state, dev)
    assert np.isfinite(np.asarray(out.v)).all()

    # RHS parity against the scalar oracle transcription on the same state
    from odesat_tpu.ops import rhs as rhs_ops

    v = np.asarray(state.v[0], dtype=np.float64)
    xs = np.asarray(state.xs[0], dtype=np.float64)
    xl = np.asarray(state.xl[0], dtype=np.float64)
    dv_o, dxs_o, dxl_o, _ = compute_derivatives_oracle(
        v[: formula.varnum].copy(), xs[: fa.n_clauses].copy(),
        xl[: fa.n_clauses].copy(), formula, 0.001, rigidity="paper",
    )
    dv, dxs, dxl, _ = rhs_ops.compute_derivatives(
        state.v[0], state.xs[0], state.xl[0],
        lit_var=dev.lit_var, sign=dev.sign, lit_mask=dev.lit_mask,
        clause_mask=dev.clause_mask, var_occ=dev.var_occ,
        occ_mask=dev.occ_mask, zeta=0.001, rigidity="paper",
        dv_strategy="segment_sum",
    )
    np.testing.assert_allclose(
        np.asarray(dv)[: formula.varnum], dv_o, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(dxs)[: fa.n_clauses], dxs_o, rtol=1e-5, atol=1e-6
    )


def test_zero_clause_formula_is_instantly_satisfied():
    """A formula with no clauses is vacuously SAT: every trajectory's
    allsat flag latches on the first step."""
    import jax

    from odesat_tpu.cnf import compile_formula
    from odesat_tpu.cnf.formula import CNFFormula
    from odesat_tpu.models.ode import simulate_batch
    from odesat_tpu.utils.config import ODEConfig, SolverConfig

    formula = CNFFormula([], 3)
    config = SolverConfig(
        ode=ODEConfig(step_size=0.01, steps=8), batch_size=2, seed=0,
        chunk_steps=4,
    )
    result = simulate_batch(formula, config)
    assert result.any_solved
    assert result.done.all()
