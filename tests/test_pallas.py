"""Pallas fused RHS vs the jnp gather path (numerical parity) — runs in
interpreter mode on CPU (SURVEY.md §7 step 7: 'keep the jnp path as the
correctness oracle')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odesat_tpu.cnf import compile_formula, normalize_cnf_variables
from odesat_tpu.ops.rhs import compute_derivatives
from odesat_tpu.ops.rhs_pallas import make_pallas_rhs
from odesat_tpu.utils.generate import random_ksat
from tests.conftest import random_formula


def _setup(seed=0, n_vars=20, n_clauses=50, B=8, k=3):
    formula = random_ksat(n_vars, n_clauses, k=k, seed=seed)
    _, normalized = normalize_cnf_variables(formula)
    fa = compile_formula(normalized, clause_pad=128, var_pad=128)
    rng = np.random.default_rng(seed + 100)
    v = rng.uniform(-1, 1, size=(B, fa.n_vars_padded)).astype(np.float32)
    xs = rng.uniform(0.001, 0.999, size=(B, fa.n_clauses_padded)).astype(np.float32)
    xl = rng.uniform(1.0, 50.0, size=(B, fa.n_clauses_padded)).astype(np.float32)
    return fa, v, xs, xl


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("rigidity", ["paper", "reference"])
def test_pallas_matches_jnp(seed, rigidity):
    fa, v, xs, xl = _setup(seed)
    zeta = 0.05
    pallas_fn = make_pallas_rhs(fa, zeta=zeta, rigidity=rigidity, interpret=True)
    dv_p, dxs_p, dxl_p, allsat_p = pallas_fn(jnp.asarray(v), jnp.asarray(xs), jnp.asarray(xl))

    dv, dxs, dxl, allsat = jax.vmap(
        lambda v_, xs_, xl_: compute_derivatives(
            v_,
            xs_,
            xl_,
            lit_var=jnp.asarray(fa.lit_var),
            sign=jnp.asarray(fa.sign.astype(np.float32)),
            lit_mask=jnp.asarray(fa.lit_mask.astype(np.float32)),
            clause_mask=jnp.asarray(fa.clause_mask.astype(np.float32)),
            var_occ=jnp.asarray(fa.var_occ),
            occ_mask=jnp.asarray(fa.occ_mask.astype(np.float32)),
            zeta=zeta,
            rigidity=rigidity,
            dv_strategy="gather",
        )
    )(jnp.asarray(v), jnp.asarray(xs), jnp.asarray(xl))

    np.testing.assert_allclose(np.asarray(dv_p), np.asarray(dv), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dxs_p), np.asarray(dxs), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dxl_p), np.asarray(dxl), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(allsat_p), np.asarray(allsat))


def test_pallas_rejects_unit_clauses():
    rng = np.random.default_rng(3)
    formula = random_formula(rng, 10, 20, max_width=3, min_width=1)
    while formula.max_clause_width < 1 or min(len(c) for c in formula.clauses) > 1:
        formula = random_formula(rng, 10, 20, max_width=3, min_width=1)
    _, normalized = normalize_cnf_variables(formula)
    fa = compile_formula(normalized)
    with pytest.raises(ValueError, match="unit-clause"):
        make_pallas_rhs(fa, zeta=0.01)


def test_pallas_step_fn_integration():
    """ODEConfig(dv_strategy='pallas') wires through make_step_fn."""
    from odesat_tpu.models.ode import formula_device, init_state, make_step_fn
    from odesat_tpu.utils.config import ODEConfig

    fa, v, xs, xl = _setup(5)
    ode = ODEConfig(step_size=0.01, dv_strategy="pallas")
    step = make_step_fn(fa, 0.01, ode)
    dev = formula_device(fa)
    state = init_state(fa, 8, jax.random.PRNGKey(0), ode)
    out = step(state, dev)
    assert np.isfinite(np.asarray(out.v)).all()

    ode_ref = ODEConfig(step_size=0.01, dv_strategy="gather")
    step_ref = make_step_fn(fa, 0.01, ode_ref)
    ref = step_ref(state, dev)
    np.testing.assert_allclose(np.asarray(out.v), np.asarray(ref.v), rtol=1e-5, atol=1e-6)
