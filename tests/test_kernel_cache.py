"""Shape-cached kernel reuse: two *different* formulas with identical
shape signatures must share one jitted kernel yet produce their own
correct dynamics (the incidence rides as arguments — a regression here
means something got baked as a compile-time constant again)."""

import jax
import numpy as np

from odesat_tpu.cnf import compile_formula, normalize_cnf_variables
from odesat_tpu.models.ode import formula_device, init_state, make_step_fn
from odesat_tpu.models.stoch import init_stoch_state
from odesat_tpu.ops.fused_pallas import _JIT_CACHE as FUSED_CACHE
from odesat_tpu.ops.fused_pallas import make_fused_chunk
from odesat_tpu.ops.stoch_pallas import make_fused_stoch_chunk, make_stream_stoch_chunk
from odesat_tpu.ops.stream_pallas import make_stream_chunk
from odesat_tpu.utils.config import ODEConfig
from odesat_tpu.utils.generate import random_ksat


def _two_same_shape_formulas(seed_a=21, seed_b=22, n=24, m=64):
    fas = []
    for seed in (seed_a, seed_b):
        _, norm = normalize_cnf_variables(random_ksat(n, m, k=3, seed=seed))
        fas.append(compile_formula(norm))
    a, b = fas
    assert a.lit_var.shape == b.lit_var.shape
    assert (a.lit_var != b.lit_var).any()  # genuinely different formulas
    return a, b


def _scan_ref(fa, ode, state, steps, zeta=0.05):
    step = make_step_fn(fa, zeta, ode)
    dev = formula_device(fa)
    for _ in range(steps):
        state = step(state, dev)
    return state


def test_fused_cache_not_stale_across_formulas():
    fa_a, fa_b = _two_same_shape_formulas()
    ode = ODEConfig(step_size=0.02, dv_strategy="gather")
    n_before = len(FUSED_CACHE)
    fn_a = make_fused_chunk(fa_a, 0.05, ode, 8, interpret=True)
    fn_b = make_fused_chunk(fa_b, 0.05, ode, 8, interpret=True)
    assert len(FUSED_CACHE) == n_before + 1  # one shared jitted kernel

    state = init_state(fa_a, 8, jax.random.PRNGKey(0), ode)
    out_a = fn_a(state)
    out_b = fn_b(state)
    ref_a = _scan_ref(fa_a, ode, state, 8)
    ref_b = _scan_ref(fa_b, ode, state, 8)
    np.testing.assert_allclose(np.asarray(out_a.v), np.asarray(ref_a.v), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_b.v), np.asarray(ref_b.v), rtol=2e-4, atol=2e-5)
    assert np.abs(np.asarray(out_a.v) - np.asarray(out_b.v)).max() > 1e-3


def test_stream_cache_not_stale_across_formulas():
    fa_a, fa_b = _two_same_shape_formulas(seed_a=31, seed_b=32)
    ode = ODEConfig(step_size=0.02, dv_strategy="gather")
    fn_a = make_stream_chunk(fa_a, 0.05, ode, 8, interpret=True)
    fn_b = make_stream_chunk(fa_b, 0.05, ode, 8, interpret=True)
    state = init_state(fa_a, 8, jax.random.PRNGKey(1), ode)
    out_a = fn_a(state)
    out_b = fn_b(state)
    ref_b = _scan_ref(fa_b, ode, state, 8)
    np.testing.assert_allclose(np.asarray(out_b.v), np.asarray(ref_b.v), rtol=2e-4, atol=2e-5)
    assert np.abs(np.asarray(out_a.v) - np.asarray(out_b.v)).max() > 1e-3


def test_stoch_cache_not_stale_across_formulas():
    fa_a, fa_b = _two_same_shape_formulas(seed_a=41, seed_b=42)
    state = init_stoch_state(fa_a, 8, jax.random.PRNGKey(2))
    for make in (make_fused_stoch_chunk, make_stream_stoch_chunk):
        fn_a = make(fa_a, 30, interpret=True)
        fn_b = make(fa_b, 30, interpret=True)
        out_a = make(fa_a, 30, interpret=True)(state)
        out_b = fn_b(state)
        # same PRNG stream, different formulas -> different assignments
        assert (np.asarray(out_a.v) != np.asarray(out_b.v)).any()
        # and the cached callable for the same formula is deterministic
        again = fn_a(state)
        np.testing.assert_array_equal(np.asarray(out_a.v), np.asarray(again.v))
