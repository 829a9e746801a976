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
