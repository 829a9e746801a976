"""Pure-Python preprocessor invariants (native=False; the C++ path is
covered by tests/test_native.py parity) (SURVEY.md §4): any satisfying assignment of the
reduced formula must extend — via the trace — to a satisfying assignment
of the original; plus unit tests of the resolution machinery."""

import numpy as np
import pytest

from odesat_tpu.cnf import evaluate_cnf, parse_dimacs_file
from odesat_tpu.cnf.formula import CNFFormula, Literal
from odesat_tpu.preprocess import (
    build_occurrence_index,
    calculate_resolvents,
    is_blocked,
    is_tautology,
    preprocess_formula,
    reconstruct_witness,
    subsume_clauses,
    to_formula_set,
)
from tests.conftest import brute_force_sat, random_formula


def _lits(*pairs):
    return frozenset(Literal(v, n) for v, n in pairs)


def test_tautology():
    assert is_tautology(_lits((1, False), (1, True), (2, False)))
    assert not is_tautology(_lits((1, False), (2, True)))


def test_subsumption_removes_supersets():
    clauses = {_lits((1, False)), _lits((1, False), (2, True)), _lits((3, False))}
    subsume_clauses(clauses)
    assert clauses == {_lits((1, False)), _lits((3, False))}


def test_resolvents_skip_tautologies_and_empties():
    # (x1 v x2) and (-x1 v -x2): resolvent on x1 = (x2 v -x2) tautology -> dropped
    clauses = {_lits((1, False), (2, False)), _lits((1, True), (2, True))}
    index = build_occurrence_index(clauses)
    res = calculate_resolvents(index, _lits((1, False), (2, False)), 1)
    assert res == []
    # (x1) and (-x1): empty resolvent silently dropped (src/cnf.rs:474-476)
    clauses = {_lits((1, False)), _lits((1, True))}
    index = build_occurrence_index(clauses)
    assert calculate_resolvents(index, _lits((1, False)), 1) == []


def test_blocked_clause_detection():
    # (x1 v x2) with only (-x1 v -x2) opposing: every resolvent on x1 is a
    # tautology -> blocked
    clauses = {_lits((1, False), (2, False)), _lits((1, True), (2, True))}
    index = build_occurrence_index(clauses)
    assert is_blocked(_lits((1, False), (2, False)), index) == 1


def test_preprocess_raises_density(data_dir):
    import os

    formula = parse_dimacs_file(os.path.join(data_dir, "easy.cnf"))
    reduced, trace = preprocess_formula(formula, 7.0, native=False)
    assert reduced.varnum < formula.varnum
    assert len(trace) > 0
    # density raised toward the target (reference prints Clauses|Vars here)
    orig_density = formula.num_clauses / formula.varnum
    new_density = reduced.num_clauses / reduced.varnum
    assert new_density > orig_density


@pytest.mark.parametrize("seed", range(20))
def test_witness_reconstruction_roundtrip(seed):
    """Property: solve the REDUCED formula by brute force, reconstruct via
    the trace, verify the ORIGINAL formula (SURVEY.md §4)."""
    rng = np.random.default_rng(seed)
    formula = random_formula(rng, n_vars=8, n_clauses=14, max_width=3)
    if brute_force_sat(formula) is None:
        pytest.skip("random instance UNSAT")
    reduced, trace = preprocess_formula(formula, target_ratio=4.0, native=False)
    assignment = brute_force_sat(reduced)
    assert assignment is not None, "preprocessing must preserve satisfiability"
    reconstruct_witness(assignment, trace)
    assert evaluate_cnf(assignment, formula), "reconstructed witness must satisfy original"


@pytest.mark.parametrize("seed", range(10))
def test_preprocess_unsat_never_crashes(seed):
    """UNSAT inputs: preprocessing must terminate and reconstruction must
    not raise (the verdict simply stays false, like the reference)."""
    rng = np.random.default_rng(1000 + seed)
    formula = random_formula(rng, n_vars=4, n_clauses=20, max_width=2)
    reduced, trace = preprocess_formula(formula, target_ratio=7.0, native=False)
    if brute_force_sat(formula) is not None:
        pytest.skip("instance happened to be SAT")
    assignment = {v: False for v in reduced.variable_set()}
    reconstruct_witness(assignment, trace)
    assert evaluate_cnf(assignment, formula) is False


def test_preprocess_deterministic():
    rng = np.random.default_rng(5)
    formula = random_formula(rng, n_vars=10, n_clauses=20, max_width=3)
    r1, t1 = preprocess_formula(formula, 7.0, native=False)
    r2, t2 = preprocess_formula(formula, 7.0, native=False)
    assert r1.clauses == r2.clauses
    assert r1.varnum == r2.varnum
    assert len(t1) == len(t2)


def test_set_conversion_dedups():
    f = CNFFormula([(Literal(1), Literal(2)), (Literal(2), Literal(1))], 2)
    fs = to_formula_set(f)
    assert len(fs.clauses) == 1


def test_subsumption_empty_clause_dominates():
    """An empty clause subsumes every other clause (reference all-pairs
    semantics, src/cnf.rs:521-539); the occurrence-indexed scan must
    special-case it since it lands in no occurrence list."""
    clauses = {frozenset(), _lits((1, False)), _lits((2, True), (3, False))}
    subsume_clauses(clauses)
    assert clauses == {frozenset()}


def test_subsumption_no_empty_clause_untouched():
    clauses = {_lits((1, False)), _lits((2, True))}
    subsume_clauses(clauses)
    assert clauses == {_lits((1, False)), _lits((2, True))}
