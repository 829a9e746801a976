"""Normalization and value-mapping tests (fixes C3's nondeterminism)."""

from odesat_tpu.cnf import (
    CNFFormula,
    Literal,
    evaluate_cnf,
    map_values_by_indices,
    normalize_cnf_variables,
    render_variable_map,
)


def test_normalize_deterministic_sorted():
    f = CNFFormula([(Literal(42, False), Literal(7, True)), (Literal(9, False),)], 50)
    mapping, normalized = normalize_cnf_variables(f)
    assert mapping == {7: 0, 9: 1, 42: 2}
    assert normalized.clauses[0] == (Literal(2, False), Literal(0, True))
    # varnum is preserved, not shrunk (reference: src/cnf.rs:198)
    assert normalized.varnum == 50


def test_map_values_by_indices_skips_out_of_range():
    mapping = {10: 0, 20: 5}
    values = [True, False]
    out = map_values_by_indices(mapping, values)
    assert out == {10: True}  # index 5 out of range -> skipped


def test_evaluate_cnf_inserts_missing_false():
    f = CNFFormula([(Literal(1, True),), (Literal(2, False),)], 2)
    assignment = {2: True}
    assert evaluate_cnf(assignment, f) is True
    assert assignment[1] is False  # or_insert(false) semantics


def test_render_sorted():
    out = render_variable_map({3: True, 1: False})
    assert out == "1 0\n3 1\n"
