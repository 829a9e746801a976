"""Parser/renderer round-trip tests (SURVEY.md §4 unit tier)."""

import os

from odesat_tpu.cnf import CNFFormula, Literal, cnf_to_dimacs, parse_dimacs, parse_dimacs_file


def test_parse_small(data_dir):
    f = parse_dimacs_file(os.path.join(data_dir, "small.cnf"))
    assert f.varnum == 5
    assert f.num_clauses == 3
    assert f.clauses[0] == (Literal(1, False), Literal(5, True), Literal(4, False))
    assert f.clauses[2] == (Literal(3, True), Literal(4, True))
    assert f.max_clause_width == 4  # clause "-1 5 3 4 0" (small.cnf:7)


def test_parse_easy_hard(data_dir):
    easy = parse_dimacs_file(os.path.join(data_dir, "easy.cnf"))
    hard = parse_dimacs_file(os.path.join(data_dir, "hard.cnf"))
    for f in (easy, hard):
        assert f.varnum == 100
        assert f.num_clauses == 160
        assert all(len(c) == 3 for c in f.clauses)
    # easy.cnf is hard.cnf with one literal flipped (easy.cnf:14)
    diffs = [i for i, (a, b) in enumerate(zip(easy.clauses, hard.clauses)) if a != b]
    assert len(diffs) == 1


def test_blank_lines_skipped():
    text = "c comment\np cnf 3 2\n\n1 2 0\n\n  \n-1 3 0\n"
    f = parse_dimacs(text)
    assert f.num_clauses == 2  # blank lines don't become empty clauses


def test_satlib_percent_marker():
    text = "p cnf 2 1\n1 -2 0\n%\n0\n"
    f = parse_dimacs(text)
    assert f.num_clauses == 1


def test_roundtrip():
    text = "p cnf 4 3\n1 -2 0\n-3 4 1 0\n2 0\n"
    f = parse_dimacs(text)
    f2 = parse_dimacs(cnf_to_dimacs(f))
    assert f2.clauses == f.clauses
    assert f2.varnum == f.varnum


def test_varnum_fallback_counts_used_variables():
    # no header => varnum = count of distinct used variables
    # (reference: src/cnf.rs:60-77)
    f = parse_dimacs("1 -7 0\n7 3 0\n")
    assert isinstance(f, CNFFormula)
    assert f.varnum == 3


def test_literals_after_sentinel_ignored():
    f = parse_dimacs("p cnf 3 1\n1 2 0 3\n")
    assert f.clauses[0] == (Literal(1, False), Literal(2, False))
