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


def test_native_parser_matches_python_fuzz():
    """Random DIMACS text (comments, blanks, odd spacing, SATLIB '%')
    must parse identically through the C++ scanner and the Python
    parser (reference quirks included: literals after the 0 sentinel
    are ignored, blank lines are skipped)."""
    import random

    from odesat_tpu import native
    from odesat_tpu.cnf.dimacs import parse_dimacs

    if not native.is_available():
        import pytest

        pytest.skip("native library unavailable")

    rng = random.Random(0)
    for trial in range(20):
        n_vars = rng.randint(1, 30)
        lines = [f"c fuzz trial {trial}", f"p cnf {n_vars} 999"]
        for _ in range(rng.randint(1, 40)):
            roll = rng.random()
            if roll < 0.1:
                lines.append("")  # blank
            elif roll < 0.2:
                lines.append("c a comment  with   spaces")
            else:
                w = rng.randint(1, 4)
                lits = [
                    ("-" if rng.random() < 0.5 else "") + str(rng.randint(1, n_vars))
                    for _ in range(w)
                ]
                sep = " " * rng.randint(1, 3)
                lines.append(sep.join(lits) + sep + "0")
        if rng.random() < 0.3:
            lines.append("%")
            lines.append("ignored after percent 0")
        text = "\n".join(lines) + ("\n" if rng.random() < 0.5 else "")

        py = parse_dimacs(text)
        nat = native.parse_dimacs_native(text)
        assert nat.varnum == py.varnum, text
        assert [list(c) for c in nat.clauses] == [list(c) for c in py.clauses], text
