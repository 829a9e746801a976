"""CLI integration tests: the four subcommands on the bundled fixtures
(reference CLI surface: src/main.rs:19-141)."""

import os

import pytest

from odesat_tpu.cli import main


def test_cli_solve_small(data_dir, capsys, tmp_path):
    out_file = str(tmp_path / "out.txt")
    rc = main(
        [
            "solve",
            "-f",
            os.path.join(data_dir, "small.cnf"),
            "-o",
            out_file,
            "-s",
            "0.01",
            "-n",
            "2000",
            "--seed",
            "0",
            "--chunk-steps",
            "128",
        ]
    )
    captured = capsys.readouterr().out
    assert rc == 0
    assert "Checking if solution vector satisfies formula: true" in captured
    assert os.path.exists(out_file)
    lines = open(out_file).read().strip().splitlines()
    assert all(len(line.split()) == 2 for line in lines)


def test_cli_inter_small(data_dir, capsys):
    rc = main(
        [
            "inter",
            "-f",
            os.path.join(data_dir, "small.cnf"),
            "-b",
            "8",
            "-n",
            "1000",
            "-s",
            "0.01",
            "--seed",
            "1",
            "--chunk-steps",
            "128",
        ]
    )
    captured = capsys.readouterr().out
    assert rc == 0
    assert "Checking if solution vector satisfies formula: true" in captured


def test_cli_batch_small(data_dir, capsys):
    rc = main(
        [
            "batch",
            "-f",
            os.path.join(data_dir, "small.cnf"),
            "-b",
            "8",
            "-n",
            "1000",
            "-s",
            "0.01",
            "--seed",
            "2",
            "--chunk-steps",
            "128",
        ]
    )
    captured = capsys.readouterr().out
    assert rc == 0
    assert "Checking if solution vector satisfies formula: true" in captured


def test_cli_stoch_small(data_dir, capsys):
    rc = main(
        [
            "stoch",
            "-f",
            os.path.join(data_dir, "small.cnf"),
            "-n",
            "2000",
            "-b",
            "8",
            "--seed",
            "3",
            "--chunk-steps",
            "128",
        ]
    )
    captured = capsys.readouterr().out
    assert rc == 0
    assert "Checking if solution vector satisfies formula: true" in captured


def test_cli_hard_false_verdict(data_dir, capsys):
    rc = main(
        [
            "inter",
            "-f",
            os.path.join(data_dir, "hard.cnf"),
            "-b",
            "2",
            "-n",
            "200",
            "-s",
            "0.01",
            "--seed",
            "4",
            "--chunk-steps",
            "128",
        ]
    )
    captured = capsys.readouterr().out
    assert rc == 0  # exits 0 regardless, like the reference
    assert "Checking if solution vector satisfies formula: false" in captured


def test_cli_var_order_and_matmul_dtype(data_dir, capsys):
    """--var-order bandwidth relabels variables (RCM) and --matmul-dtype
    parses; the verified verdict must be unaffected (readout composes
    the permutation back)."""
    rc = main(
        [
            "solve",
            "-f",
            os.path.join(data_dir, "small.cnf"),
            "-s",
            "0.01",
            "-n",
            "2000",
            "--seed",
            "0",
            "--var-order",
            "bandwidth",
            "--matmul-dtype",
            "bfloat16",
        ]
    )
    captured = capsys.readouterr().out
    assert rc == 0
    assert "Checking if solution vector satisfies formula: true" in captured


def test_cli_gen_roundtrip(tmp_path, capsys):
    """gen writes a solvable DIMACS instance that solve verifies."""
    out = str(tmp_path / "gen.cnf")
    rc = main(["gen", "-o", out, "-n", "30", "--planted", "--seed", "7"])
    assert rc == 0 and os.path.exists(out)
    capsys.readouterr()
    rc = main(["solve", "-f", out, "-s", "0.01", "-n", "4000", "--seed", "0"])
    captured = capsys.readouterr().out
    assert rc == 0
    assert "Checking if solution vector satisfies formula: true" in captured


def test_cli_hybrid_small(data_dir, capsys):
    rc = main(
        [
            "hybrid",
            "-f",
            os.path.join(data_dir, "small.cnf"),
            "-s",
            "0.01",
            "-n",
            "2000",
            "-b",
            "32",
            "--seed",
            "0",
            "--chunk-steps",
            "128",
        ]
    )
    captured = capsys.readouterr().out
    assert rc == 0
    assert "Winner:" in captured
    assert "Checking if solution vector satisfies formula: true" in captured
