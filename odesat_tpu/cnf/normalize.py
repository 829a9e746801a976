"""Variable normalization: dense renaming so variables index state vectors.

Parity with the reference (reference: src/cnf.rs:174-219, 301-315) with one
deliberate fix: the reference enumerates a ``HashSet`` to build the name
map (src/cnf.rs:211), making the mapping nondeterministic run-to-run;
here variables are **sorted** first (SURVEY.md C3 calls for this), so
normalization is deterministic and runs are replayable.

Semantics kept faithfully:

* literals whose variable is absent from the mapping are dropped
  (src/cnf.rs:189-191);
* the normalized formula keeps the **original** ``varnum``
  (src/cnf.rs:198), so the state vector may be longer than the number of
  used variables — the unused slots are inert.
"""

from __future__ import annotations

from odesat_tpu.cnf.formula import CNFFormula, Literal


def apply_variable_mapping(var_mapping: dict, formula: CNFFormula) -> CNFFormula:
    """Rename variables per ``var_mapping``; unmapped literals are dropped
    (reference: src/cnf.rs:174-199)."""
    mapped_clauses = []
    for clause in formula.clauses:
        mapped = tuple(
            Literal(var_mapping[lit.variable], lit.is_negated)
            for lit in clause
            if lit.variable in var_mapping
        )
        mapped_clauses.append(mapped)
    return CNFFormula(mapped_clauses, formula.varnum)


def normalize_cnf_variables(formula: CNFFormula):
    """Return ``(name_map, normalized_formula)`` where ``name_map`` maps
    original variable names to dense indices ``0..k-1`` in sorted order
    (reference: src/cnf.rs:206-219, determinism fixed)."""
    variables = sorted(formula.variable_set())
    name_map = {old: new for new, old in enumerate(variables)}
    return name_map, apply_variable_mapping(name_map, formula)


def map_values_by_indices(indices_map: dict, values) -> dict:
    """Compose a name map with an indexed solution vector back to original
    names (reference: src/cnf.rs:301-315). Indices out of range are
    skipped, matching the reference's ``values.get(index)``."""
    out = {}
    n = len(values)
    for key, index in indices_map.items():
        if 0 <= index < n:
            out[key] = bool(values[index])
    return out
