"""Width-bucketed clause layout: the bucketed RHS must match the
non-bucketed RHS exactly (same formula, permuted clause axis)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odesat_tpu.cnf import compile_formula, normalize_cnf_variables
from odesat_tpu.ops.rhs import compute_derivatives
from tests.conftest import random_formula


def _rhs(fa, v, xs, xl, strategy):
    return compute_derivatives(
        jnp.asarray(v),
        jnp.asarray(xs),
        jnp.asarray(xl),
        lit_var=jnp.asarray(fa.lit_var),
        sign=jnp.asarray(fa.sign),
        lit_mask=jnp.asarray(fa.lit_mask),
        clause_mask=jnp.asarray(fa.clause_mask),
        var_occ=jnp.asarray(fa.var_occ),
        occ_mask=jnp.asarray(fa.occ_mask),
        zeta=0.05,
        dv_strategy=strategy,
        bucket_slices=fa.bucket_slices if len(fa.bucket_slices) > 1 else None,
    )


@pytest.mark.parametrize("strategy", ["gather", "segment_sum"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bucketed_rhs_matches_flat(seed, strategy):
    rng = np.random.default_rng(seed)
    formula = random_formula(rng, n_vars=20, n_clauses=60, max_width=6, min_width=2)
    _, normalized = normalize_cnf_variables(formula)

    flat = compile_formula(normalized, dtype=np.float64, clause_pad=8, var_pad=8)
    bucketed = compile_formula(
        normalized, dtype=np.float64, clause_pad=8, var_pad=8, bucket=True, min_bucket=8
    )
    assert len(bucketed.bucket_slices) > 1
    # per-bucket widths must be tight, not the global max
    assert any(kb < flat.max_width for _, _, kb in bucketed.bucket_slices)

    v = rng.uniform(-1, 1, size=flat.n_vars_padded)
    # map clause-indexed state between the two layouts via the sorted order
    xs_f = rng.uniform(0.001, 0.999, size=flat.n_clauses_padded)
    xl_f = rng.uniform(1.0, 50.0, size=flat.n_clauses_padded)

    dv_f, dxs_f, dxl_f, allsat_f = _rhs(flat, v, xs_f, xl_f, strategy)

    # build the bucketed layout's state by locating each original clause
    perm = _clause_permutation(normalized, flat, bucketed)
    xs_b = np.full(bucketed.n_clauses_padded, 0.5)
    xl_b = np.full(bucketed.n_clauses_padded, 1.0)
    xs_b[perm] = xs_f[: flat.n_clauses]
    xl_b[perm] = xl_f[: flat.n_clauses]

    dv_b, dxs_b, dxl_b, allsat_b = _rhs(bucketed, v, xs_b, xl_b, strategy)

    np.testing.assert_allclose(
        np.asarray(dv_b)[: flat.n_vars], np.asarray(dv_f)[: flat.n_vars], rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(dxs_b)[perm], np.asarray(dxs_f)[: flat.n_clauses], rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(dxl_b)[perm], np.asarray(dxl_f)[: flat.n_clauses], rtol=1e-12
    )
    assert bool(allsat_b) == bool(allsat_f)


def _clause_permutation(normalized, flat, bucketed):
    """perm[i] = bucketed clause row of original clause i."""
    from collections import defaultdict

    rows = defaultdict(list)
    mask = bucketed.lit_mask > 0
    for m in range(bucketed.n_clauses_padded):
        if bucketed.clause_mask[m] > 0:
            key = tuple(
                sorted(
                    (int(bucketed.lit_var[k, m]), float(bucketed.sign[k, m]))
                    for k in range(bucketed.max_width)
                    if mask[k, m]
                )
            )
            rows[key].append(m)
    perm = []
    for clause in normalized.clauses:
        key = tuple(sorted((lit.variable, -1.0 if lit.is_negated else 1.0) for lit in clause))
        perm.append(rows[key].pop(0))
    return np.asarray(perm)


def test_bucketed_end_to_end_solve(data_dir):
    """Full solve with bucket='on' still verifies (easy.cnf preprocessed
    has mixed widths)."""
    import os

    from odesat_tpu.cnf import evaluate_cnf, map_values_by_indices, parse_dimacs_file
    from odesat_tpu.models.ode import simulate_batch
    from odesat_tpu.preprocess import preprocess_formula, reconstruct_witness
    from odesat_tpu.utils.config import ODEConfig, SolverConfig

    formula = parse_dimacs_file(os.path.join(data_dir, "easy.cnf"))
    reduced, trace = preprocess_formula(formula, 7.0)
    var_mapping, normalized = normalize_cnf_variables(reduced)
    config = SolverConfig(
        ode=ODEConfig(steps=4000, dv_strategy="gather"),
        batch_size=8,
        seed=1,
        chunk_steps=256,
        bucket="on",
    )
    result = simulate_batch(normalized, config)
    mapped = map_values_by_indices(var_mapping, result.best_assignment())
    reconstruct_witness(mapped, trace)
    assert evaluate_cnf(mapped, formula)
