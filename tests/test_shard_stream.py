"""Clause-sharded streaming kernel (ops/shard_stream.py): layout
invariants, kernel-vs-scan RHS parity, and end-to-end mesh parity on the
8-virtual-device CPU mesh (SURVEY.md §4 fake-backend strategy)."""

import jax
import numpy as np
import pytest

from odesat_tpu.cnf import compile_formula, normalize_cnf_variables
from odesat_tpu.models.ode import (
    ODEState,
    formula_device,
    init_state,
    make_chunk_runner,
)
from odesat_tpu.ops import rhs as rhs_ops
from odesat_tpu.ops.shard_stream import (
    SPAN,
    compile_stream_sharded,
    make_stream_shard_rhs,
    stream_shard_supported,
)
from odesat_tpu.utils.config import ODEConfig, SolverConfig
from odesat_tpu.utils.generate import random_ksat, random_local_ksat


def _mixed_width_formula(n_vars=160, seed=7):
    """Mixed widths (2, 3, 4) -> multiple buckets after compile."""
    rng = np.random.default_rng(seed)
    from odesat_tpu.cnf.formula import CNFFormula, Literal

    clauses = []
    for width, count in ((2, 150), (3, 500), (4, 120)):
        for _ in range(count):
            vs = rng.choice(n_vars, size=width, replace=False)
            clauses.append(
                tuple(Literal(int(v) + 1, bool(rng.integers(0, 2))) for v in vs)
            )
    formula = CNFFormula(clauses, n_vars)
    _, normalized = normalize_cnf_variables(formula)
    return normalized


def test_compile_stream_sharded_layout():
    normalized = _mixed_width_formula()
    fa, plan = compile_stream_sharded(normalized, 2)
    assert fa.shard_plan is plan
    assert plan.n_shards == 2
    assert fa.n_clauses_padded == 2 * plan.mp_local
    assert plan.lo.shape == (2, plan.mp_local // SPAN)
    # every shard has the same local bucket structure: the global slices
    # repeat shifted by Mp_local
    slices = fa.bucket_slices
    per_shard = len(slices) // 2
    for (m0a, m1a, ka), (m0b, m1b, kb) in zip(slices[:per_shard], slices[per_shard:]):
        assert (m0b - m0a, m1b - m1a, kb) == (plan.mp_local, plan.mp_local, ka)
    # all real clauses present exactly once
    assert int(fa.clause_mask.sum()) == normalized.num_clauses
    assert stream_shard_supported(fa, plan)


@pytest.mark.parametrize(
    "n_shards,rigidity", [(1, "paper"), (2, "paper"), (4, "paper"), (2, "reference")]
)
def test_shard_rhs_matches_scan(n_shards, rigidity):
    """Sum of per-shard kernel dv == global scan RHS (up to float
    summation order); dxs/dxl/allsat per shard segment match exactly."""
    normalized = _mixed_width_formula(seed=11)
    fa, plan = compile_stream_sharded(normalized, n_shards)
    ode = ODEConfig(step_size=0.01, rigidity=rigidity)
    rhs = make_stream_shard_rhs(plan, 0.001, ode, interpret=True)

    B = 4
    state = init_state(fa, B, jax.random.PRNGKey(0), ode)
    xs = state.xs + 0.1  # move off the init plateau
    xl = state.xl * 1.5
    dev = formula_device(fa)

    dv_ref, dxs_ref, dxl_ref, allsat_ref = rhs_ops.compute_derivatives(
        state.v,
        xs,
        xl,
        lit_var=dev.lit_var,
        sign=dev.sign,
        lit_mask=dev.lit_mask,
        clause_mask=dev.clause_mask,
        var_occ=dev.var_occ,
        occ_mask=dev.occ_mask,
        zeta=0.001,
        rigidity=rigidity,
        dv_strategy="segment_sum",
        bucket_slices=fa.bucket_slices,
    )

    Mp_local = plan.mp_local
    dv_sum = np.zeros((B, fa.n_vars_padded), dtype=np.float64)
    unsat_any = np.zeros((B,), dtype=bool)
    for s in range(n_shards):
        seg = slice(s * Mp_local, (s + 1) * Mp_local)
        dv_s, dxs_s, dxl_s, sat_s = rhs(
            state.v,
            xs[:, seg],
            xl[:, seg],
            dev.planes[s],
            dev.span_lo[s],
            dev.span_bias[s],
            dev.clause_mask[seg],
        )
        dv_sum += np.asarray(dv_s, dtype=np.float64)
        unsat_any |= ~np.asarray(sat_s)
        np.testing.assert_allclose(
            np.asarray(dxs_s), np.asarray(dxs_ref[:, seg]), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(dxl_s), np.asarray(dxl_ref[:, seg]), rtol=1e-5, atol=1e-6
        )
    np.testing.assert_allclose(dv_sum, np.asarray(dv_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(~unsat_any, np.asarray(allsat_ref))


@pytest.mark.parametrize("step_kind", ["fixed", "adaptive"])
def test_clause_sharded_stream_matches_single(step_kind):
    """End-to-end: the clause-sharded streaming path on a (4, 2) mesh
    must track the single-device scan path on the same FormulaArrays
    (identical layout => comparable trajectories)."""
    from odesat_tpu.parallel.mesh import make_mesh
    from odesat_tpu.parallel.sharded import make_sharded_chunk_runner, shard_inputs

    normalized = _mixed_width_formula(seed=23)
    config = SolverConfig()
    mesh = make_mesh(4, 2)
    ode = (
        ODEConfig(step_size=0.01, dv_strategy="stream")
        if step_kind == "fixed"
        else ODEConfig(tolerance=1e-3, dv_strategy="stream")
    )
    fa, plan = compile_stream_sharded(normalized, 2)
    assert stream_shard_supported(fa, plan)

    B, steps = 8, 6
    state0 = init_state(fa, B, jax.random.PRNGKey(3), ode)
    dev = formula_device(fa)

    # single-device reference: the scan path on the same arrays
    ode_scan = ODEConfig(
        step_size=ode.step_size, tolerance=ode.tolerance, dv_strategy="segment_sum"
    )
    scan_runner = make_chunk_runner(fa, 0.001, ode_scan, steps)
    ref = scan_runner(
        ODEState(*[jnp_copy(x) for x in state0]), dev
    )

    runner = make_sharded_chunk_runner(fa, 0.001, ode, steps, mesh)
    sh_state, sh_dev = shard_inputs(ODEState(*[jnp_copy(x) for x in state0]), dev, mesh)
    out = runner(sh_state, sh_dev)

    np.testing.assert_allclose(np.asarray(out.v), np.asarray(ref.v), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.xs), np.asarray(ref.xs), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.xl), np.asarray(ref.xl), rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(out.done), np.asarray(ref.done))
    if step_kind == "adaptive":
        np.testing.assert_allclose(
            np.asarray(out.dt), np.asarray(ref.dt), rtol=2e-4, atol=2e-6
        )


def jnp_copy(x):
    import jax.numpy as jnp

    return jnp.array(np.asarray(x))


def test_clause_sharded_large_locality_instance():
    """n=4k-class locally-structured instance through the mesh path
    (VERDICT round 1 done-criterion); windows stay far below Np."""
    from odesat_tpu.parallel.mesh import make_mesh
    from odesat_tpu.parallel.sharded import compile_for_mesh, make_sharded_chunk_runner, shard_inputs

    formula = random_local_ksat(4096, 17000, k=3, locality=256, seed=5)
    _, normalized = normalize_cnf_variables(formula)
    mesh = make_mesh(2, 4)
    config = SolverConfig(ode=ODEConfig(step_size=0.01))
    fa = compile_for_mesh(normalized, config, mesh)
    plan = fa.shard_plan
    assert plan is not None and plan.n_shards == 4
    # window_sort keeps per-span windows narrow on locality-256 layouts
    assert max(w for _, _, w, _ in plan.span_meta) <= 1024

    runner = make_sharded_chunk_runner(fa, 0.001, config.ode, 2, mesh)
    state = init_state(fa, 8, jax.random.PRNGKey(0), config.ode)
    dev = formula_device(fa)
    state, dev = shard_inputs(state, dev, mesh)
    out = runner(state, dev)
    assert np.isfinite(np.asarray(out.v)).all()
    assert np.asarray(out.xs).shape == (8, fa.n_clauses_padded)


def test_explicit_stream_on_clause_mesh_requires_plan():
    """dv_strategy='stream' + clause mesh without a shard plan (plain
    compile) must raise, not silently fall back."""
    from odesat_tpu.parallel.mesh import make_mesh
    from odesat_tpu.parallel.sharded import make_sharded_chunk_runner

    formula = random_ksat(64, 256, k=3, seed=0)
    _, normalized = normalize_cnf_variables(formula)
    fa = compile_formula(normalized)  # no shard plan
    mesh = make_mesh(4, 2)
    with pytest.raises(ValueError, match="clause mesh"):
        make_sharded_chunk_runner(
            fa, 0.001, ODEConfig(step_size=0.01, dv_strategy="stream"), 4, mesh
        )


def test_compile_convention_matches_compile_formula():
    """compile_stream_sharded re-implements compile_formula's array
    construction (its occurrence-slot convention MUST match for the scan
    fallback); pin the convention: at n_shards=1 with matching options
    the two compiles produce identical arrays."""
    formula = random_ksat(60, 260, k=3, seed=4)  # uniform width: 1 bucket
    _, normalized = normalize_cnf_variables(formula)
    fa_ref = compile_formula(normalized, bucket=False, window_sort=True)
    fa_sh, _ = compile_stream_sharded(normalized, 1, bucket=False, window_sort=True)
    np.testing.assert_array_equal(fa_sh.lit_var, fa_ref.lit_var)
    np.testing.assert_array_equal(fa_sh.sign, fa_ref.sign)
    np.testing.assert_array_equal(fa_sh.lit_mask, fa_ref.lit_mask)
    np.testing.assert_array_equal(fa_sh.clause_mask, fa_ref.clause_mask)
    np.testing.assert_array_equal(fa_sh.xs_init, fa_ref.xs_init)
    np.testing.assert_array_equal(fa_sh.var_occ, fa_ref.var_occ)
    np.testing.assert_array_equal(fa_sh.occ_mask, fa_ref.occ_mask)
    assert fa_sh.bucket_slices == fa_ref.bucket_slices
    assert fa_sh.n_slots == fa_ref.n_slots


@pytest.mark.parametrize(
    "ode_kwargs",
    [dict(tolerance=1e-3, dt_mode="shared"), dict(step_size=0.01, dtype="float64")],
)
def test_clause_mesh_auto_falls_back_to_scan(ode_kwargs):
    """Kernel-ineligible configs (shared adaptive dt, f64) on a clause
    mesh with dv_strategy='auto' must run the scan fallback, not crash
    on the bucket guard (round-2 review finding)."""
    from odesat_tpu.parallel.mesh import make_mesh
    from odesat_tpu.parallel.sharded import (
        compile_for_mesh,
        make_sharded_chunk_runner,
        shard_inputs,
    )

    formula = random_ksat(24, 96, k=3, seed=2)
    _, normalized = normalize_cnf_variables(formula)
    mesh = make_mesh(2, 4)
    ode = ODEConfig(**ode_kwargs)
    config = SolverConfig(ode=ode, clause_pad=8)
    fa = compile_for_mesh(normalized, config, mesh)
    assert fa.shard_plan is None  # plain layout for the scan path
    runner = make_sharded_chunk_runner(fa, 0.001, ode, 2, mesh)
    state = init_state(fa, 8, jax.random.PRNGKey(0), ode)
    dev = formula_device(fa)
    state, dev = shard_inputs(state, dev, mesh)
    out = runner(state, dev)
    assert np.isfinite(np.asarray(out.v, dtype=np.float64)).all()


def test_stoch_mesh_snapshot_rejected_without_mesh(tmp_path):
    """Resuming a mesh snapshot without a mesh errors clearly instead of
    failing deep inside jit (round-2 review finding)."""
    import dataclasses

    from odesat_tpu.models.stoch import search
    from odesat_tpu.parallel.mesh import make_mesh

    formula = random_ksat(24, 96, k=3, seed=2)
    _, normalized = normalize_cnf_variables(formula)
    path = str(tmp_path / "mesh_snap.npz")
    config = SolverConfig(
        ode=__import__("odesat_tpu.utils.config", fromlist=["ODEConfig"]).ODEConfig(steps=32),
        batch_size=8,
        seed=0,
        chunk_steps=8,
        checkpoint_path=path,
        checkpoint_every_chunks=1,
    )
    search(normalized, config, mesh=make_mesh(8, 1))
    resume = dataclasses.replace(
        config, resume_from=path, checkpoint_path=None, checkpoint_every_chunks=0
    )
    # the recorded (traj, clause) layout check fires first with a clear
    # message; pre-layout snapshots would hit the key-shape check instead
    with pytest.raises(ValueError, match="resume with the same"):
        search(normalized, resume)


def test_fused_clause_step_rejects_shared_dt_adaptive():
    """The fused clause step only implements per-trajectory dt; a
    shared-dt adaptive config must be rejected (it runs on the scan
    path), never silently integrated with the wrong dt dynamics."""
    from odesat_tpu.ops.shard_stream import make_fused_clause_step, make_single_device_runner

    formula = random_ksat(48, 200, k=3, seed=4)
    _, normalized = normalize_cnf_variables(formula)
    fa, _ = compile_stream_sharded(normalized, 1)
    shared = ODEConfig(tolerance=1e-3, dt_mode="shared")
    with pytest.raises(ValueError, match="per-trajectory dt"):
        make_fused_clause_step(fa, 0.001, shared)
    with pytest.raises(ValueError, match="per-trajectory dt"):
        make_single_device_runner(fa, 0.001, shared, 8)
    # fixed-step integrators never adapt dt, so dt_mode is inert there
    make_fused_clause_step(fa, 0.001, ODEConfig(step_size=0.01, dt_mode="shared"))
