"""Whole-chunk clause-sharded kernel with in-kernel all-reduce
(ops/shard_chunk.py): butterfly-collective parity against the scan path
on a clause-only CPU mesh (the interpret-mode remote-DMA discharge
supports one named mesh axis — round-2 VERDICT item 10 investigation,
recorded in RESULTS.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from odesat_tpu.cnf import normalize_cnf_variables
from odesat_tpu.models.ode import ODEState, formula_device, init_state, make_chunk_runner
from odesat_tpu.ops.shard_chunk import make_shard_chunk_call, shard_chunk_supported
from odesat_tpu.ops.shard_stream import compile_stream_sharded
from odesat_tpu.utils.config import ODEConfig
from odesat_tpu.utils.generate import random_ksat


def _clause_mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("clause",))


def _run_sharded(fa, ode, chunk, n_shards, state, dev):
    """Drive the whole-chunk kernel under a clause-only shard_map: the
    batch is replicated (v/dt/done) while xs/xl and the plane data shard
    over the clause axis — the trajectory axis is orthogonal pure DP and
    needs no named axis for the collective's validation."""
    call = make_shard_chunk_call(fa, 0.001, ode, chunk, interpret=True)
    mesh = _clause_mesh(n_shards)

    def local(v, xs, xl, dt, done, planes, lo, bias, cmask):
        out = call(v, xs, xl, dt, done, planes[0], lo[0], bias[0], cmask)
        return out

    specs_in = (
        P(), P(None, "clause"), P(None, "clause"), P(), P(),
        P("clause"), P("clause"), P("clause"), P("clause"),
    )
    specs_out = (P(), P(None, "clause"), P(None, "clause"), P(), P())
    sharded = shard_map(
        local, mesh=mesh, in_specs=specs_in, out_specs=specs_out, check_vma=False
    )
    args = (
        state.v, state.xs, state.xl, state.dt, state.done,
        dev.planes, dev.span_lo, dev.span_bias, dev.clause_mask,
    )
    put = lambda x, s: jax.device_put(x, NamedSharding(mesh, s))  # noqa: E731
    args = tuple(put(a, s) for a, s in zip(args, specs_in))
    v, xs, xl, dt, done = jax.jit(sharded)(*args)
    return ODEState(v, xs, xl, dt, done)


@pytest.mark.parametrize(
    "n_shards,step_kind", [(2, "fixed"), (4, "fixed"), (2, "adaptive"), (4, "adaptive")]
)
def test_shard_chunk_matches_scan(n_shards, step_kind):
    formula = random_ksat(96, 420, k=3, seed=5, planted=True)
    _, normalized = normalize_cnf_variables(formula)
    fa, plan = compile_stream_sharded(normalized, n_shards)
    ode = (
        ODEConfig(step_size=0.01)
        if step_kind == "fixed"
        else ODEConfig(tolerance=1e-3)
    )
    assert shard_chunk_supported(fa, plan, ode)

    B, steps = 8, 6
    state0 = init_state(fa, B, jax.random.PRNGKey(4), ode)
    dev = formula_device(fa)

    ode_scan = ODEConfig(
        step_size=ode.step_size, tolerance=ode.tolerance, dv_strategy="segment_sum"
    )
    ref = make_chunk_runner(fa, 0.001, ode_scan, steps)(
        jax.tree.map(lambda x: jnp.array(np.asarray(x)), state0), dev
    )

    out = _run_sharded(fa, ode, steps, n_shards, state0, dev)

    np.testing.assert_allclose(np.asarray(out.v), np.asarray(ref.v), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.xs), np.asarray(ref.xs), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.xl), np.asarray(ref.xl), rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(out.done), np.asarray(ref.done))
    if step_kind == "adaptive":
        np.testing.assert_allclose(
            np.asarray(out.dt), np.asarray(ref.dt), rtol=2e-4, atol=2e-6
        )


def test_shard_chunk_replicated_v_stays_bitwise_identical():
    """The butterfly's symmetric pairwise grouping must keep the
    replicated v BIT-identical across clause shards (a sequential ring
    would sum in per-shard order and let it drift)."""
    formula = random_ksat(96, 420, k=3, seed=9, planted=True)
    _, normalized = normalize_cnf_variables(formula)
    fa, plan = compile_stream_sharded(normalized, 4)
    ode = ODEConfig(step_size=0.01)
    state0 = init_state(fa, 8, jax.random.PRNGKey(1), ode)
    dev = formula_device(fa)

    call = make_shard_chunk_call(fa, 0.001, ode, 8, interpret=True)
    mesh = _clause_mesh(4)

    def local(v, xs, xl, dt, done, planes, lo, bias, cmask):
        out = call(v, xs, xl, dt, done, planes[0], lo[0], bias[0], cmask)
        # return each shard's v copy so the host can compare them
        return (out[0][None],) + out[1:3]

    specs_in = (
        P(), P(None, "clause"), P(None, "clause"), P(), P(),
        P("clause"), P("clause"), P("clause"), P("clause"),
    )
    specs_out = (P("clause"), P(None, "clause"), P(None, "clause"))
    sharded = shard_map(
        local, mesh=mesh, in_specs=specs_in, out_specs=specs_out, check_vma=False
    )
    args = (
        state0.v, state0.xs, state0.xl, state0.dt, state0.done,
        dev.planes, dev.span_lo, dev.span_bias, dev.clause_mask,
    )
    put = lambda x, s: jax.device_put(x, NamedSharding(mesh, s))  # noqa: E731
    args = tuple(put(a, s) for a, s in zip(args, specs_in))
    v_all, _, _ = jax.jit(sharded)(*args)
    v_all = np.asarray(v_all)
    for s in range(1, 4):
        np.testing.assert_array_equal(v_all[s], v_all[0])


def test_shard_chunk_production_path_gated_off_tpu():
    """The production 2-axis runner must refuse shard_chunk off-TPU with
    a clear message (interpret mode cannot simulate remote DMA under a
    two-axis mesh)."""
    from odesat_tpu.parallel.mesh import make_mesh
    from odesat_tpu.parallel.sharded import compile_for_mesh, make_sharded_chunk_runner
    from odesat_tpu.utils.config import SolverConfig

    formula = random_ksat(96, 420, k=3, seed=5, planted=True)
    _, normalized = normalize_cnf_variables(formula)
    mesh = make_mesh(4, 2)
    ode = ODEConfig(step_size=0.01, shard_chunk=True)
    fa = compile_for_mesh(normalized, SolverConfig(ode=ode), mesh)
    with pytest.raises(ValueError, match="real TPU"):
        make_sharded_chunk_runner(fa, 0.001, ode, 8, mesh)
