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
    "n_shards,step_kind",
    [
        (2, "fixed"),
        (4, "fixed"),
        (8, "fixed"),  # 3 butterfly rounds: multi-round recv-slot indexing
        (2, "adaptive"),
        (4, "adaptive"),
        (8, "adaptive"),
    ],
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


def test_shard_chunk_odd_chunk_parity_flush_matches_scan():
    """Odd chunk lengths (user --chunk-steps or drive_chunks tails) end
    the once-per-step invocation sequence on parity 0; the kernel must
    issue the dead-data parity-1 flush invocation (ops/butterfly.py's
    alternation contract across block/launch boundaries) WITHOUT
    perturbing the results."""
    formula = random_ksat(96, 420, k=3, seed=5, planted=True)
    _, normalized = normalize_cnf_variables(formula)
    fa, plan = compile_stream_sharded(normalized, 4)
    ode = ODEConfig(step_size=0.01)
    steps = 7  # odd: exercises the flush
    state0 = init_state(fa, 8, jax.random.PRNGKey(4), ode)
    dev = formula_device(fa)

    ode_scan = ODEConfig(step_size=ode.step_size, dv_strategy="segment_sum")
    ref = make_chunk_runner(fa, 0.001, ode_scan, steps)(
        jax.tree.map(lambda x: jnp.array(np.asarray(x)), state0), dev
    )
    out = _run_sharded(fa, ode, steps, 4, state0, dev)
    np.testing.assert_allclose(np.asarray(out.v), np.asarray(ref.v), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.xs), np.asarray(ref.xs), rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(out.done), np.asarray(ref.done))


def test_stoch_shard_chunk_odd_chunk_parity_flush_bitwise():
    """Same flush-invocation coverage for the whole-chunk stoch kernel:
    an odd chunk through the butterfly must still BIT-match S=1."""
    from odesat_tpu.ops.stoch_pallas import (
        make_stoch_shard_chunk,
        stoch_shard_arrays,
    )

    formula = random_ksat(96, 420, k=3, seed=7, planted=True)
    _, normalized = normalize_cnf_variables(formula)
    B, chunk = 8, 11  # odd: exercises the flush
    seed = jnp.asarray([4242], dtype=jnp.int32)

    outs = {}
    for S in (1, 4):
        fa, plan = compile_stream_sharded(normalized, S)
        v = jnp.zeros((B, fa.n_vars_padded), jnp.float32)
        xl = jnp.ones((B, fa.n_clauses_padded), jnp.float32)
        done = jnp.zeros((B,), jnp.bool_)
        if S == 1:
            call = make_stoch_shard_chunk(fa, chunk, interpret=True, traj_block=B)
            sbias, nsign = stoch_shard_arrays(fa)
            out = call(
                v, xl, done, seed,
                jnp.asarray(plan.planes[0]), jnp.asarray(plan.lo[0]),
                jnp.asarray(sbias[0]), jnp.asarray(nsign[0]),
                jnp.asarray(fa.clause_mask),
            )
        else:
            out = _run_stoch_sharded(fa, plan, chunk, S, v, xl, done, seed, B)
        outs[S] = (np.asarray(out[0]), np.asarray(out[2]))

    np.testing.assert_array_equal(outs[4][0], outs[1][0])  # v bitwise
    np.testing.assert_array_equal(outs[4][1], outs[1][1])  # done


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


def _run_stoch_sharded(fa, plan, chunk, n_shards, v0, xl0, done0, seed, traj_block):
    """Drive the whole-chunk stoch kernel under a clause-only shard_map
    (same harness rationale as _run_sharded)."""
    from odesat_tpu.ops.stoch_pallas import (
        make_stoch_shard_chunk,
        stoch_shard_arrays,
    )

    call = make_stoch_shard_chunk(fa, chunk, interpret=True, traj_block=traj_block)
    sbias, nsign = stoch_shard_arrays(fa)
    mesh = _clause_mesh(n_shards)

    def local(v, xl, done, seed, planes, lo, sbias, nsign, cmask):
        return call(
            v, xl, done, seed, planes[0], lo[0], sbias[0], nsign[0], cmask
        )

    specs_in = (
        P(), P(None, "clause"), P(), P(),
        P("clause"), P("clause"), P("clause"), P("clause"), P("clause"),
    )
    specs_out = (P(), P(None, "clause"), P())
    sharded = shard_map(
        local, mesh=mesh, in_specs=specs_in, out_specs=specs_out, check_vma=False
    )
    args = (
        v0, xl0, done0, seed,
        jnp.asarray(plan.planes), jnp.asarray(plan.lo),
        jnp.asarray(sbias), jnp.asarray(nsign), jnp.asarray(fa.clause_mask),
    )
    put = lambda x, s: jax.device_put(x, NamedSharding(mesh, s))  # noqa: E731
    args = tuple(put(a, s) for a, s in zip(args, specs_in))
    return jax.jit(sharded)(*args)


def test_stoch_shard_chunk_matches_single_shard_bitwise():
    """S=4 through the butterfly must BIT-match S=1 (no collective) for
    the same seed: the weight sums are integer-valued f32 (exact under
    any summation order) and the counter-based PRNG stream depends only
    on (seed, block, step, row, col) — so the flip sequences, v, and
    done must be identical."""
    from odesat_tpu.ops.stoch_pallas import (
        make_stoch_shard_chunk,
        stoch_shard_arrays,
        stoch_shard_chunk_supported,
    )

    formula = random_ksat(96, 420, k=3, seed=7, planted=True)
    _, normalized = normalize_cnf_variables(formula)
    B, chunk = 8, 12
    seed = jnp.asarray([12345], dtype=jnp.int32)
    v0 = jnp.zeros((0,))  # placeholder, rebuilt per layout below

    outs = {}
    for S in (1, 4, 8):
        fa, plan = compile_stream_sharded(normalized, S)
        assert stoch_shard_chunk_supported(fa)
        v = jnp.zeros((B, fa.n_vars_padded), jnp.float32)
        xl = jnp.ones((B, fa.n_clauses_padded), jnp.float32)
        done = jnp.zeros((B,), jnp.bool_)
        if S == 1:
            call = make_stoch_shard_chunk(fa, chunk, interpret=True, traj_block=B)
            sbias, nsign = stoch_shard_arrays(fa)
            out = call(
                v, xl, done, seed,
                jnp.asarray(plan.planes[0]), jnp.asarray(plan.lo[0]),
                jnp.asarray(sbias[0]), jnp.asarray(nsign[0]),
                jnp.asarray(fa.clause_mask),
            )
        else:
            out = _run_stoch_sharded(fa, plan, chunk, S, v, xl, done, seed, B)
        outs[S] = (np.asarray(out[0]), np.asarray(out[2]))

    for S in (4, 8):
        np.testing.assert_array_equal(outs[S][0], outs[1][0])  # v bitwise
        np.testing.assert_array_equal(outs[S][1], outs[1][1])  # done


def test_stoch_shard_chunk_replicated_v_stays_bitwise_identical():
    """Every clause shard must hold the SAME v after the chunk (the
    butterfly's symmetric grouping + shard-replicated PRNG seed)."""
    from odesat_tpu.ops.stoch_pallas import (
        make_stoch_shard_chunk,
        stoch_shard_arrays,
    )

    formula = random_ksat(96, 420, k=3, seed=11, planted=True)
    _, normalized = normalize_cnf_variables(formula)
    fa, plan = compile_stream_sharded(normalized, 4)
    B = 8
    call = make_stoch_shard_chunk(fa, 10, interpret=True, traj_block=B)
    sbias, nsign = stoch_shard_arrays(fa)
    mesh = _clause_mesh(4)

    def local(v, xl, done, seed, planes, lo, sbias, nsign, cmask):
        out = call(
            v, xl, done, seed, planes[0], lo[0], sbias[0], nsign[0], cmask
        )
        return (out[0][None],) + out[1:]

    specs_in = (
        P(), P(None, "clause"), P(), P(),
        P("clause"), P("clause"), P("clause"), P("clause"), P("clause"),
    )
    specs_out = (P("clause"), P(None, "clause"), P())
    sharded = shard_map(
        local, mesh=mesh, in_specs=specs_in, out_specs=specs_out, check_vma=False
    )
    args = (
        jnp.zeros((B, fa.n_vars_padded), jnp.float32),
        jnp.ones((B, fa.n_clauses_padded), jnp.float32),
        jnp.zeros((B,), jnp.bool_),
        jnp.asarray([77], dtype=jnp.int32),
        jnp.asarray(plan.planes), jnp.asarray(plan.lo),
        jnp.asarray(sbias), jnp.asarray(nsign), jnp.asarray(fa.clause_mask),
    )
    put = lambda x, s: jax.device_put(x, NamedSharding(mesh, s))  # noqa: E731
    args = tuple(put(a, s) for a, s in zip(args, specs_in))
    v_all, _, _ = jax.jit(sharded)(*args)
    v_all = np.asarray(v_all)
    for s in range(1, 4):
        np.testing.assert_array_equal(v_all[s], v_all[0])


def test_stoch_shard_chunk_matches_fused_kernel_bitwise():
    """S=1 shard-chunk vs the (distribution-validated) resident fused
    stoch kernel, same derived seed: the counter PRNG stream depends
    only on (seed, block, step, row, col) and the weight sums are
    integer-valued f32 (exact under any clause order), so v and done
    must be bit-identical despite the different clause layouts."""
    from odesat_tpu.cnf import compile_formula
    from odesat_tpu.models.stoch import StochState
    from odesat_tpu.ops.stoch_pallas import (
        make_fused_stoch_chunk,
        make_stoch_shard_chunk,
        stoch_shard_arrays,
    )

    formula = random_ksat(96, 420, k=3, seed=13, planted=True)
    _, normalized = normalize_cnf_variables(formula)
    B, chunk = 8, 16
    key = jax.random.PRNGKey(21)

    fa_f = compile_formula(normalized)
    fused = make_fused_stoch_chunk(fa_f, chunk, interpret=True)
    state = StochState(
        v=jnp.zeros((B, fa_f.n_vars_padded), jnp.bool_),
        xl=jnp.ones((B, fa_f.n_clauses_padded), jnp.int32),
        done=jnp.zeros((B,), jnp.bool_),
        key=key,
    )
    out_f = fused(state)

    fa_s, plan = compile_stream_sharded(normalized, 1)
    assert fa_s.n_vars_padded == fa_f.n_vars_padded  # same PRNG columns
    # replicate the fused wrapper's seed derivation exactly
    _, sub = jax.random.split(key)
    seed = jax.random.randint(sub, (1,), 0, 2**31 - 1, dtype=jnp.int32)
    call = make_stoch_shard_chunk(fa_s, chunk, interpret=True, traj_block=B)
    sbias, nsign = stoch_shard_arrays(fa_s)
    v_s, _, done_s = call(
        jnp.zeros((B, fa_s.n_vars_padded), jnp.float32),
        jnp.ones((B, fa_s.n_clauses_padded), jnp.float32),
        jnp.zeros((B,), jnp.bool_),
        seed,
        jnp.asarray(plan.planes[0]), jnp.asarray(plan.lo[0]),
        jnp.asarray(sbias[0]), jnp.asarray(nsign[0]),
        jnp.asarray(fa_s.clause_mask),
    )
    np.testing.assert_array_equal(np.asarray(v_s) > 0.5, np.asarray(out_f.v))
    np.testing.assert_array_equal(np.asarray(done_s), np.asarray(out_f.done))


def test_stoch_shard_chunk_solves_and_verifies():
    """End-to-end: the whole-chunk stoch kernel on a 2-shard clause mesh
    solves a small planted instance and the readout oracle-verifies."""
    from odesat_tpu.cnf.evaluate import evaluate_cnf

    formula = random_ksat(48, 200, k=3, seed=3, planted=True)
    _, normalized = normalize_cnf_variables(formula)
    fa, plan = compile_stream_sharded(normalized, 2)
    B = 8
    v = jnp.zeros((B, fa.n_vars_padded), jnp.float32)
    xl = jnp.ones((B, fa.n_clauses_padded), jnp.float32)
    done = jnp.zeros((B,), jnp.bool_)
    seed = jnp.asarray([5], dtype=jnp.int32)
    for _ in range(20):
        v, xl, done = _run_stoch_sharded(
            fa, plan, 50, 2, v, xl, done, seed, B
        )
        seed = seed + 1
        if bool(np.asarray(done).any()):
            break
    done_np = np.asarray(done)
    assert done_np.any(), "no chain satisfied the planted instance"
    idx = int(np.flatnonzero(done_np)[0])
    assign = np.asarray(v)[idx, : fa.n_vars] > 0.5
    assert evaluate_cnf({i: bool(b) for i, b in enumerate(assign)}, normalized)


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


def test_stoch_shard_chunk_production_path_gated_off_tpu():
    """The stoch runner's shard_chunk variant has the same off-TPU gate
    (and the same clause-only interpret harness above as its validation
    path)."""
    from odesat_tpu.parallel.mesh import make_mesh
    from odesat_tpu.parallel.sharded import compile_for_mesh, make_sharded_stoch_runner
    from odesat_tpu.utils.config import ODEConfig, SolverConfig

    formula = random_ksat(96, 420, k=3, seed=5, planted=True)
    _, normalized = normalize_cnf_variables(formula)
    mesh = make_mesh(4, 2)
    ode = ODEConfig(step_size=0.01, shard_chunk=True)
    fa = compile_for_mesh(normalized, SolverConfig(ode=ode), mesh)
    with pytest.raises(ValueError, match="real TPU"):
        make_sharded_stoch_runner(fa, 8, mesh, shard_chunk=True)


def test_resolve_shard_chunk_auto_picks_measured_winner():
    """The 'auto' dispatch must choose each engine's measured winner
    (tools/bracket_shard_chunk.py, round 4): the ODE whole-chunk kernel
    wins at every measured plane size (1.10x at 43.8 MiB, 1.11x at
    192 MiB), the stoch one only in the large-plane regime (0.96x at
    43.8 MiB, 1.20x at 192 MiB). Pins the stoch 96 MiB crossover."""
    from types import SimpleNamespace

    from odesat_tpu.ops.shard_chunk import (
        STOCH_SHARD_CHUNK_AUTO_MIN_PLANE_BYTES,
        resolve_shard_chunk,
    )

    ode_auto = ODEConfig(step_size=0.01)  # shard_chunk defaults to "auto"
    assert ode_auto.shard_chunk == "auto"
    small = SimpleNamespace(planes=np.zeros((1, 179200, 128), np.float32))
    huge = SimpleNamespace(planes=np.zeros((1, 787968, 128), np.float32))
    # ODE: whole-chunk wins both measured brackets -> auto always on
    assert resolve_shard_chunk(ode_auto, small, itemsize=2) is True
    assert resolve_shard_chunk(ode_auto, huge, itemsize=2) is True
    assert resolve_shard_chunk(ode_auto, None, itemsize=2) is False

    # stoch: per-step wins small plans, whole-chunk wins huge ones;
    # the measured bracket pins the crossover's position
    assert resolve_shard_chunk(ode_auto, small, itemsize=2, engine="stoch") is False
    assert resolve_shard_chunk(ode_auto, huge, itemsize=2, engine="stoch") is True
    assert (179200 * 128 * 2
            < STOCH_SHARD_CHUNK_AUTO_MIN_PLANE_BYTES
            <= 787968 * 128 * 2)

    # forced modes override the regime; legacy bools still map
    ode_on = ODEConfig(step_size=0.01, shard_chunk="on")
    ode_off = ODEConfig(step_size=0.01, shard_chunk="off")
    assert resolve_shard_chunk(ode_on, huge, itemsize=2) is True
    assert resolve_shard_chunk(ode_off, small, itemsize=2) is False
    assert resolve_shard_chunk(ODEConfig(shard_chunk=True), huge) is True
    assert resolve_shard_chunk(ODEConfig(shard_chunk=False), small) is False
    assert resolve_shard_chunk(ode_on, small, itemsize=2, engine="stoch") is True


def test_auto_dispatch_falls_back_off_tpu_without_error():
    """Off-TPU, 'auto' must quietly take the per-step path on a clause
    mesh (only an explicit 'on' may raise the real-TPU error) — a CPU
    user with the default config must never hit the hardware gate."""
    from odesat_tpu.parallel.mesh import make_mesh
    from odesat_tpu.parallel.sharded import compile_for_mesh, make_sharded_chunk_runner
    from odesat_tpu.utils.config import SolverConfig

    formula = random_ksat(96, 420, k=3, seed=5, planted=True)
    _, normalized = normalize_cnf_variables(formula)
    mesh = make_mesh(4, 2)
    ode = ODEConfig(step_size=0.01)  # auto; small plan = in-regime
    fa = compile_for_mesh(normalized, SolverConfig(ode=ode), mesh)
    runner = make_sharded_chunk_runner(fa, 0.001, ode, 8, mesh)
    assert runner is not None  # per-step fallback, no raise


def test_stoch_auto_dispatch_falls_back_off_tpu_without_error(monkeypatch):
    """The stoch 'auto' dispatch (ADVICE r4, high): once a plan's plane
    sweep enters the whole-chunk regime, models/stoch.py must still AND
    the regime gate with stoch_shard_chunk_supported() and the TPU
    backend before handing shard_chunk=True to the runner — otherwise a
    default-config clause-sharded stoch run on a CPU mesh (or an
    unsupported plan) crashes in make_sharded_stoch_runner instead of
    falling back to the per-step path. Only an explicit 'on' may raise."""
    from odesat_tpu.ops import shard_chunk as sc
    from odesat_tpu.parallel.mesh import make_mesh
    from odesat_tpu.parallel.sharded import compile_for_mesh, make_sharded_stoch_runner
    from odesat_tpu.utils.config import SolverConfig

    formula = random_ksat(96, 420, k=3, seed=5, planted=True)
    _, normalized = normalize_cnf_variables(formula)
    mesh = make_mesh(4, 2)
    ode = ODEConfig(step_size=0.01)  # shard_chunk='auto'
    fa = compile_for_mesh(normalized, SolverConfig(ode=ode), mesh)

    # force the plane sweep into the whole-chunk regime so only the
    # supported/backend gates stand between 'auto' and the crash
    monkeypatch.setattr(sc, "STOCH_SHARD_CHUNK_AUTO_MIN_PLANE_BYTES", 0)
    assert sc.resolve_shard_chunk(ode, fa.shard_plan, 4, engine="stoch")
    use = sc.resolve_stoch_shard_chunk(ode, fa, mesh.shape["clause"], 4)
    assert use is False  # off-TPU: quiet fallback, not a raise
    runner = make_sharded_stoch_runner(fa, 8, mesh, shard_chunk=use)
    assert runner is not None

    # an explicit 'on' still reaches the loud hardware gate
    ode_on = ODEConfig(step_size=0.01, shard_chunk="on")
    assert sc.resolve_stoch_shard_chunk(ode_on, fa, mesh.shape["clause"], 4)
    with pytest.raises(ValueError, match="real TPU"):
        make_sharded_stoch_runner(fa, 8, mesh, shard_chunk=True)


def test_collective_consistency_check_passes_and_runs_once(data_dir, monkeypatch):
    """The first-run butterfly-vs-psum cross-check (ADVICE r3): on a
    matching topology the two paths agree and the check runs exactly
    once per runner; ODESAT_SKIP_COLLECTIVE_CHECK bypasses it. Validated
    at S=1 (interpret) where both paths execute on the CPU mesh — the
    comparison machinery is identical at S>1."""
    from odesat_tpu.parallel.mesh import make_mesh
    from odesat_tpu.parallel import sharded as sh
    from odesat_tpu.parallel.sharded import (
        _collective_consistency_check,
        _with_consistency_check,
        shard_inputs,
    )
    from odesat_tpu.models.ode import formula_device as fdev, init_state as istate

    formula = random_ksat(96, 420, k=3, seed=5, planted=True)
    _, normalized = normalize_cnf_variables(formula)
    mesh = make_mesh(8, 1)
    ode = ODEConfig(step_size=0.01)
    fa, _plan = compile_stream_sharded(normalized, 1)
    state = istate(fa, 8, jax.random.PRNGKey(0), ode)
    dev = fdev(fa)
    state, dev = shard_inputs(state, dev, mesh)

    # happy path: both integrations agree, state survives (copies donated)
    _collective_consistency_check(fa, 0.001, ode, mesh, state, dev)
    assert np.asarray(state.v).shape[0] == 8

    calls = []
    real = sh._collective_consistency_check
    monkeypatch.setattr(
        sh, "_collective_consistency_check",
        lambda *a, **k: calls.append(1) or real(*a, **k),
    )
    runner = _with_consistency_check(
        lambda s, d: s, fa, 0.001, ode, mesh
    )
    runner(state, dev)
    runner(state, dev)
    assert len(calls) == 1  # first invocation only

    monkeypatch.setenv("ODESAT_SKIP_COLLECTIVE_CHECK", "1")
    calls.clear()
    runner2 = _with_consistency_check(lambda s, d: s, fa, 0.001, ode, mesh)
    runner2(state, dev)
    assert not calls
