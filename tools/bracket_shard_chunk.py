"""Bracket the shard-chunk 'auto' dispatch crossover on live hardware.

The clause-sharded path has two kernels per engine: a per-step launch
(XLA psum between launches) and a whole-chunk kernel with the
all-reduce in-kernel (ops/shard_chunk.py, stoch twin in
ops/stoch_pallas.py). Which wins at S=1 depends on the per-shard plane
sweep the whole-chunk kernel streams from HBM every step, so the 'auto'
rule (ops/shard_chunk.resolve_shard_chunk) is keyed on measured
brackets — this tool IS the measurement. Run it after any chunk-kernel
change and update SHARD_CHUNK_AUTO_PLANE_BYTES / the stoch gate if a
winner flips (round 4: the taken-branch-hoist revert had to be
re-bracketed because the hoist had been in the round-3 numbers).

Same kernels and calling conventions as benchmarks/run_benchmarks.py
configs 7/7b/7c/7d plus the n=1k small-plane regime.

Usage: python tools/bracket_shard_chunk.py   (~10 min of TPU time)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from odesat_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from odesat_tpu.cnf import normalize_cnf_variables
from odesat_tpu.models.ode import ODEState, formula_device, init_state
from odesat_tpu.ops.shard_chunk import make_shard_chunk_call
from odesat_tpu.ops.shard_stream import (
    SPAN,
    compile_stream_sharded,
    make_single_device_runner,
)
from odesat_tpu.preprocess import preprocess_formula
from odesat_tpu.utils.config import ODEConfig
from odesat_tpu.utils.generate import random_ksat, random_local_ksat
from odesat_tpu.utils.timing import measure_throughput


def ode_pair(name, fa, plan, ode, batch, chunk):
    """Per-step-launch vs whole-chunk ODE kernels at S=1."""
    dev = formula_device(fa, matmul_dtype=ode.matmul_dtype)
    plane_mib = (
        plan.planes.shape[1] * SPAN * (2 if ode.matmul_dtype == "bfloat16" else 4)
    ) / 2**20

    runner = make_single_device_runner(fa, 0.001, ode, chunk)
    st = init_state(fa, batch, jax.random.PRNGKey(0), ode)
    r_step, _ = measure_throughput(runner, st, dev, chunk, batch, iters=3)

    call = make_shard_chunk_call(fa, 0.001, ode, chunk)

    def chunk_runner(st, dv):
        v, xs, xl, dt2, done = call(
            st.v, st.xs, st.xl, st.dt, st.done,
            dv.planes[0], dv.span_lo[0], dv.span_bias[0], dv.clause_mask,
        )
        return ODEState(v, xs, xl, dt2, done)

    cjit = jax.jit(chunk_runner, donate_argnums=0)
    st = init_state(fa, batch, jax.random.PRNGKey(0), ode)
    r_chunk, _ = measure_throughput(cjit, st, dev, chunk, batch, iters=3)
    print(f"{name} (planes {plane_mib:.1f} MiB): step {r_step:.3e}  "
          f"chunk {r_chunk:.3e}  chunk/step {r_chunk / r_step:.2f}x",
          flush=True)


def stoch_pair(name, fa, plan, batch, chunk):
    """Per-step vs whole-chunk stoch shard kernels at S=1."""
    from odesat_tpu.models.stoch import StochState, init_stoch_state
    from odesat_tpu.ops.stoch_pallas import (
        make_stoch_shard_chunk,
        make_stoch_shard_eval,
        stoch_shard_arrays,
        stoch_shard_chunk_supported,
    )

    ev = make_stoch_shard_eval(fa, matmul_dtype="bfloat16")
    sb, ns = stoch_shard_arrays(fa)
    args = (
        jnp.asarray(plan.planes[0]),
        jnp.asarray(plan.lo[0]),
        jnp.asarray(sb[0]),
        jnp.asarray(ns[0]),
        jnp.asarray(fa.clause_mask),
    )

    def step(state, a):
        planes, lo, sbias, nsign, cmask = a
        key, sub = jax.random.split(state.key)
        active = ~state.done
        tot, uns, xl_new, sat_all = ev(
            state.v.astype(jnp.float32), state.xl.astype(jnp.float32),
            active, planes, lo, sbias, nsign, cmask,
        )
        u = jax.random.uniform(sub, tot.shape, dtype=jnp.float32)
        flip = u * tot < uns
        v = jnp.where(active[:, None] & flip, ~state.v, state.v)
        return StochState(v, xl_new.astype(jnp.int32), state.done | sat_all, key)

    def chunk_fn(state, a):
        def body(c, _):
            return step(c, a), None

        out, _ = jax.lax.scan(body, state, None, length=chunk)
        return out

    sjit = jax.jit(chunk_fn, donate_argnums=0)
    sst = init_stoch_state(fa, batch, jax.random.PRNGKey(0))
    r_step, _ = measure_throughput(sjit, sst, args, chunk, batch, iters=3)

    assert stoch_shard_chunk_supported(fa, 2)
    cfn = make_stoch_shard_chunk(fa, chunk, matmul_dtype="bfloat16")

    def chunk_runner(state, a):
        planes, lo, sbias, nsign, cmask = a
        key, sub = jax.random.split(state.key)
        seed = jax.random.randint(sub, (1,), 0, 2**31 - 1, dtype=jnp.int32)
        v, xl, done = cfn(
            state.v.astype(jnp.float32), state.xl.astype(jnp.float32),
            state.done, seed, planes, lo, sbias, nsign, cmask,
        )
        return StochState(v > 0.5, xl.astype(jnp.int32), done, key)

    cjit = jax.jit(chunk_runner, donate_argnums=0)
    cst = init_stoch_state(fa, batch, jax.random.PRNGKey(0))
    r_chunk, _ = measure_throughput(cjit, cst, args, chunk, batch, iters=3)
    print(f"{name}: step {r_step:.3e}  chunk {r_chunk:.3e}  "
          f"chunk/step {r_chunk / r_step:.2f}x", flush=True)


def main():
    ode = ODEConfig(step_size=0.01, matmul_dtype="bfloat16")

    # small-plane regime: preprocessed random n=1k (suite config 4 shape)
    f1 = random_ksat(1000, 4300, k=3, seed=7, planted=True)
    reduced, _ = preprocess_formula(f1, 7.0)
    _, norm1 = normalize_cnf_variables(reduced)
    fa1, plan1 = compile_stream_sharded(norm1, 1)
    ode_pair("ODE n=1k S=1", fa1, plan1, ode, 4096, 200)
    stoch_pair("stoch n=1k S=1", fa1, plan1, 4096, 200)

    # large-plane regime: local n=10240 (suite config 7 shape)
    f7 = random_local_ksat(10240, 43700, k=3, locality=512, seed=9)
    _, norm7 = normalize_cnf_variables(f7)
    fa7, plan7 = compile_stream_sharded(norm7, 1)
    ode_pair("ODE n=10240 S=1", fa7, plan7, ode, 1024, 100)
    stoch_pair("stoch n=10240 S=1", fa7, plan7, 1024, 100)


if __name__ == "__main__":
    main()
