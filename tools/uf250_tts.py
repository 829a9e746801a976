"""Load-robust uf250 north-star TTS protocol (round-2 VERDICT item 6).

Wall-clock TTS on this machine's remote-dispatch backend swings ±2x
with host load, which says nothing about the solver. This protocol
separates the load-independent part from the load-dependent part:

* **steps-to-solution** per instance is deterministic given the seed —
  a pure solver-quality number with zero measurement noise;
* **compute TTS** = steps x batch / measured steady-state kernel rate —
  what the hardware needs at the measured kernel throughput;
* **dispatch latency** is measured separately (median of repeated
  no-op dispatch+sync round trips) and multiplied by the chunk count;
* the residual (wall - compute - dispatch) is host/load noise, reported
  so the spread is explained rather than absorbed.

Usage: python tools/uf250_tts.py [n_instances] [batch] [chunk]

The default 500-step chunk makes steps-to-solution chunk-granular (the
round-3 measurement saw every instance finish inside its first chunk,
i.e. true value <= 500); pass a smaller chunk (e.g. 50) to resolve it.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from odesat_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from odesat_tpu.cnf import compile_formula, normalize_cnf_variables
from odesat_tpu.models.ode import formula_device, init_state, make_chunk_runner, simulate_batch
from odesat_tpu.utils.config import ODEConfig, SolverConfig
from odesat_tpu.utils.generate import uf_instance
from odesat_tpu.utils.timing import measure_throughput, sync


def main():
    n_inst = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    CHUNK = int(sys.argv[3]) if len(sys.argv) > 3 else 500

    # --- dispatch+sync latency: tiny jitted op, host-pulled -----------------
    x = jnp.zeros((8, 128))
    f = jax.jit(lambda a: a + 1.0)
    np.asarray(f(x))  # compile
    lat = []
    for _ in range(15):
        t0 = time.perf_counter()
        np.asarray(f(x))
        lat.append(time.perf_counter() - t0)
    dispatch_s = float(np.median(lat))
    print(f"dispatch+sync round trip: median {dispatch_s*1e3:.1f} ms "
          f"(p90 {np.percentile(lat, 90)*1e3:.1f} ms over 15)")

    # --- steady-state kernel rate on the uf250 shape ------------------------
    inst0 = uf_instance(250, seed=0)
    _, norm0 = normalize_cnf_variables(inst0)
    fa = compile_formula(norm0)
    ode = ODEConfig(step_size=0.01, matmul_dtype="bfloat16")
    runner = make_chunk_runner(fa, ode.resolve_zeta(fa.density), ode, 2000)
    st = init_state(fa, B, jax.random.PRNGKey(0), ode)
    rate, _ = measure_throughput(runner, st, formula_device(fa), 2000, B, iters=3)
    print(f"steady-state kernel rate at B={B}: {rate:.3e} traj*steps/s")

    # --- instances ----------------------------------------------------------
    rows = []
    for seed in range(n_inst):
        inst = uf_instance(250, seed=seed)
        _, norm = normalize_cnf_variables(inst)
        cfg = SolverConfig(
            ode=ODEConfig(step_size=0.01, steps=20000, matmul_dtype="bfloat16"),
            batch_size=B,
            seed=seed,
            chunk_steps=CHUNK,
        )
        t0 = time.perf_counter()
        res = simulate_batch(norm, cfg)
        wall = time.perf_counter() - t0
        chunks = -(-res.steps // CHUNK)
        compute = res.steps * B / rate
        overhead = chunks * dispatch_s
        rows.append((seed, res.any_solved, res.steps, wall, compute, overhead))

    print(f"\n{'seed':>4} {'solved':>6} {'steps':>6} {'wall s':>7} "
          f"{'compute s':>9} {'dispatch s':>10} {'residual s':>10}")
    for seed, ok, steps, wall, comp, ovh in rows:
        print(f"{seed:>4} {str(ok):>6} {steps:>6} {wall:>7.2f} "
              f"{comp:>9.3f} {ovh:>10.3f} {wall - comp - ovh:>10.3f}")

    solved = sum(1 for r in rows if r[1])
    steps = np.array([r[2] for r in rows if r[1]])
    walls = np.array([r[3] for r in rows if r[1]])
    comps = np.array([r[4] for r in rows if r[1]])
    ovhs = np.array([r[5] for r in rows if r[1]])
    resid = walls - comps - ovhs
    print(f"\nsolved {solved}/{n_inst}")
    print(f"steps-to-solution: median {np.median(steps):.0f}, "
          f"p90 {np.percentile(steps, 90):.0f}, max {steps.max()}")
    print(f"compute TTS (steps x B / kernel rate): median "
          f"{np.median(comps)*1e3:.0f} ms, p90 {np.percentile(comps, 90)*1e3:.0f} ms")
    print(f"dispatch share (chunks x {dispatch_s*1e3:.1f} ms): median "
          f"{np.median(ovhs)*1e3:.0f} ms")
    print(f"wall TTS: median {np.median(walls)*1e3:.0f} ms, "
          f"p90 {np.percentile(walls, 90)*1e3:.0f} ms, max {walls.max()*1e3:.0f} ms")
    print(f"residual (host/load noise): median {np.median(resid)*1e3:.0f} ms, "
          f"p90 {np.percentile(resid, 90)*1e3:.0f} ms")


if __name__ == "__main__":
    main()
