"""Per-config roofline accounting (round-2 VERDICT item 5).

For every throughput config in the benchmark suite this computes, from
the kernel's OWN layout (the compiled plane shapes, not idealized
formula sizes):

* the pure-MXU bound: 4 flops per plane cell per RHS evaluation at the
  v5e bf16 peak (197 Tflop/s);
* the VPU share: ~45 f32 elementwise ops per clause slot per RHS for
  the ODE kernels (the round-2 op-count analysis, A1/A2 hoisted form)
  at the measured ~3.9 Tops/s v5e VPU rate;
* the serial-sum bound (MXU + VPU, no overlap) — the round-2 aim100
  analysis showed Mosaic largely serializes the engines at small Np,
  while larger tiles overlap partially, so measured rates land between
  the serial-sum and pure-MXU bounds.

Prints a markdown table row per config: measured, serial-sum bound,
pure-MXU bound, %-of-MXU, and the limiter.

Usage: python tools/roofline.py  (measures live; ~5 min of TPU time)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import numpy as np

from odesat_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from odesat_tpu.cnf import compile_formula, normalize_cnf_variables, parse_dimacs_file
from odesat_tpu.models.ode import formula_device, init_state, make_chunk_runner
from odesat_tpu.utils.config import ODEConfig
from odesat_tpu.utils.generate import random_ksat, random_local_ksat
from odesat_tpu.utils.timing import measure_throughput

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
DATA = os.path.join(HERE, "tests", "data")

MXU_BF16 = 197e12  # v5e peak flop/s
VPU_F32 = 3.9e12  # measured effective VPU rate (round-2 aim100 analysis)
ODE_VPU_OPS_PER_SLOT = 45  # A1/A2-hoisted per-clause-slot elementwise ops

# Adaptive extras beyond the 2 RHS evals, counted from the fused kernel
# body (ops/fused_pallas.py step_one, adaptive branch): 3 clamped Euler
# updates at 4 ops/element (mul, add, fmax, fmin) over v(Np)+xs(Mp)+
# xl(Mp) = 12*(Np+2Mp); the inf-norm error (sub+abs+max tree) ~3*(Np+
# 2Mp); the 3 freeze selects ~1*(Np+2Mp); dt sqrt/clip is O(1)/traj.
ADAPTIVE_EXTRA_OPS_PER_ELEM = 16  # x (Np + 2*Mp) per traj per step

# Stoch kernel VPU ops, counted from ops/stoch_pallas.py body:
# per K*Mp plane slot: bias add + two sign mults ~= 3; per clause (Mp):
# sat max tree (K-1~=2) + xl weight update (cmp, sub/add, max/min,
# select, cmask mult ~= 7) + unsat_f/xu/xl-select/allsat ~= 5 -> ~13;
# per variable (Np): counter-PRNG finalizer ~12 + flip compare/selects
# ~6 -> ~18.
STOCH_VPU_OPS_PER_SLOT = 3  # x K*Mp
STOCH_VPU_OPS_PER_CLAUSE = 13  # x Mp
STOCH_VPU_OPS_PER_VAR = 18  # x Np


def fused_bounds(fa, batch, traj_block):
    """(mxu_rate, serial_rate) in traj·steps/s for the resident fused
    kernel: one (Bb, Np) x (Np, K*Mp) forward + transposed scatter per
    RHS. Grid blocks run sequentially, so the batch-wide rate equals
    the per-block rate Bb/t_block regardless of B."""
    Np, Mp, K = fa.n_vars_padded, fa.n_clauses_padded, fa.max_width
    flops_per_traj = 4.0 * Np * K * Mp
    t_mxu = flops_per_traj * traj_block / MXU_BF16
    t_vpu = ODE_VPU_OPS_PER_SLOT * traj_block * Mp / VPU_F32
    return traj_block / t_mxu, traj_block / (t_mxu + t_vpu)


def stream_bounds(plane_rows, mp, traj_block):
    """Same model for the streaming kernels, using the ACTUAL windowed
    plane rows (R) the compile produced (windows < Np cut real flops)."""
    flops_per_traj = 4.0 * plane_rows * 128
    t_mxu = flops_per_traj * traj_block / MXU_BF16
    t_vpu = ODE_VPU_OPS_PER_SLOT * traj_block * mp / VPU_F32
    return traj_block / t_mxu, traj_block / (t_mxu + t_vpu)


def adaptive_fused_bounds(fa, traj_block):
    """(mxu_rate, serial_rate) in traj·steps/s for the fused kernel's
    adaptive integrator: 2 RHS evals per step (trial + midpoint) plus
    the step-doubling bookkeeping (ADAPTIVE_EXTRA_OPS_PER_ELEM). The
    pure-MXU bound only doubles the matmul work; the serial-sum bound
    adds both RHS VPU passes and the update/error chain."""
    Np, Mp, K = fa.n_vars_padded, fa.n_clauses_padded, fa.max_width
    t_mxu = 4.0 * Np * K * Mp * traj_block / MXU_BF16
    t_rhs_vpu = ODE_VPU_OPS_PER_SLOT * traj_block * Mp / VPU_F32
    t_extra = ADAPTIVE_EXTRA_OPS_PER_ELEM * (Np + 2 * Mp) * traj_block / VPU_F32
    return (
        traj_block / (2 * t_mxu),
        traj_block / (2 * (t_mxu + t_rhs_vpu) + t_extra),
    )


def stoch_vpu_time(np_, mp, k, traj_block):
    ops = (
        STOCH_VPU_OPS_PER_SLOT * k * mp
        + STOCH_VPU_OPS_PER_CLAUSE * mp
        + STOCH_VPU_OPS_PER_VAR * np_
    )
    return ops * traj_block / VPU_F32


def stoch_fused_bounds(fa, traj_block):
    """Stoch resident kernel: 3 matmuls per step over the (Np, K*Mp)
    concatenated planes (forward clause eval + total-weight and
    unsat-weight scatters) -> 6 flops per plane cell, vs the ODE's 4."""
    Np, Mp, K = fa.n_vars_padded, fa.n_clauses_padded, fa.max_width
    t_mxu = 6.0 * Np * K * Mp * traj_block / MXU_BF16
    t_vpu = stoch_vpu_time(Np, Mp, K, traj_block)
    return traj_block / t_mxu, traj_block / (t_mxu + t_vpu)


def stoch_stream_bounds(fa, plane_rows, traj_block):
    """Stoch streaming kernel: same 3-matmul step over the ACTUAL
    windowed plane rows the compile produced (windows < Np cut flops)."""
    Np, Mp, K = fa.n_vars_padded, fa.n_clauses_padded, fa.max_width
    t_mxu = 6.0 * plane_rows * 128 * traj_block / MXU_BF16
    t_vpu = stoch_vpu_time(Np, Mp, K, traj_block)
    return traj_block / t_mxu, traj_block / (t_mxu + t_vpu)


def measure(fa, ode, batch, chunk):
    runner = make_chunk_runner(fa, ode.resolve_zeta(fa.density), ode, chunk)
    st = init_state(fa, batch, jax.random.PRNGKey(0), ode)
    rate, _ = measure_throughput(runner, st, formula_device(fa), chunk, batch, iters=3)
    return rate


def row(name, measured, mxu, serial, note=""):
    print(f"| {name} | {measured:.2e} | {serial:.2e} | {mxu:.2e} | "
          f"{100*measured/mxu:.0f}% | {note} |")


def main():
    ode = ODEConfig(step_size=0.01, matmul_dtype="bfloat16")
    print("| config | measured traj·steps/s | serial-sum bound | pure-MXU bound | %MXU | limiter |")
    print("|---|---|---|---|---|---|")

    # 3b: hard.cnf fused B=16384
    formula = parse_dimacs_file(os.path.join(DATA, "hard.cnf"))
    _, norm = normalize_cnf_variables(formula)
    fa = compile_formula(norm)
    r = measure(fa, ode, 16384, 2000)
    mxu, serial = fused_bounds(fa, 16384, 512)
    row("3b hard.cnf fused", r, mxu, serial,
        "VPU (Np=128: 45 ops/slot vs 512 flops/slot)")

    # 3: hard.cnf ADAPTIVE fused B=8192 (suite config hard_adaptive)
    ode_ad = ODEConfig(matmul_dtype="bfloat16")  # adaptive, tol 1e-3
    r = measure(fa, ode_ad, 8192, 2000)
    mxu, serial = adaptive_fused_bounds(fa, 512)
    row("3 hard.cnf adaptive fused", r, mxu, serial,
        "VPU: 2 RHS passes + step-doubling update/error chain")

    # 5: uf250 fused B=16384
    formula = random_ksat(250, 1065, k=3, seed=11, planted=True)
    _, norm = normalize_cnf_variables(formula)
    fa = compile_formula(norm)
    r = measure(fa, ode, 16384, 2000)
    mxu, serial = fused_bounds(fa, 16384, 512)
    row("5 uf250 fused", r, mxu, serial,
        "VPU partially overlapped (measured above serial-sum)")

    # 4: preprocessed n=1k stream B=10240
    from odesat_tpu.preprocess import preprocess_formula

    formula = random_ksat(1000, 4300, k=3, seed=7, planted=True)
    reduced, _ = preprocess_formula(formula, 7.0)
    _, norm = normalize_cnf_variables(reduced)
    fa = compile_formula(norm, bucket=True, window_sort=True)
    r = measure(fa, ode, 10240, 200)
    # actual plane rows from the stream compile
    from odesat_tpu.ops.stream_pallas import _build_planes

    G, spans, _bias = _build_planes(fa, np.float32)
    R = G.shape[0]
    mxu, serial = stream_bounds(R, fa.n_clauses_padded, 1024)
    row("4 n=1k stream", r, mxu, serial,
        "MXU (windows ~ Np on random instances)")

    # 4b: stoch streaming kernel on the same preprocessed n=1k instance
    from odesat_tpu.models.stoch import init_stoch_state
    from odesat_tpu.ops.stoch_pallas import (
        _build_stoch_planes,
        make_fused_stoch_chunk,
        make_stream_stoch_chunk,
    )

    sfn = jax.jit(make_stream_stoch_chunk(fa, 200, matmul_dtype="bfloat16"))
    sstate = init_stoch_state(fa, 8192, jax.random.PRNGKey(0))
    srate, _ = measure_throughput(
        lambda st, dev=None: sfn(st), sstate, None, 200, 8192, iters=3
    )
    sG, _, _ = _build_stoch_planes(fa, np.float32)
    mxu, serial = stoch_stream_bounds(fa, sG.shape[0], 512)
    row("4b stoch n=1k stream", srate, mxu, serial,
        "MXU (3 matmuls/step: eval + 2 weight scatters)")

    # 4c: stoch resident fused kernel on aim100 (hard.cnf)
    formula = parse_dimacs_file(os.path.join(DATA, "hard.cnf"))
    _, norm = normalize_cnf_variables(formula)
    fa_h = compile_formula(norm)
    sfn2 = make_fused_stoch_chunk(fa_h, 2000, matmul_dtype="bfloat16")
    sstate2 = init_stoch_state(fa_h, 16384, jax.random.PRNGKey(0))
    srate2, _ = measure_throughput(
        lambda st, dev=None: sfn2(st), sstate2, None, 2000, 16384, iters=3
    )
    mxu, serial = stoch_fused_bounds(fa_h, 512)
    row("4c stoch aim100 fused", srate2, mxu, serial,
        "VPU at Np=128 (PRNG + weight chain vs 768 flops/slot)")

    # 6: locality-256 n=4096 stream B=10240
    formula = random_local_ksat(4096, 17203, k=3, locality=256, seed=3)
    _, norm = normalize_cnf_variables(formula)
    fa = compile_formula(norm, window_sort=True)
    r = measure(fa, ode, 10240, 200)
    G, spans, _bias = _build_planes(fa, np.float32)
    R = G.shape[0]
    mxu, serial = stream_bounds(R, fa.n_clauses_padded, 512)
    row("6 local n=4096 stream", r, mxu, serial,
        "VPU share grows as windows shrink flops")

    # 7: n=10240 clause-shard RHS at S=1, B=1024
    from odesat_tpu.ops.shard_stream import (
        compile_stream_sharded,
        make_single_device_runner,
    )

    formula = random_local_ksat(10240, 43700, k=3, locality=512, seed=9)
    _, norm = normalize_cnf_variables(formula)
    fa7, plan7 = compile_stream_sharded(norm, 1)
    runner7 = make_single_device_runner(fa7, 0.001, ode, 100)
    st7 = init_state(fa7, 1024, jax.random.PRNGKey(0), ode)
    rate7, _ = measure_throughput(
        runner7, st7, formula_device(fa7, matmul_dtype="bfloat16"), 100, 1024, iters=3
    )
    R7 = plan7.planes.shape[1]
    mxu, serial = stream_bounds(R7, plan7.mp_local, 1024)
    row("7 n=10240 shard RHS S=1", rate7, mxu, serial,
        "per-launch overhead + VPU (one RHS per launch)")


if __name__ == "__main__":
    main()
