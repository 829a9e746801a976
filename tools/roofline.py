"""Per-config roofline accounting (round-2 VERDICT item 5).

For every throughput config in the benchmark suite this computes, from
the kernel's OWN layout (the compiled plane shapes, not idealized
formula sizes):

* the pure-MXU bound: 4 flops per plane cell per RHS evaluation at the
  v5e bf16 peak (197 Tflop/s);
* the VPU share: ~40 f32 elementwise ops per clause slot per RHS for
  the ODE kernels (the round-2 op-count analysis, A1/A2 + taken-branch
  hoisted form; was 45 before the round-3 per-clause hoist) at the
  measured ~3.9 Tops/s v5e VPU rate;
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
ODE_VPU_OPS_PER_SLOT = 40  # A1/A2 + taken-branch hoisted per-slot op count


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
        "VPU (Np=128: 40 ops/slot vs 512 flops/slot)")

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
