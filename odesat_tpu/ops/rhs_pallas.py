"""Fused Pallas TPU kernel for the memcomputing RHS.

One kernel evaluates the full right-hand side (reference semantics:
src/system.rs:25-91) for a block of trajectories x a block of clauses,
keeping every intermediate in VMEM:

* the v-gather and the per-variable dv accumulation both ride the MXU as
  matmuls against the constant one-hot incidence matrix G (N, K*M) — a
  gather-free formulation (TPU vector units have no efficient per-element
  gather, and scatters serialize);
* the top-2 min over the K literal slots is an unrolled running
  (min, second-min) recurrence over K (Bb, Mb) tiles, matching the
  reference's scan semantics including duplicated minima;
* dv accumulates across clause-block grid steps into a revisited output
  block (grid iterates clause blocks fastest), so the (B, N) accumulator
  never leaves VMEM;
* the clause satisfaction degree c is emitted so the allsat flag is
  computed exactly like the jnp path (c < GAMMA).

Constraints: formulas with unit clauses are rejected (their infinite
gradients — see ops/rhs.py — would turn inf*0 into NaN inside the
matmul; the caller falls back to the gather path), and N is limited by
the VMEM footprint of the G block (~N*K*Mb*4 bytes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from odesat_tpu.ops.kernelctx import pallas_call_32bit

from odesat_tpu.cnf.arrays import FormulaArrays
from odesat_tpu.constants import ALPHA, BETA, DELTA, EPSILON, GAMMA

_INF = float("inf")


def _build_onehot_stacked(fa: FormulaArrays, dtype) -> np.ndarray:
    """G: (K*Np, Mp) with G[k*Np + n, m] = 1 iff clause m's k-th literal
    is variable n (0 for padding slots)."""
    K, Mp = fa.lit_var.shape
    Np = fa.n_vars_padded
    G = np.zeros((K * Np, Mp), dtype=dtype)
    for k in range(K):
        cols = np.arange(Mp)
        rows = k * Np + fa.lit_var[k]
        on = fa.lit_mask[k] > 0
        G[rows[on], cols[on]] = 1.0
    return G


def _pick_block(total: int, preferred: int) -> int:
    for candidate in (preferred, 256, 128, 8, 1):
        if candidate <= total and total % candidate == 0:
            return candidate
    return total


def make_pallas_rhs(
    fa: FormulaArrays,
    zeta: float,
    rigidity: str = "paper",
    dtype=jnp.float32,
    traj_block: int = 128,
    clause_block: int = 512,
    interpret: bool | None = None,
):
    """Build ``fn(v, xs, xl) -> (dv, dxs, dxl, allsat)`` for batched
    inputs v: (B, Np), xs/xl: (B, Mp). B must be divisible by a supported
    trajectory block size."""
    if fa.min_width < 2:
        raise ValueError(
            "pallas RHS cannot represent unit-clause infinite gradients; "
            "use dv_strategy='gather'"
        )
    if rigidity not in ("paper", "reference"):
        raise ValueError(f"unknown rigidity mode: {rigidity!r}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    K, Mp = fa.lit_var.shape
    Np = fa.n_vars_padded
    Mb = _pick_block(Mp, clause_block)
    np_dtype = np.float64 if dtype == jnp.float64 else np.float32

    G_host = _build_onehot_stacked(fa, np_dtype)
    sign_host = fa.sign.astype(np_dtype)
    mask_host = fa.lit_mask.astype(np_dtype)
    cmask_host = fa.clause_mask.astype(np_dtype).reshape(1, Mp)

    # VMEM budget check for the G block (+ ~8 (Bb, Mb) live tiles)
    g_block_bytes = K * Np * Mb * np.dtype(np_dtype).itemsize
    if g_block_bytes > 8 * 1024 * 1024:
        raise ValueError(
            f"one-hot block too large for VMEM ({g_block_bytes} bytes); "
            "use dv_strategy='gather' for this formula size"
        )

    zeta_c = float(zeta)
    paper = rigidity == "paper"

    def kernel(v_ref, xs_ref, xl_ref, g_ref, sign_ref, mask_ref, cmask_ref,
               dv_ref, dxs_ref, dxl_ref, c_ref):
        j = pl.program_id(1)
        v = v_ref[:]  # (Bb, Np)
        xs = xs_ref[:]  # (Bb, Mb)
        xl = xl_ref[:]
        cmask = cmask_ref[:]  # (1, Mb)

        vals = []
        gathered = []
        masks = []
        signs = []
        m1 = jnp.full(xs.shape, _INF, dtype=v.dtype)
        m2 = jnp.full(xs.shape, _INF, dtype=v.dtype)
        for k in range(K):
            gk = jnp.dot(
                v,
                g_ref[k * Np : (k + 1) * Np, :],
                preferred_element_type=v.dtype,
                precision=jax.lax.Precision.HIGHEST,  # true f32 (TPU default truncates to bf16)
            )  # (Bb, Mb) gathered variable values
            sk = sign_ref[k : k + 1, :]  # (1, Mb)
            mk = mask_ref[k : k + 1, :] > 0
            valk = jnp.where(mk, 1.0 - sk * gk, _INF)
            # running top-2 min (reference scan semantics, src/system.rs:50-55)
            m2 = jnp.minimum(m2, jnp.maximum(m1, valk))
            m1 = jnp.minimum(m1, valk)
            vals.append(valk)
            gathered.append(gk)
            masks.append(mk)
            signs.append(sk)

        c = jnp.where(cmask > 0, 0.5 * m1, 0.0)

        dv_acc = jnp.zeros((v.shape[0], Np), dtype=v.dtype)
        for k in range(K):
            is_min = vals[k] <= m1
            g = jnp.where(masks[k], 0.5 * signs[k] * jnp.where(is_min, m2, m1), 0.0)
            gate = is_min if paper else vals[k] == (0.5 * m1)
            r = jnp.where(gate & masks[k], 0.5 * (signs[k] - gathered[k]), 0.0)
            contrib = jnp.where(
                masks[k], xl * xs * g + (1.0 + zeta_c * xl) * (1.0 - xs) * r, 0.0
            )
            dv_acc = dv_acc + jax.lax.dot_general(
                contrib,
                g_ref[k * Np : (k + 1) * Np, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=v.dtype,
                precision=jax.lax.Precision.HIGHEST,
            )

        @pl.when(j == 0)
        def _():
            dv_ref[:] = dv_acc

        @pl.when(j > 0)
        def _():
            dv_ref[:] = dv_ref[:] + dv_acc

        dxs_ref[:] = BETA * (xs + EPSILON) * (c - GAMMA) * cmask
        dxl_ref[:] = ALPHA * (c - DELTA) * cmask
        c_ref[:] = c

    def fn(v, xs, xl):
        B = v.shape[0]
        Bb = _pick_block(B, traj_block)
        grid = (B // Bb, Mp // Mb)
        dv, dxs, dxl, c = pallas_call_32bit(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((Bb, Np), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Bb, Mb), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((Bb, Mb), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((K * Np, Mb), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, Mb), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, Mb), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Mb), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((Bb, Np), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Bb, Mb), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((Bb, Mb), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((Bb, Mb), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, Np), v.dtype),
                jax.ShapeDtypeStruct((B, Mp), v.dtype),
                jax.ShapeDtypeStruct((B, Mp), v.dtype),
                jax.ShapeDtypeStruct((B, Mp), v.dtype),
            ],
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=4 * K * B * Np * Mp,
                bytes_accessed=(B * (Np + 3 * Mp) * 4) * 2,
                transcendentals=0,
            ),
        )(
            v,
            xs,
            xl,
            jnp.asarray(G_host),
            jnp.asarray(sign_host),
            jnp.asarray(mask_host),
            jnp.asarray(cmask_host),
        )
        allsat = jnp.all((c < GAMMA) | (jnp.asarray(cmask_host) <= 0), axis=-1)
        return dv, dxs, dxl, allsat

    return fn
