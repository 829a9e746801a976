"""Multi-step fused Pallas kernel: a whole integration chunk in VMEM.

The XLA scan path (models/ode.py) round-trips the trajectory state and
the (B, K, M) intermediates through HBM on every step — measured at
~25% of v5e HBM bandwidth. This kernel instead grids over *trajectory
blocks* and runs ``chunk_steps`` whole Euler steps in a fori_loop with
everything resident in VMEM:

* state block (Bb, Np)+(Bb, Mp)x2 is read from HBM once per chunk and
  written back once — HBM traffic shrinks by ~chunk_steps x;
* the v-gather and dv-accumulation ride the MXU against the one-hot
  incidence G (K*Np, Mp) held in VMEM for the whole chunk;
* per-trajectory done latches (and dt, in the adaptive variant) are
  (Bb, 1) columns carried through the loop, preserving the freeze
  semantics of the scan path exactly: fixed mode updates on the
  detecting step then freezes (reference: src/system.rs:141-154);
  adaptive mode never advances a satisfied state (src/system.rs:122)
  and clips dt into [2^-7, 1e3] (src/system.rs:132-135).

Frozen trajectories take a dt=0 update, which is the identity up to the
clamps (state components are already inside their clamp ranges after the
first real update).

Applicability: formulas whose one-hot block fits VMEM (K*Np*Mp*4 bytes
up to ~8MB — covers aim100/uf250-class instances; bigger CNFs use the
XLA gather path) and no unit clauses (inf gradients, see ops/rhs.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from odesat_tpu.ops.kernelctx import pallas_call_32bit, wrap_chunk_runner

from odesat_tpu.cnf.arrays import FormulaArrays
from odesat_tpu.constants import (
    ALPHA,
    BETA,
    DELTA,
    DT_MAX,
    DT_MIN,
    EPSILON,
    GAMMA,
    XL_CAP_PER_CLAUSE,
)

_INF = float("inf")
_BIG = 1.0e9  # padding-slot clause value: loses every min, finite (inf*0 = NaN in the MXU)
_VMEM_G_LIMIT = 8 * 1024 * 1024
_JIT_CACHE = {}  # static shape signature -> jitted kernel (see make_fused_chunk)


def fused_supported(fa: FormulaArrays, itemsize: int = 4) -> bool:
    """itemsize: bytes per one-hot entry (4 for f32 matmuls, 2 for bf16 —
    bfloat16 doubles the formula-size envelope)."""
    K, Mp = fa.lit_var.shape
    return (
        fa.min_width >= 2
        and K * fa.n_vars_padded * Mp * itemsize <= _VMEM_G_LIMIT
    )


def make_fused_chunk(
    fa: FormulaArrays,
    zeta: float,
    ode,
    chunk_steps: int,
    traj_block: int = 512,
    interpret: bool | None = None,
    donate: bool = False,
    interleave: int = 1,
):
    """Build ``fn(state: ODEState, dev) -> ODEState`` advancing every
    trajectory ``chunk_steps`` steps in one kernel launch. ``dev`` is
    accepted for signature parity with the scan runner and ignored.

    The incidence arrays ride as jit *arguments* and the jitted kernel
    is cached on the formula's static shape signature — solving many
    same-shape instances (restart families, benchmark seed sets,
    production streams) compiles once instead of once per formula."""
    if getattr(ode, "dtype", "float32") == "float64":
        # the kernel carries f32 state and f32/bf16 MXU passes throughout;
        # silently downcasting a requested f64 run would betray the
        # reference-parity dtype (src/system.rs:6-11) — reject cleanly
        raise ValueError(
            "dtype='float64' is not supported by the fused Pallas kernel; "
            "use dv_strategy='gather'/'segment_sum' (the scan path) for f64"
        )
    itemsize = 2 if getattr(ode, "matmul_dtype", "float32") == "bfloat16" else 4
    if not fused_supported(fa, itemsize):
        raise ValueError(
            "fused pallas chunk unsupported for this formula "
            "(unit clauses or one-hot block exceeds VMEM); use the scan path"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    K, Mp = fa.lit_var.shape
    Np = fa.n_vars_padded
    # shrink the trajectory block until the per-block working set fits
    # the scoped-VMEM limit. Mosaic stack-allocates the in/out/pipeline
    # state copies plus every live (Bb, Mp)/(Bb, K*Mp) intermediate of
    # the step body (vals, contribs, m1/m2/A1/A2/a/b, update temps);
    # calibrated against a measured case — Np=256, Mp=1152, K=3 at
    # traj_block=1024 allocates 96.1MB ~= Bb*4*(2*Np + 7*K*Mp). A
    # high-density formula can fit the G envelope yet blow this budget.
    requested_block = traj_block
    while traj_block > 64:
        block_bytes = traj_block * 4 * (2 * Np + 7 * K * Mp)
        if block_bytes <= 56 * 1024 * 1024:
            break
        traj_block //= 2
    if traj_block != requested_block:
        from odesat_tpu.utils.logging import logger

        logger.info(
            "fused kernel: traj_block %d exceeds the VMEM budget for "
            "Np=%d Mp=%d K=%d; running at %d",
            requested_block, Np, Mp, K, traj_block,
        )
    paper = ode.rigidity == "paper"
    fixed = ode.step_size is not None
    dt_fixed = float(ode.step_size) if fixed else 0.0
    tol = float(ode.tolerance)
    zeta_c = float(zeta)
    xl_cap = XL_CAP_PER_CLAUSE * fa.n_clauses
    bf16 = getattr(ode, "matmul_dtype", "float32") == "bfloat16"
    mm_dtype = jnp.bfloat16 if bf16 else jnp.float32
    # f32 mode is the parity path: force true-f32 MXU passes (the TPU
    # default silently truncates f32 matmul inputs to bf16)
    mm_precision = None if bf16 else jax.lax.Precision.HIGHEST

    # sign-baked planes (same trick as ops/stream_pallas.py): plane k
    # holds -q_i at the literal's variable row, so valk = v @ G_k + bias
    # is the clause value directly (bias = 1, or 1 + BIG at padding) and
    # the same plane scatters dv via the identity r = q_i*value_i/2
    # (q_i^2 = 1, src/system.rs:73-77) with -1/2 folded into the hoisted
    # per-clause coefficients. The K planes are laid side by side as one
    # (Np, K*Mp) block so each RHS pass is ONE forward matmul and ONE
    # transposed scatter matmul — K small MXU ops per pass underfed the
    # systolic array (round-1 MFU ~38%; VERDICT item 3).
    G_np = np.zeros((Np, K * Mp), dtype=np.float32)
    bias_np = np.full((1, K * Mp), 1.0 + _BIG, dtype=np.float32)
    for k in range(K):
        cols = np.arange(Mp)
        on = fa.lit_mask[k] > 0
        G_np[fa.lit_var[k][on], k * Mp + cols[on]] = -fa.sign[k][on]
        bias_np[0, k * Mp + cols[on]] = 1.0
    G_host = jnp.asarray(G_np).astype(mm_dtype)
    bias_host = jnp.asarray(bias_np)
    cmask_host = jnp.asarray(fa.clause_mask.astype(np.float32).reshape(1, Mp))

    cache_key = (
        "fused", Np, Mp, K, fa.n_clauses, zeta_c, paper, fixed, dt_fixed,
        tol, bf16, chunk_steps, traj_block, interpret, donate, interleave,
    )
    jitted = _JIT_CACHE.get(cache_key)
    if jitted is not None:
        return wrap_chunk_runner(jitted, cache_key, G_host, bias_host, cmask_host)

    def kernel(v_ref, xs_ref, xl_ref, dt_ref, done_ref,
               g_ref, bias_ref, cmask_ref,
               v_out, xs_out, xl_out, dt_out, done_out):
        cmask = cmask_ref[:]  # (1, Mp)
        cmask_on = cmask > 0
        bias = bias_ref[:]  # (1, K*Mp)

        def forward(v):
            # one big forward pass: (Bb, Np) @ (Np, K*Mp)
            return (
                jnp.dot(
                    v.astype(mm_dtype),
                    g_ref[:],
                    preferred_element_type=jnp.float32,
                    precision=mm_precision,
                )
                + bias
            )

        def rhs_from_vals(vals_all, v, xs, xl):
            m1 = m2 = None
            for k in range(K):
                valk = vals_all[:, k * Mp : (k + 1) * Mp]
                if m1 is None:
                    m1 = valk
                    m2 = jnp.full(valk.shape, _INF, dtype=v.dtype)
                else:
                    m2 = jnp.minimum(m2, jnp.maximum(m1, valk))
                    m1 = jnp.minimum(m1, valk)

            c = 0.5 * m1
            # hoisted per-clause coefficients; the -1/2 cancels the
            # sign-baked planes' -q_i so the scatter lands as +q_i/2*(.)
            a = -0.5 * (xl * xs)
            b = -0.5 * ((1.0 + zeta_c * xl) * (1.0 - xs))
            # per-clause products hoisted out of the K loop: the original
            # contrib a*minx + b*valk*gate costs 6 VPU ops per literal
            # slot; with A1 = a*m1, A2 = a*m2 the paper-mode form
            # where(is_min, A2 + b*valk, A1) is 4 (f32-exact identical —
            # the untaken branch's + b*valk*0 was exact too)
            A1 = a * m1
            A2 = a * m2
            contribs = []
            for k in range(K):
                valk = vals_all[:, k * Mp : (k + 1) * Mp]
                is_min = valk <= m1
                if paper:
                    contribs.append(jnp.where(is_min, A2 + b * valk, A1))
                else:
                    gate = (valk == c).astype(v.dtype)
                    contribs.append(
                        jnp.where(is_min, A2, A1) + b * (valk * gate)
                    )
            # one big transposed scatter: (Bb, K*Mp) x (Np, K*Mp)^T
            dv = jax.lax.dot_general(
                jnp.concatenate(contribs, axis=1).astype(mm_dtype),
                g_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=v.dtype,
                precision=mm_precision,
            )
            dxs = BETA * (xs + EPSILON) * (c - GAMMA) * cmask
            dxl = ALPHA * (c - DELTA) * cmask
            allsat = jnp.all((c < GAMMA) | ~cmask_on, axis=1, keepdims=True)
            return dv, dxs, dxl, allsat

        def update(v, xs, xl, dv, dxs, dxl, dt_col):
            xs2 = jnp.fmin(jnp.fmax(xs + dt_col * dxs, EPSILON), 1.0 - EPSILON)
            xl2 = jnp.fmin(jnp.fmax(xl + dt_col * dxl, 1.0), xl_cap)
            v2 = jnp.fmin(jnp.fmax(v + dt_col * dv, -1.0), 1.0)
            return v2, xs2, xl2

        def rhs(v, xs, xl):
            return rhs_from_vals(forward(v), v, xs, xl)

        if fixed:

            def step_one(v, xs, xl, dt, done):
                dv, dxs, dxl, allsat = rhs(v, xs, xl)
                active = done < 0.5  # (rows, 1)
                dt_col = jnp.where(active, dt_fixed, 0.0)
                v, xs, xl = update(v, xs, xl, dv, dxs, dxl, dt_col)
                done = jnp.maximum(done, allsat.astype(done.dtype))
                return v, xs, xl, dt, done

        else:

            def step_one(v, xs, xl, dt, done):
                dv, dxs, dxl, allsat = rhs(v, xs, xl)
                advance = (done < 0.5) & ~allsat  # src/system.rs:122
                dt_col = jnp.where(advance, dt, 0.0)

                fv, fxs, fxl = update(v, xs, xl, dv, dxs, dxl, dt_col)
                hv, hxs, hxl = update(v, xs, xl, dv, dxs, dxl, 0.5 * dt_col)
                dv2, dxs2, dxl2, _ = rhs(hv, hxs, hxl)
                tv, txs, txl = update(hv, hxs, hxl, dv2, dxs2, dxl2, 0.5 * dt_col)

                err = jnp.maximum(
                    jnp.max(jnp.abs(fv - tv), axis=1, keepdims=True),
                    jnp.maximum(
                        jnp.max(jnp.abs(fxs - txs), axis=1, keepdims=True),
                        jnp.max(jnp.abs(fxl - txl), axis=1, keepdims=True),
                    ),
                )
                new_dt = jnp.clip(
                    dt * jnp.sqrt(tol / jnp.maximum(err, 1e-30)), DT_MIN, DT_MAX
                )
                v = jnp.where(advance, tv, v)
                xs = jnp.where(advance, txs, xs)
                xl = jnp.where(advance, txl, xl)
                dt = jnp.where(advance, new_dt, dt)
                done = jnp.maximum(done, allsat.astype(done.dtype))
                return v, xs, xl, dt, done

        # the trajectory block is processed as `interleave` independent
        # row tiles per step: each tile's (matmul -> VPU -> matmul -> VPU)
        # chain has no dependency on its siblings, so Mosaic's scheduler
        # can overlap tile A's MXU passes with tile B's vector work —
        # the kernel is otherwise VPU-bound with the MXU idling between
        # passes. Tiles live in the fori_loop carry, so no re-slicing or
        # concatenation happens per step.
        Bb = v_ref.shape[0]
        H = interleave if interleave > 0 and Bb % interleave == 0 else 1
        Bh = Bb // H
        rows_h = lambda h: pl.ds(h * Bh, Bh)  # noqa: E731

        if fixed and H > 1:
            # stage-interleaved: emit every tile's forward matmul first,
            # then the per-tile vector work + scatter, then the updates —
            # adjacent independent MXU/VPU work gives the scheduler
            # overlap windows that tile-sequential emission denies it
            def body(_, carry):
                vals = [forward(sub[0]) for sub in carry]
                rhss = [
                    rhs_from_vals(va, sub[0], sub[1], sub[2])
                    for sub, va in zip(carry, vals)
                ]
                outs = []
                for (v, xs, xl, dt, done), (dv, dxs, dxl, allsat) in zip(carry, rhss):
                    active = done < 0.5
                    dt_col = jnp.where(active, dt_fixed, 0.0)
                    v, xs, xl = update(v, xs, xl, dv, dxs, dxl, dt_col)
                    done = jnp.maximum(done, allsat.astype(done.dtype))
                    outs.append((v, xs, xl, dt, done))
                return tuple(outs)

        else:

            def body(_, carry):
                return tuple(step_one(*sub) for sub in carry)

        carry = tuple(
            (
                v_ref[rows_h(h)],
                xs_ref[rows_h(h)],
                xl_ref[rows_h(h)],
                dt_ref[rows_h(h)],
                done_ref[rows_h(h)],
            )
            for h in range(H)
        )
        out = jax.lax.fori_loop(0, chunk_steps, body, carry)
        for h in range(H):
            v, xs, xl, dt, done = out[h]
            v_out[rows_h(h)] = v
            xs_out[rows_h(h)] = xs
            xl_out[rows_h(h)] = xl
            dt_out[rows_h(h)] = dt
            done_out[rows_h(h)] = done

    def raw(state, G, bias, cmask):
        B_in = state.v.shape[0]
        # pad odd batches up to a multiple of the trajectory block with
        # frozen dummy rows — falling back to tiny blocks instead costs
        # ~25x (measured: uf250 at B=7049 ran 8-row blocks at 1.2e6
        # traj*steps/s vs 3.1e7 padded)
        Bb = traj_block
        while Bb > 8 and Bb > B_in:
            Bb //= 2
        pad = (-B_in) % Bb
        if pad:
            pad_row = lambda x, fill: jnp.concatenate(  # noqa: E731
                [x, jnp.full((pad,) + x.shape[1:], fill, dtype=x.dtype)], axis=0
            )
            state = type(state)(
                v=pad_row(state.v, 0.0),
                xs=pad_row(state.xs, 0.5),
                xl=pad_row(state.xl, 1.0),
                dt=pad_row(state.dt, 0.0),
                done=pad_row(state.done, True),
            )
        B = B_in + pad
        grid = (B // Bb,)
        dt_col = state.dt.astype(jnp.float32).reshape(B, 1)
        done_col = state.done.astype(jnp.float32).reshape(B, 1)

        row = lambda i: (i, 0)  # noqa: E731
        fixed_blk = lambda shape: pl.BlockSpec(shape, row, memory_space=pltpu.VMEM)  # noqa: E731
        const_blk = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )

        v, xs, xl, dt_o, done_o = pallas_call_32bit(
            kernel,
            grid=grid,
            in_specs=[
                fixed_blk((Bb, Np)),
                fixed_blk((Bb, Mp)),
                fixed_blk((Bb, Mp)),
                fixed_blk((Bb, 1)),
                fixed_blk((Bb, 1)),
                const_blk((Np, K * Mp)),
                const_blk((1, K * Mp)),
                const_blk((1, Mp)),
            ],
            out_specs=[
                fixed_blk((Bb, Np)),
                fixed_blk((Bb, Mp)),
                fixed_blk((Bb, Mp)),
                fixed_blk((Bb, 1)),
                fixed_blk((Bb, 1)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, Np), jnp.float32),
                jax.ShapeDtypeStruct((B, Mp), jnp.float32),
                jax.ShapeDtypeStruct((B, Mp), jnp.float32),
                jax.ShapeDtypeStruct((B, 1), jnp.float32),
                jax.ShapeDtypeStruct((B, 1), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                # Mosaic's 16MB scoped default; larger trajectory blocks
                # (bigger MXU tiles, +13% on the aim100 headline at 512)
                # need headroom for the in/out/pipeline state copies
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * K * B * Np * Mp * chunk_steps * (1 if fixed else 2),
                bytes_accessed=(B * (Np + 2 * Mp) * 4) * 2,
                transcendentals=0,
            ),
        )(state.v, state.xs, state.xl, dt_col, done_col, G, bias, cmask)

        from odesat_tpu.models.ode import ODEState

        return ODEState(
            v=v[:B_in],
            xs=xs[:B_in],
            xl=xl[:B_in],
            dt=dt_o.reshape(B)[:B_in].astype(state.dt.dtype),
            done=done_o.reshape(B)[:B_in] > 0.5,
        )

    jitted = jax.jit(raw, donate_argnums=0 if donate else ())
    _JIT_CACHE[cache_key] = jitted
    return wrap_chunk_runner(jitted, cache_key, G_host, bias_host, cmask_host)
