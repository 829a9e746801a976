"""Fused multi-step Pallas kernel for the stochastic discrete engine.

Runs a whole chunk of clause-weighted local-search steps
(reference semantics: src/stoch.rs:26-78) with state resident in VMEM:

* clause evaluation and the per-variable weight sums both ride the MXU
  against the one-hot incidence G — the boolean assignment is stored as
  0/1 float so ``v @ G_k`` *is* the per-literal variable value, and
  ``(xl * unsat) @ G_k^T`` accumulates the per-variable weight totals;
* flips draw from a stateless counter-based hash PRNG (murmur3-style
  finalizer over (seed, step, row, col)) — identical streams in
  interpreter and compiled mode, reproducible per seed; the flip rule
  ``u * total < unsat`` is identical in distribution to the reference's
  integer draw in [1, total];
* per-trajectory done latches freeze solved chains exactly like the
  scan path (flips are provably no-ops once every clause is satisfied —
  unsat weights are all zero — matching src/stoch.rs:67-77).

Same applicability envelope as the ODE fused kernel (one-hot block must
fit VMEM); the jnp scan path in models/stoch.py covers everything else.
Note the PRNG stream differs from the scan path's jax.random stream —
runs are reproducible per seed within one path, not across paths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from odesat_tpu.cnf.arrays import FormulaArrays
from odesat_tpu.constants import STOCH_ALPHA
from odesat_tpu.ops.rhs_pallas import _build_onehot_stacked, _pick_block

XL_CAP = float(2**24)


def stoch_fused_supported(fa: FormulaArrays) -> bool:
    K, Mp = fa.lit_var.shape
    return K * fa.n_vars_padded * Mp * 4 <= 8 * 1024 * 1024


def make_fused_stoch_chunk(
    fa: FormulaArrays,
    chunk_steps: int,
    traj_block: int = 128,
    interpret: bool | None = None,
):
    """Build ``fn(state: StochState) -> StochState`` advancing every chain
    ``chunk_steps`` steps in one kernel launch."""
    if not stoch_fused_supported(fa):
        raise ValueError("stoch fused kernel: one-hot block exceeds VMEM")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    K, Mp = fa.lit_var.shape
    Np = fa.n_vars_padded

    G_host = jnp.asarray(_build_onehot_stacked(fa, np.float32))
    pos_host = jnp.asarray((fa.sign > 0).astype(np.float32))  # (K, Mp)
    mask_host = jnp.asarray((fa.lit_mask > 0).astype(np.float32))
    cmask_host = jnp.asarray(fa.clause_mask.astype(np.float32).reshape(1, Mp))
    has_occ_host = jnp.asarray(
        (fa.occ_mask.sum(axis=-1) > 0).astype(np.float32).reshape(1, Np)
    )

    def kernel(seed_ref, v_ref, xl_ref, done_ref,
               g_ref, pos_ref, mask_ref, cmask_ref, hasocc_ref,
               v_out, xl_out, done_out):
        i = pl.program_id(0)
        block_seed = (seed_ref[0] + i * 0x632BE59B).astype(jnp.uint32)

        cmask = cmask_ref[:]  # (1, Mp)
        has_occ = hasocc_ref[:] > 0  # (1, Np)
        poss = [pos_ref[k : k + 1, :] for k in range(K)]
        masks = [mask_ref[k : k + 1, :] for k in range(K)]

        def uniform01(step, shape):
            """Counter-based uniforms in [0,1): murmur3 finalizer over
            (block seed, step counter, row, col)."""
            r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
            c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
            x = (
                r * jnp.uint32(0x9E3779B1)
                ^ c * jnp.uint32(0x85EBCA77)
                ^ (block_seed + step.astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D))
            )
            x = x ^ (x >> 16)
            x = x * jnp.uint32(0x7FEB352D)
            x = x ^ (x >> 15)
            x = x * jnp.uint32(0x846CA68B)
            x = x ^ (x >> 16)
            # uint32 -> f32 is unsupported in Mosaic; the top-24-bit value
            # fits int32 exactly, so bitcast then convert
            x24 = jax.lax.bitcast_convert_type(x >> 8, jnp.int32)
            return x24.astype(jnp.float32) * (1.0 / 16777216.0)

        def body(t, carry):
            v, xl, done = carry  # v: (Bb, Np) 0/1 float; xl: (Bb, Mp); done: (Bb, 1)
            # clause satisfaction: literal true iff gathered value matches
            # polarity (reference: src/stoch.rs:20-25)
            sat = jnp.zeros(xl.shape, dtype=jnp.float32)
            gathered = []
            for k in range(K):
                gk = jnp.dot(
                    v, g_ref[k * Np : (k + 1) * Np, :], preferred_element_type=jnp.float32
                )
                gathered.append(gk)
                lit_true = jnp.where(poss[k] > 0, gk, 1.0 - gk) * masks[k]
                sat = jnp.maximum(sat, lit_true)
            sat = jnp.minimum(sat, 1.0)  # 0/1

            # weight update (post-update weights feed the flips,
            # src/stoch.rs:47-51)
            xl_new = jnp.where(
                sat > 0,
                jnp.maximum(xl - 1.0, 1.0),
                jnp.minimum(xl + float(STOCH_ALPHA), XL_CAP),
            ) * cmask

            # per-variable totals via MXU: total_i = sum_{clauses with i} xl
            total = jnp.zeros((v.shape[0], Np), dtype=jnp.float32)
            unsat_w = jnp.zeros((v.shape[0], Np), dtype=jnp.float32)
            for k in range(K):
                wk = xl_new * masks[k]
                total = total + jax.lax.dot_general(
                    wk, g_ref[k * Np : (k + 1) * Np, :],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                unsat_w = unsat_w + jax.lax.dot_general(
                    wk * (1.0 - sat), g_ref[k * Np : (k + 1) * Np, :],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            u = uniform01(t, total.shape)
            flip = (u * total < unsat_w) & has_occ

            active = done < 0.5
            all_sat = jnp.min(jnp.where(cmask > 0, sat, 1.0), axis=1, keepdims=True)
            v = jnp.where(active & flip, 1.0 - v, v)
            xl = jnp.where(active, xl_new, xl)
            done = jnp.maximum(done, all_sat)
            return v, xl, done

        v, xl, done = jax.lax.fori_loop(
            0, chunk_steps, body, (v_ref[:], xl_ref[:], done_ref[:])
        )
        v_out[:] = v
        xl_out[:] = xl
        done_out[:] = done

    def fn(state):
        from odesat_tpu.models.stoch import StochState

        B_in = state.v.shape[0]
        pad = (-B_in) % 8
        v = state.v.astype(jnp.float32)
        xl = state.xl.astype(jnp.float32)
        done = state.done.astype(jnp.float32).reshape(B_in, 1)
        if pad:
            v = jnp.concatenate([v, jnp.zeros((pad, Np), jnp.float32)], axis=0)
            xl = jnp.concatenate([xl, jnp.ones((pad, Mp), jnp.float32)], axis=0)
            done = jnp.concatenate([done, jnp.ones((pad, 1), jnp.float32)], axis=0)
        B = B_in + pad
        Bb = _pick_block(B, traj_block)

        key, sub = jax.random.split(state.key)
        seed = jax.random.randint(sub, (1,), 0, 2**31 - 1, dtype=jnp.int32).astype(
            jnp.uint32
        )

        row = lambda i: (i, 0)  # noqa: E731
        blk = lambda shape: pl.BlockSpec(shape, row, memory_space=pltpu.VMEM)  # noqa: E731
        const = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )

        v_o, xl_o, done_o = pl.pallas_call(
            kernel,
            grid=(B // Bb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
                blk((Bb, Np)),
                blk((Bb, Mp)),
                blk((Bb, 1)),
                const((K * Np, Mp)),
                const((K, Mp)),
                const((K, Mp)),
                const((1, Mp)),
                const((1, Np)),
            ],
            out_specs=[blk((Bb, Np)), blk((Bb, Mp)), blk((Bb, 1))],
            out_shape=[
                jax.ShapeDtypeStruct((B, Np), jnp.float32),
                jax.ShapeDtypeStruct((B, Mp), jnp.float32),
                jax.ShapeDtypeStruct((B, 1), jnp.float32),
            ],
            interpret=interpret,
        )(seed, v, xl, done, G_host, pos_host, mask_host, cmask_host, has_occ_host)

        return StochState(
            v=v_o[:B_in] > 0.5,
            xl=xl_o[:B_in].astype(state.xl.dtype),
            done=done_o.reshape(B)[:B_in] > 0.5,
            key=key,
        )

    return fn
