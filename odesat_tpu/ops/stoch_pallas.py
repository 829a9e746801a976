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
from odesat_tpu.ops.kernelctx import pallas_call_32bit, wrap_chunk_runner

from odesat_tpu.cnf.arrays import FormulaArrays
from odesat_tpu.constants import STOCH_ALPHA


XL_CAP = float(2**24)
_JIT_CACHE = {}  # static shape signature -> jitted kernel


def _make_uniform01(block_seed):
    """Counter-based uniforms in [0,1): murmur3 finalizer over (block
    seed, step counter, row, col). Shared by all three stoch kernels —
    the stream depends only on those counters, so clause shards seeded
    identically draw identical flips with zero communication.

    uint32 -> f32 is unsupported in Mosaic; the top-24-bit value fits
    int32 exactly, so bitcast then convert."""

    def uniform01(step, shape):
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
        x24 = jax.lax.bitcast_convert_type(x >> 8, jnp.int32)
        return x24.astype(jnp.float32) * (1.0 / 16777216.0)

    return uniform01


def stoch_fused_supported(fa: FormulaArrays) -> bool:
    K, Mp = fa.lit_var.shape
    return K * fa.n_vars_padded * Mp * 4 <= 8 * 1024 * 1024


def make_fused_stoch_chunk(
    fa: FormulaArrays,
    chunk_steps: int,
    traj_block: int = 512,
    interpret: bool | None = None,
    donate: bool = False,
    matmul_dtype: str = "float32",
):
    """Build ``fn(state: StochState) -> StochState`` advancing every chain
    ``chunk_steps`` steps in one kernel launch. Incidence arrays ride as
    jit arguments; the jitted kernel is cached on the static shape
    signature (compile once per instance family).

    ``matmul_dtype="bfloat16"``: clause evaluation stays exact (0/1
    assignment x +-1 planes), only the weight sums round to ~8-bit
    relative — flip probabilities shift slightly, solutions remain
    oracle-verified."""
    if not stoch_fused_supported(fa):
        raise ValueError("stoch fused kernel: one-hot block exceeds VMEM")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bf16 = matmul_dtype == "bfloat16"
    mm_dtype = jnp.bfloat16 if bf16 else jnp.float32
    mm_precision = None if bf16 else jax.lax.Precision.HIGHEST

    K, Mp = fa.lit_var.shape
    Np = fa.n_vars_padded

    # polarity-baked planes (see _build_stoch_planes): lit_true =
    # v @ G_k + bias_k exactly (positive literal -> +v, negated -> 1-v,
    # padding -> 0); the per-slot sign array corrects the weight scatter
    # through the same signed planes (q^2 = 1). The K planes sit side by
    # side as one (Np, K*Mp) block so each step runs ONE forward matmul
    # and TWO weight-scatter matmuls instead of 3K small MXU ops (same
    # rewrite as ops/fused_pallas.py).
    G_np = np.zeros((Np, K * Mp), dtype=np.float32)
    bias_np = np.zeros((1, K * Mp), dtype=np.float32)
    for k in range(K):
        cols = np.arange(Mp)
        on = fa.lit_mask[k] > 0
        G_np[fa.lit_var[k][on], k * Mp + cols[on]] = fa.sign[k][on]
        bias_np[0, k * Mp + cols] = np.where(on & (fa.sign[k] < 0), 1.0, 0.0)
    G_host = jnp.asarray(G_np).astype(mm_dtype)
    bias_host = jnp.asarray(bias_np)
    sign_host = jnp.asarray(fa.sign.astype(np.float32))  # 0 at padding slots
    cmask_host = jnp.asarray(fa.clause_mask.astype(np.float32).reshape(1, Mp))
    has_occ_host = jnp.asarray(
        (fa.occ_mask.sum(axis=-1) > 0).astype(np.float32).reshape(1, Np)
    )

    cache_key = (
        "stoch_fused", Np, Mp, K, chunk_steps, traj_block, interpret, donate, bf16
    )
    jitted = _JIT_CACHE.get(cache_key)
    if jitted is not None:
        return wrap_chunk_runner(
            jitted, cache_key, G_host, bias_host, sign_host, cmask_host, has_occ_host
        )

    def kernel(seed_ref, v_ref, xl_ref, done_ref,
               g_ref, bias_ref, sign_ref, cmask_ref, hasocc_ref,
               v_out, xl_out, done_out):
        i = pl.program_id(0)
        block_seed = (seed_ref[0] + i * 0x632BE59B).astype(jnp.uint32)

        cmask = cmask_ref[:]  # (1, Mp)
        has_occ = hasocc_ref[:] > 0  # (1, Np)
        bias = bias_ref[:]  # (1, K*Mp)
        signs = [sign_ref[k : k + 1, :] for k in range(K)]

        uniform01 = _make_uniform01(block_seed)

        def body(t, carry):
            v, xl, done = carry  # v: (Bb, Np) 0/1 float; xl: (Bb, Mp); done: (Bb, 1)
            # clause satisfaction: literal true iff gathered value matches
            # polarity (reference: src/stoch.rs:20-25); one forward pass
            # over the concatenated planes
            v16 = v.astype(mm_dtype)
            lit_true_all = (
                jnp.dot(
                    v16,
                    g_ref[:],
                    preferred_element_type=jnp.float32,
                    precision=mm_precision,
                )
                + bias
            )
            sat = lit_true_all[:, 0:Mp]
            for k in range(1, K):
                sat = jnp.maximum(sat, lit_true_all[:, k * Mp : (k + 1) * Mp])

            # weight update (post-update weights feed the flips,
            # src/stoch.rs:47-51)
            xl_new = jnp.where(
                sat > 0,
                jnp.maximum(xl - 1.0, 1.0),
                jnp.minimum(xl + float(STOCH_ALPHA), XL_CAP),
            ) * cmask

            # per-variable totals via MXU: total_i = sum_{clauses with i} xl;
            # one transposed pass each for total and unsat weights
            unsat_f = 1.0 - sat
            xu = xl_new * unsat_f  # sign mults are exact (+-1/0), so
            # (xl*unsat)*sign == (xl*sign)*unsat bit-for-bit
            w_all = jnp.concatenate(
                [xl_new * signs[k] for k in range(K)], axis=1
            )  # sign-corrected; 0 at padding
            u_all = jnp.concatenate([xu * signs[k] for k in range(K)], axis=1)
            total = jax.lax.dot_general(
                w_all.astype(mm_dtype), g_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mm_precision,
            )
            unsat_w = jax.lax.dot_general(
                u_all.astype(mm_dtype), g_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mm_precision,
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

    def raw(state, G, bias, sign, cmask, has_occ):
        from odesat_tpu.models.stoch import StochState

        B_in = state.v.shape[0]
        Bb = traj_block
        while Bb > 8 and Bb > B_in:
            Bb //= 2
        pad = (-B_in) % Bb
        v = state.v.astype(jnp.float32)
        xl = state.xl.astype(jnp.float32)
        done = state.done.astype(jnp.float32).reshape(B_in, 1)
        if pad:
            v = jnp.concatenate([v, jnp.zeros((pad, Np), jnp.float32)], axis=0)
            xl = jnp.concatenate([xl, jnp.ones((pad, Mp), jnp.float32)], axis=0)
            done = jnp.concatenate([done, jnp.ones((pad, 1), jnp.float32)], axis=0)
        B = B_in + pad

        key, sub = jax.random.split(state.key)
        seed = jax.random.randint(sub, (1,), 0, 2**31 - 1, dtype=jnp.int32).astype(
            jnp.uint32
        )

        row = lambda i: (i, 0)  # noqa: E731
        blk = lambda shape: pl.BlockSpec(shape, row, memory_space=pltpu.VMEM)  # noqa: E731
        const = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )

        v_o, xl_o, done_o = pallas_call_32bit(
            kernel,
            grid=(B // Bb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
                blk((Bb, Np)),
                blk((Bb, Mp)),
                blk((Bb, 1)),
                const((Np, K * Mp)),
                const((1, K * Mp)),
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
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,  # room for 512-row blocks
            ),
        )(seed, v, xl, done, G, bias, sign, cmask, has_occ)

        return StochState(
            v=v_o[:B_in] > 0.5,
            xl=xl_o[:B_in].astype(state.xl.dtype),
            done=done_o.reshape(B)[:B_in] > 0.5,
            key=key,
        )

    jitted = jax.jit(raw, donate_argnums=0 if donate else ())
    _JIT_CACHE[cache_key] = jitted
    return wrap_chunk_runner(
        jitted, cache_key, G_host, bias_host, sign_host, cmask_host, has_occ_host
    )


# ---------------------------------------------------------------------------
# HBM-streaming variant for formulas beyond the resident VMEM envelope
# ---------------------------------------------------------------------------

from odesat_tpu.ops.stream_pallas import (  # noqa: E402
    SPAN,
    _GBUF_LIMIT,
    _G_HBM_LIMIT,
    _max_kb,
    _span_aligned,
    _span_budgets,
)


def _build_stoch_planes(fa: FormulaArrays, np_dtype):
    """Polarity-baked planes restricted to each span's 128-aligned
    variable window (same layout as the ODE streaming kernel): one MXU
    pass over the window of the 0/1 assignment plus a VPU bias add
    yields the per-literal truth value (positive literal -> +v, negated
    -> 1 - v via bias 1, padding -> 0; reference clause walk:
    src/stoch.rs:20-25). The same plane scatters per-variable weight
    sums after a per-slot sign correction (the baked q_i squares away:
    q_i * (q_i * w) = w). Returns (G_flat, span_meta, bias) with
    span_meta = [(row_offset, K_b, W, lo, clause_col_offset), ...]."""
    spans = []
    rows = []
    K, Mp = fa.lit_var.shape
    bias = np.zeros((K, Mp), dtype=np.float32)
    row_off = 0
    for m0, m1, Kb in fa.bucket_slices:
        for c0 in range(m0, m1, SPAN):
            cols = np.arange(c0, c0 + SPAN)
            on_any = fa.lit_mask[:Kb, cols] > 0
            if on_any.any():
                vs = fa.lit_var[:Kb, cols][on_any]
                lo = (int(vs.min()) // SPAN) * SPAN
                hi = -((-(int(vs.max()) + 1)) // SPAN) * SPAN
            else:
                lo, hi = 0, SPAN
            W = hi - lo
            spans.append((row_off, Kb, W, lo, c0))
            for k in range(Kb):
                plane = np.zeros((W, SPAN), dtype=np_dtype)
                on = fa.lit_mask[k, cols] > 0
                plane[fa.lit_var[k, cols[on]] - lo, np.where(on)[0]] = fa.sign[
                    k, cols[on]
                ]
                bias[k, cols] = np.where(on & (fa.sign[k, cols] < 0), 1.0, 0.0)
                rows.append(plane)
            row_off += Kb * W
    if not rows:
        rows = [np.zeros((SPAN, SPAN), dtype=np_dtype)]
        spans = [(0, 1, SPAN, 0, 0)]
    return np.concatenate(rows, axis=0), spans, bias


def stoch_stream_supported(fa: FormulaArrays, itemsize: int = 4) -> bool:
    if not _span_aligned(fa):
        return False
    max_rows, total_rows = _span_budgets(fa)
    gbuf = 2 * max_rows * SPAN * itemsize
    return gbuf <= _GBUF_LIMIT and total_rows * SPAN * itemsize <= _G_HBM_LIMIT


def make_stream_stoch_chunk(
    fa: FormulaArrays,
    chunk_steps: int,
    traj_block: int = 512,
    matmul_dtype: str = "float32",
    interpret: bool | None = None,
    donate: bool = False,
):
    """Build ``fn(state: StochState) -> StochState`` advancing every chain
    ``chunk_steps`` steps with the clause weights xl and the incidence
    planes streamed from HBM (v/done stay VMEM-resident). Same step
    semantics as the resident kernel. ``matmul_dtype="bfloat16"`` keeps
    clause evaluation exact (0/1 values, +-1 planes) but rounds the
    weight sums to ~8 bits relative — flip probabilities shift slightly,
    solutions remain oracle-verified."""
    bf16 = matmul_dtype == "bfloat16"
    itemsize = 2 if bf16 else 4
    if not stoch_stream_supported(fa, itemsize):
        raise ValueError("stoch streaming kernel: plane buffers exceed budget")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    K, Mp = fa.lit_var.shape
    Np = fa.n_vars_padded
    Kmax = _max_kb(fa)
    mm_dtype = jnp.bfloat16 if bf16 else jnp.float32
    mm_precision = None if bf16 else jax.lax.Precision.HIGHEST

    G_np, span_meta, bias_np = _build_stoch_planes(fa, np.float32)
    G_host = jnp.asarray(G_np).astype(mm_dtype)
    bias_host = jnp.asarray(bias_np)
    max_group_rows = max(kb * w for _, kb, w, _, _ in span_meta)
    sign_host = jnp.asarray(fa.sign.astype(np.float32))  # 0 at padding slots
    cmask_host = jnp.asarray(fa.clause_mask.astype(np.float32).reshape(1, Mp))
    has_occ_host = jnp.asarray(
        (fa.occ_mask.sum(axis=-1) > 0).astype(np.float32).reshape(1, Np)
    )
    S = len(span_meta)

    cache_key = (
        "stoch_stream", Np, Mp, K, Kmax, tuple(span_meta), chunk_steps,
        traj_block, bf16, interpret, donate,
    )
    jitted = _JIT_CACHE.get(cache_key)
    if jitted is not None:
        return wrap_chunk_runner(
            jitted, cache_key, G_host, bias_host, sign_host, cmask_host, has_occ_host
        )

    def kernel(seed_ref, v_ref, xl_ref, done_ref,
               g_ref, bias_ref, sign_ref, cmask_ref, hasocc_ref,
               v_o, xl_o, done_o,
               gbuf, iobuf, v16_ref, total_ref, unsat_ref, sat_ref,
               gsem, rsem, wsem, csem):
        i = pl.program_id(0)
        Bb = v_ref.shape[0]
        rows = pl.ds(i * Bb, Bb)
        block_seed = (seed_ref[0] + i * 0x632BE59B).astype(jnp.uint32)

        init_xl = pltpu.make_async_copy(xl_ref.at[rows], xl_o.at[rows], csem.at[0])
        init_xl.start()
        init_xl.wait()

        def g_dma(s, slot):
            r0, kb, w, _, _ = span_meta[s]
            return pltpu.make_async_copy(
                g_ref.at[r0 : r0 + kb * w], gbuf.at[slot, : kb * w], gsem.at[slot]
            )

        def read_dma(s, slot):
            c0 = span_meta[s][4]
            return pltpu.make_async_copy(
                xl_o.at[rows, pl.ds(c0, SPAN)], iobuf.at[slot, 0], rsem.at[slot]
            )

        def write_dma(s, slot):
            c0 = span_meta[s][4]
            return pltpu.make_async_copy(
                iobuf.at[slot, 1], xl_o.at[rows, pl.ds(c0, SPAN)], wsem.at[slot]
            )

        uniform01 = _make_uniform01(block_seed)

        def step(t, _):
            done = done_o[:]
            active = done < 0.5
            v = v_o[:]
            v16_ref[:] = v.astype(mm_dtype)
            total_ref[:] = jnp.zeros_like(total_ref)
            unsat_ref[:] = jnp.zeros_like(unsat_ref)
            sat_ref[:] = jnp.ones_like(sat_ref)
            g_dma(0, 0).start()
            read_dma(0, 0).start()
            for s in range(S):
                slot = s % 2
                _, kb, w, lo, c0 = span_meta[s]
                if s + 1 < S:
                    g_dma(s + 1, (s + 1) % 2).start()
                    read_dma(s + 1, (s + 1) % 2).start()
                g_dma(s, slot).wait()
                read_dma(s, slot).wait()
                xl0 = iobuf[slot, 0]
                vwin = v16_ref[:, lo : lo + w]
                sat = jnp.zeros((Bb, SPAN), dtype=jnp.float32)
                for k in range(kb):
                    lit_true = jnp.dot(
                        vwin,
                        gbuf[slot, k * w : (k + 1) * w],
                        preferred_element_type=jnp.float32,
                        precision=mm_precision,
                    ) + bias_ref[k : k + 1, c0 : c0 + SPAN]
                    sat = jnp.maximum(sat, lit_true)
                cmask = cmask_ref[:, c0 : c0 + SPAN]
                xl_new = jnp.where(
                    sat > 0,
                    jnp.maximum(xl0 - 1.0, 1.0),
                    jnp.minimum(xl0 + float(STOCH_ALPHA), XL_CAP),
                ) * cmask
                unsat_f = 1.0 - sat
                for k in range(kb):
                    wk = xl_new * sign_ref[k : k + 1, c0 : c0 + SPAN]
                    # total and unsat scatters share the plane operand:
                    # one row-stacked matmul instead of two halves the
                    # MXU launches per (span, k) at identical flops
                    both = jax.lax.dot_general(
                        jnp.concatenate([wk, wk * unsat_f], axis=0).astype(
                            mm_dtype
                        ),
                        gbuf[slot, k * w : (k + 1) * w],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=mm_precision,
                    )
                    total_ref[:, lo : lo + w] = (
                        total_ref[:, lo : lo + w] + both[:Bb]
                    )
                    unsat_ref[:, lo : lo + w] = (
                        unsat_ref[:, lo : lo + w] + both[Bb:]
                    )
                span_all = jnp.min(
                    jnp.where(cmask > 0, sat, 1.0), axis=1, keepdims=True
                )
                sat_ref[:] = jnp.minimum(sat_ref[:], span_all)
                if s >= 2:
                    write_dma(s - 2, slot).wait()
                iobuf[slot, 1] = jnp.where(active, xl_new, xl0)
                write_dma(s, slot).start()
            u = uniform01(t, (Bb, Np))
            flip = (u * total_ref[:] < unsat_ref[:]) & (hasocc_ref[:] > 0)
            v_o[:] = jnp.where(active & flip, 1.0 - v, v)
            done_o[:] = jnp.maximum(done, sat_ref[:])
            for s in (S - 2, S - 1):
                if s >= 0:
                    write_dma(s, s % 2).wait()
            return 0

        v_o[:] = v_ref[:]
        done_o[:] = done_ref[:]
        jax.lax.fori_loop(0, chunk_steps, step, 0)

    def raw(state, G, bias, signs_in, cmask_in, has_occ_in):
        from odesat_tpu.models.stoch import StochState

        B_in = state.v.shape[0]
        Bb = traj_block
        while Bb > 8 and Bb > B_in:
            Bb //= 2
        pad = (-B_in) % Bb
        v = state.v.astype(jnp.float32)
        xl = state.xl.astype(jnp.float32)
        done = state.done.astype(jnp.float32).reshape(B_in, 1)
        if pad:
            v = jnp.concatenate([v, jnp.zeros((pad, Np), jnp.float32)], axis=0)
            xl = jnp.concatenate([xl, jnp.ones((pad, Mp), jnp.float32)], axis=0)
            done = jnp.concatenate([done, jnp.ones((pad, 1), jnp.float32)], axis=0)
        B = B_in + pad

        key, sub = jax.random.split(state.key)
        seed = jax.random.randint(sub, (1,), 0, 2**31 - 1, dtype=jnp.int32).astype(
            jnp.uint32
        )

        row_blk = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        const_blk = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        any_spec = pl.BlockSpec(memory_space=pl.ANY)

        static_vmem = (
            2 * max_group_rows * SPAN * itemsize
            + 2 * 2 * Bb * SPAN * 4
            + Bb * Np * (itemsize + 8)
            + 3 * Bb * Np * 4
            + (2 * K + 2) * Mp * 4
        )
        vmem_limit = max(
            16 * 1024 * 1024, min(int(static_vmem * 1.8), 96 * 1024 * 1024)
        )

        v_out, xl_out, done_out = pallas_call_32bit(
            kernel,
            grid=(B // Bb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
                row_blk((Bb, Np)),
                any_spec,
                row_blk((Bb, 1)),
                any_spec,  # planes
                const_blk((K, Mp)),  # bias
                const_blk((K, Mp)),  # signs
                const_blk((1, Mp)),
                const_blk((1, Np)),
            ],
            out_specs=[row_blk((Bb, Np)), any_spec, row_blk((Bb, 1))],
            out_shape=[
                jax.ShapeDtypeStruct((B, Np), jnp.float32),
                jax.ShapeDtypeStruct((B, Mp), jnp.float32),
                jax.ShapeDtypeStruct((B, 1), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, max_group_rows, SPAN), mm_dtype),  # plane stage
                pltpu.VMEM((2, 2, Bb, SPAN), jnp.float32),  # xl read/write stage
                pltpu.VMEM((Bb, Np), mm_dtype),  # matmul-dtype assignment copy
                pltpu.VMEM((Bb, Np), jnp.float32),  # total weights
                pltpu.VMEM((Bb, Np), jnp.float32),  # unsat weights
                pltpu.VMEM((Bb, 1), jnp.float32),  # allsat accumulator
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((1,)),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, vmem_limit_bytes=vmem_limit
            ),
        )(seed, v, xl, done, G, bias, signs_in, cmask_in, has_occ_in)

        return StochState(
            v=v_out[:B_in] > 0.5,
            xl=xl_out[:B_in].astype(state.xl.dtype),
            done=done_out.reshape(B)[:B_in] > 0.5,
            key=key,
        )

    jitted = jax.jit(raw, donate_argnums=0 if donate else ())
    _JIT_CACHE[cache_key] = jitted
    return wrap_chunk_runner(
        jitted, cache_key, G_host, bias_host, sign_host, cmask_host, has_occ_host
    )


# ---------------------------------------------------------------------------
# clause-sharded per-shard evaluation kernel (round-3: the clause-mesh
# stoch path was scan-only, 10-20x slower than its own kernels — the
# huge CNFs the clause axis exists for deserve the fast path too)
# ---------------------------------------------------------------------------


def make_stoch_shard_eval(
    fa: FormulaArrays,
    interpret: bool | None = None,
    traj_block: int | None = None,
    matmul_dtype: str = "float32",
):
    """Build ``eval(v01, xl, active, planes, lo, sbias, nsign, cmask) ->
    (total_partial, unsat_partial, xl_new, sat_all)`` for ONE shard's
    local clause slice (runs inside shard_map; the caller psums the
    per-variable weight partials and AND-reduces sat_all over the clause
    axis, then draws the flips — models/stoch.make_stoch_clause_step's
    collective plumbing with the heavy part in Pallas).

    Reuses the ODE shard plan's windowed sign-baked planes
    (ops/shard_stream.compile_stream_sharded): each plane column holds
    ``-q`` at the literal's variable row, so

    * ``lit_true_k = sbias_k - (v01win @ plane_k)`` is the exact 0/1
      literal truth (``sbias_k`` = 1 for negated literals) — one
      nonzero per column makes the matmul the plain gather;
    * scattering ``w * (-q)`` back through the same planes accumulates
      ``w * q^2 = w`` at the variable row (``nsign`` = ``-q`` per slot).

    Weight arithmetic is integer-valued in f32 (weights clamped to
    2**24), so with ``matmul_dtype='float32'`` (HIGHEST precision) the
    partials are exact and the flip stream matches the scan path bit
    for bit; ``'bfloat16'`` rounds the weight sums (~8-bit relative)
    like the single-device stoch kernels — clause evaluation stays
    exact either way. Reference anchor: the weight sums,
    src/stoch.rs:53-59."""
    from odesat_tpu.ops.shard_stream import (
        SPAN,
        _block_footprint,
        _pick_traj_block,
        _VMEM_BUDGET,
    )

    plan = fa.shard_plan
    if plan is None:
        raise ValueError("needs a compile_stream_sharded formula (shard plan)")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bf16 = matmul_dtype == "bfloat16"
    mm_dtype = jnp.bfloat16 if bf16 else jnp.float32
    mm_precision = None if bf16 else jax.lax.Precision.HIGHEST
    itemsize = 2 if bf16 else 4

    span_meta = plan.span_meta
    S = len(span_meta)
    Np = plan.n_vars_padded
    Mp = plan.mp_local
    Kmax = max(kb for _, kb, _, _ in span_meta)
    R = plan.planes.shape[1]
    alpha = float(STOCH_ALPHA)

    def kernel(lo_ref, v_ref, act_ref, xl_ref, sbias_ref, nsign_ref, cmask_ref,
               g_ref,
               tot_out, uns_out, xl_out, sat_out,
               gbuf, iobuf, v16_ref, sat_ref,
               gsem, rsem, wsem):
        i = pl.program_id(0)
        Bb = v_ref.shape[0]
        rows = pl.ds(i * Bb, Bb)
        v16_ref[:] = v_ref[:].astype(mm_dtype)
        tot_out[:] = jnp.zeros_like(tot_out)
        uns_out[:] = jnp.zeros_like(uns_out)
        sat_ref[:] = jnp.ones_like(sat_ref)
        active = act_ref[:] > 0.5  # (Bb, 1)

        def g_dma(sp, slot):
            r0, kb, w, _ = span_meta[sp]
            return pltpu.make_async_copy(
                g_ref.at[r0 : r0 + kb * w], gbuf.at[slot, : kb * w], gsem.at[slot]
            )

        def read_dma(sp, slot):
            c0 = span_meta[sp][3]
            return pltpu.make_async_copy(
                xl_ref.at[rows, pl.ds(c0, SPAN)],
                iobuf.at[slot, 0],
                rsem.at[slot],
            )

        def write_dma(sp, slot):
            c0 = span_meta[sp][3]
            return pltpu.make_async_copy(
                iobuf.at[slot, 1],
                xl_out.at[rows, pl.ds(c0, SPAN)],
                wsem.at[slot],
            )

        g_dma(0, 0).start()
        read_dma(0, 0).start()
        for sp in range(S):
            slot = sp % 2
            if sp + 1 < S:
                nslot = (sp + 1) % 2
                g_dma(sp + 1, nslot).start()
                read_dma(sp + 1, nslot).start()
            g_dma(sp, slot).wait()
            read_dma(sp, slot).wait()
            r0, kb, w, c0 = span_meta[sp]
            lo = pl.multiple_of(lo_ref[sp], SPAN)
            vwin = v16_ref[:, pl.ds(lo, w)]
            xl0 = iobuf[slot, 0]
            cmask = cmask_ref[:, c0 : c0 + SPAN]

            sat = None
            for k in range(kb):
                lit_true = sbias_ref[k : k + 1, c0 : c0 + SPAN] - jnp.dot(
                    vwin,
                    gbuf[slot, k * w : (k + 1) * w],
                    preferred_element_type=jnp.float32,
                    precision=mm_precision,
                )
                sat = lit_true if sat is None else jnp.maximum(sat, lit_true)

            # weight update with post-update weights feeding the sums
            # (src/stoch.rs:47-59); padding slots carry weight 0
            xl_new = jnp.where(
                sat > 0.5,
                jnp.maximum(xl0 - 1.0, 1.0),
                jnp.minimum(xl0 + alpha, XL_CAP),
            ) * cmask
            unsat_w = xl_new * (1.0 - sat)
            for k in range(kb):
                nsign = nsign_ref[k : k + 1, c0 : c0 + SPAN]
                # row-stacked (total ‖ unsat) scatter: one matmul, not two
                both = jax.lax.dot_general(
                    jnp.concatenate(
                        [xl_new * nsign, unsat_w * nsign], axis=0
                    ).astype(mm_dtype),
                    gbuf[slot, k * w : (k + 1) * w],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=mm_precision,
                )
                tot_out[:, pl.ds(lo, w)] = tot_out[:, pl.ds(lo, w)] + both[:Bb]
                uns_out[:, pl.ds(lo, w)] = uns_out[:, pl.ds(lo, w)] + both[Bb:]
            sat_ref[:] = jnp.minimum(
                sat_ref[:],
                jnp.min(jnp.where(cmask > 0, sat, 1.0), axis=1, keepdims=True),
            )
            if sp >= 2:
                write_dma(sp - 2, slot).wait()
            # frozen chains keep their weights verbatim (models/stoch.py
            # freeze keeps state.xl including padding slots)
            iobuf[slot, 1] = jnp.where(active, xl_new, xl0)
            write_dma(sp, slot).start()
        for sp in (S - 2, S - 1):
            if sp >= 0:
                write_dma(sp, sp % 2).wait()
        sat_out[:] = sat_ref[:]

    def eval_fn(v01, xl, active, planes, lo, sbias, nsign, cmask):
        B = v01.shape[0]
        Bb = traj_block or _pick_traj_block(
            B, Np, Mp, plan.max_group_rows, itemsize, Kmax, channels=2
        )
        while Bb > 8 and B % Bb:
            Bb //= 2
        grid = (B // Bb,) if B % Bb == 0 else (1,)
        if B % Bb:
            if (
                _block_footprint(B, Np, Mp, plan.max_group_rows, itemsize, Kmax, 2)
                > _VMEM_BUDGET
            ):
                raise ValueError(
                    f"batch size {B} has no power-of-two divisor >= 8 and is "
                    "too large for a single VMEM block; use a batch size "
                    "divisible by 8"
                )
            Bb = B

        row_blk = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        )
        const_blk = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i, *_: (0,) * len(shape), memory_space=pltpu.VMEM
        )
        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                row_blk((Bb, Np)),
                row_blk((Bb, 1)),  # active
                any_spec,  # xl: span-streamed
                const_blk(sbias.shape),
                const_blk(nsign.shape),
                const_blk((1, Mp)),
                any_spec,  # planes
            ],
            out_specs=[
                row_blk((Bb, Np)),
                row_blk((Bb, Np)),
                any_spec,  # xl_new
                row_blk((Bb, 1)),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, plan.max_group_rows, SPAN), mm_dtype),
                pltpu.VMEM((2, 2, Bb, SPAN), jnp.float32),
                pltpu.VMEM((Bb, Np), mm_dtype),
                pltpu.VMEM((Bb, 1), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        tot, uns, xl_new, sat = pallas_call_32bit(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((B, Np), jnp.float32),
                jax.ShapeDtypeStruct((B, Np), jnp.float32),
                jax.ShapeDtypeStruct((B, Mp), jnp.float32),
                jax.ShapeDtypeStruct((B, 1), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=_VMEM_BUDGET + 32 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=12 * B * R * SPAN,
                bytes_accessed=(B // Bb) * R * SPAN * itemsize + 2 * B * Mp * 4,
                transcendentals=0,
            ),
        )(
            lo,
            v01.astype(jnp.float32),
            active.reshape(B, 1).astype(jnp.float32),
            xl,
            sbias,
            nsign,
            cmask.reshape(1, Mp).astype(jnp.float32),
            planes.astype(mm_dtype),
        )
        return tot, uns, xl_new, sat.reshape(B) > 0.5

    return eval_fn


def stoch_shard_chunk_supported(fa: FormulaArrays, itemsize: int = 4) -> bool:
    """Whole-chunk clause-sharded stoch kernel eligibility: a shard plan
    whose shard count is a power of two (the butterfly all-reduce's
    requirement), plane HBM within budget, 128-aligned variable axis."""
    from odesat_tpu.ops.shard_stream import _G_HBM_LIMIT, _VMEM_BUDGET, SPAN

    plan = fa.shard_plan
    if plan is None:
        return False
    s = plan.n_shards
    K = fa.lit_var.shape[0]
    const_vmem = (2 * K + 1) * plan.mp_local * 4  # sbias + nsign + cmask
    return (
        (s & (s - 1)) == 0
        and plan.planes.shape[1] * SPAN * itemsize <= _G_HBM_LIMIT
        and plan.n_vars_padded % SPAN == 0
        and const_vmem <= _VMEM_BUDGET // 3
    )


def make_stoch_shard_chunk(
    fa: FormulaArrays,
    chunk_steps: int,
    interpret: bool | None = None,
    traj_block: int | None = None,
    matmul_dtype: str = "float32",
    ring_axis: str = "clause",
):
    """Whole-chunk clause-sharded stoch kernel for use INSIDE shard_map:
    ``call(v01, xl, done, seed, planes, lo, sbias, nsign, cmask) ->
    (v01, xl, done)`` advancing ``chunk_steps`` flip steps with the
    per-variable weight-sum all-reduce done IN-kernel — a butterfly
    (recursive-doubling) exchange over ICI remote DMA, exactly the
    ops/shard_chunk.py collective with (total ‖ unsat) adds and a
    min-combined allsat flag riding a 128-lane extension.

    v/done stay resident in VMEM across the chunk; the shard-local xl
    spans stream through a small staging buffer. Flips draw from the
    same counter-based murmur3 PRNG as :func:`make_fused_stoch_chunk`,
    seeded identically on every clause shard (the wrapper derives
    ``seed`` from the clause-replicated trajectory key), and the summed
    (total, unsat) are bit-identical everywhere (integer-valued f32 +
    order-symmetric butterfly), so the replicated v never drifts across
    the clause axis. Weight-sum exactness: f32 matmuls keep the sums
    exact; ``matmul_dtype='bfloat16'`` rounds them (~8-bit relative)
    like the other stoch kernels. Reference anchors: the weight sums,
    src/stoch.rs:53-59; flip rule, src/stoch.rs:67-75.
    """
    from odesat_tpu.ops.butterfly import (
        butterfly_allreduce,
        entry_barrier,
        travel_slots,
    )
    from odesat_tpu.ops.shard_stream import (
        SPAN,
        _block_footprint,
        _pick_traj_block,
        _VMEM_BUDGET,
    )

    plan = fa.shard_plan
    if plan is None:
        raise ValueError("needs a compile_stream_sharded formula (shard plan)")
    n_shards = plan.n_shards
    if n_shards & (n_shards - 1):
        raise ValueError("stoch shard_chunk needs a power-of-two clause axis")
    n_rounds = n_shards.bit_length() - 1
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bf16 = matmul_dtype == "bfloat16"
    mm_dtype = jnp.bfloat16 if bf16 else jnp.float32
    mm_precision = None if bf16 else jax.lax.Precision.HIGHEST
    itemsize = 2 if bf16 else 4

    span_meta = plan.span_meta
    S = len(span_meta)
    Np = plan.n_vars_padded
    Mp = plan.mp_local
    Kmax = max(kb for _, kb, _, _ in span_meta)
    R = plan.planes.shape[1]
    alpha = float(STOCH_ALPHA)
    EXT = SPAN  # flag lanes riding with the (total ‖ unsat) block

    def kernel(lo_ref, seed_ref, v_ref, done_ref, xl_ref,
               sbias_ref, nsign_ref, cmask_ref, g_ref,
               v_o, done_o, xl_o,
               gbuf, iobuf, v16_ref, acc_ref, travel_ref, sat_ref,
               gsem, rsem, wsem, csem, ssem, rvsem):
        i = pl.program_id(0)
        Bb = v_ref.shape[0]
        rows = pl.ds(i * Bb, Bb)
        block_seed = (seed_ref[0] + i * 0x632BE59B).astype(jnp.uint32)

        if n_rounds > 0:
            # barrier with every butterfly partner before the launch's
            # first remote DMA (ops/butterfly.entry_barrier); later grid
            # blocks are ordered by the in-launch slot discipline, so
            # once per launch suffices
            @pl.when(i == 0)
            def _entry():
                entry_barrier(
                    n_rounds=n_rounds, ring_axis=ring_axis, interpret=interpret
                )

        init_xl = pltpu.make_async_copy(xl_ref.at[rows], xl_o.at[rows], csem)
        init_xl.start()
        init_xl.wait()
        v_o[:] = v_ref[:]
        done_o[:] = done_ref[:]

        uniform01 = _make_uniform01(block_seed)

        def g_dma(sp, slot):
            r0, kb, w, _ = span_meta[sp]
            return pltpu.make_async_copy(
                g_ref.at[r0 : r0 + kb * w], gbuf.at[slot, : kb * w], gsem.at[slot]
            )

        def read_dma(sp, slot):
            c0 = span_meta[sp][3]
            return pltpu.make_async_copy(
                xl_o.at[rows, pl.ds(c0, SPAN)], iobuf.at[slot, 0], rsem.at[slot]
            )

        def write_dma(sp, slot):
            c0 = span_meta[sp][3]
            return pltpu.make_async_copy(
                iobuf.at[slot, 1], xl_o.at[rows, pl.ds(c0, SPAN)], wsem.at[slot]
            )

        def allreduce(parity):
            """Butterfly all-reduce of acc_ref over the clause axis:
            (total ‖ unsat) zones add, the flag zone min-combines;
            bit-identical on every shard, race-free via per-(round,
            parity) recv slots — see ops/butterfly.py."""

            def combine(recv):
                acc_ref[:, : 2 * Np] = acc_ref[:, : 2 * Np] + recv[:, : 2 * Np]
                acc_ref[:, 2 * Np :] = jnp.minimum(
                    acc_ref[:, 2 * Np :], recv[:, 2 * Np :]
                )

            butterfly_allreduce(
                acc_ref,
                travel_ref,
                ssem,
                rvsem,
                n_rounds=n_rounds,
                ring_axis=ring_axis,
                interpret=interpret,
                parity=parity,
                combine=combine,
            )

        def step(t, _):
            done = done_o[:]
            active = done < 0.5  # (Bb, 1)
            v = v_o[:]
            v16_ref[:] = v.astype(mm_dtype)
            acc_ref[:] = jnp.zeros_like(acc_ref)
            sat_ref[:] = jnp.ones_like(sat_ref)

            g_dma(0, 0).start()
            read_dma(0, 0).start()
            for sp in range(S):
                slot = sp % 2
                if sp + 1 < S:
                    nslot = (sp + 1) % 2
                    g_dma(sp + 1, nslot).start()
                    read_dma(sp + 1, nslot).start()
                g_dma(sp, slot).wait()
                read_dma(sp, slot).wait()
                r0, kb, w, c0 = span_meta[sp]
                lo = pl.multiple_of(lo_ref[sp], SPAN)
                vwin = v16_ref[:, pl.ds(lo, w)]
                xl0 = iobuf[slot, 0]
                cmask = cmask_ref[:, c0 : c0 + SPAN]

                sat = None
                for k in range(kb):
                    lit_true = sbias_ref[k : k + 1, c0 : c0 + SPAN] - jnp.dot(
                        vwin,
                        gbuf[slot, k * w : (k + 1) * w],
                        preferred_element_type=jnp.float32,
                        precision=mm_precision,
                    )
                    sat = lit_true if sat is None else jnp.maximum(sat, lit_true)

                xl_new = jnp.where(
                    sat > 0.5,
                    jnp.maximum(xl0 - 1.0, 1.0),
                    jnp.minimum(xl0 + alpha, XL_CAP),
                ) * cmask
                unsat_w = xl_new * (1.0 - sat)
                for k in range(kb):
                    nsign = nsign_ref[k : k + 1, c0 : c0 + SPAN]
                    # row-stacked (total ‖ unsat) scatter: one matmul
                    both = jax.lax.dot_general(
                        jnp.concatenate(
                            [xl_new * nsign, unsat_w * nsign], axis=0
                        ).astype(mm_dtype),
                        gbuf[slot, k * w : (k + 1) * w],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=mm_precision,
                    )
                    acc_ref[:, pl.ds(lo, w)] = (
                        acc_ref[:, pl.ds(lo, w)] + both[:Bb]
                    )
                    acc_ref[:, pl.ds(Np + lo, w)] = (
                        acc_ref[:, pl.ds(Np + lo, w)] + both[Bb:]
                    )
                sat_ref[:] = jnp.minimum(
                    sat_ref[:],
                    jnp.min(jnp.where(cmask > 0, sat, 1.0), axis=1, keepdims=True),
                )
                if sp >= 2:
                    write_dma(sp - 2, slot).wait()
                iobuf[slot, 1] = jnp.where(active, xl_new, xl0)
                write_dma(sp, slot).start()
            for sp in (S - 2, S - 1):
                if sp >= 0:
                    write_dma(sp, sp % 2).wait()

            acc_ref[:, 2 * Np :] = jnp.broadcast_to(sat_ref[:], (Bb, EXT))
            # one invocation per step: the step index alternates parity
            allreduce(parity=t % 2)
            tot = acc_ref[:, :Np]
            uns = acc_ref[:, Np : 2 * Np]
            allsat = acc_ref[:, 2 * Np : 2 * Np + 1]
            u = uniform01(t, (Bb, Np))
            flip = u * tot < uns
            v_o[:] = jnp.where(active & flip, 1.0 - v, v)
            done_o[:] = jnp.maximum(done, allsat)
            return 0

        jax.lax.fori_loop(0, chunk_steps, step, 0)
        if chunk_steps % 2:
            # Parity flush (see ops/shard_chunk.py): one invocation per
            # step means an odd chunk ends on parity 0 and the next
            # trajectory block / launch would reuse the same recv slots
            # back to back, breaking ops/butterfly.py's alternation
            # contract. One dead-data invocation at parity 1 keeps every
            # block's invocation count even. acc_ref is re-zeroed at each
            # step start, so the extra combine is harmless.
            allreduce(parity=1)

    def footprint(bb):
        return _block_footprint(
            bb, Np, Mp, plan.max_group_rows, itemsize, Kmax, channels=2
        ) + (1 + travel_slots(n_rounds)) * bb * (2 * Np + EXT) * 4

    def call(v01, xl, done, seed, planes, lo, sbias, nsign, cmask):
        B = v01.shape[0]
        Bb = traj_block or _pick_traj_block(
            B, Np, Mp, plan.max_group_rows, itemsize, Kmax, channels=2
        )
        while Bb > 8 and B % Bb:
            Bb //= 2
        while Bb > 8 and footprint(Bb) > _VMEM_BUDGET:
            Bb //= 2
        if B % Bb:
            if footprint(B) > _VMEM_BUDGET:
                raise ValueError(
                    f"batch size {B} has no power-of-two divisor >= 8 and is "
                    "too large for a single VMEM block; use a batch size "
                    "divisible by 8"
                )
            Bb = B
        grid = (B // Bb,)

        row_blk = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        )
        const_blk = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i, *_: (0,) * len(shape), memory_space=pltpu.VMEM
        )
        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # lo, seed
            grid=grid,
            in_specs=[
                row_blk((Bb, Np)),
                row_blk((Bb, 1)),  # done
                any_spec,  # xl: span-streamed
                const_blk(sbias.shape),
                const_blk(nsign.shape),
                const_blk((1, Mp)),
                any_spec,  # planes
            ],
            out_specs=[
                row_blk((Bb, Np)),
                row_blk((Bb, 1)),
                any_spec,  # xl out (staged+streamed in-kernel)
            ],
            scratch_shapes=[
                pltpu.VMEM((2, plan.max_group_rows, SPAN), mm_dtype),
                pltpu.VMEM((2, 2, Bb, SPAN), jnp.float32),
                pltpu.VMEM((Bb, Np), mm_dtype),
                pltpu.VMEM((Bb, 2 * Np + EXT), jnp.float32),  # acc
                # per-(round, parity) recv slots — see ops/butterfly.py
                pltpu.VMEM(
                    (travel_slots(n_rounds), Bb, 2 * Np + EXT), jnp.float32
                ),
                pltpu.VMEM((Bb, 1), jnp.float32),  # sat
                pltpu.SemaphoreType.DMA((2,)),  # planes
                pltpu.SemaphoreType.DMA((2,)),  # span reads
                pltpu.SemaphoreType.DMA((2,)),  # span writes
                pltpu.SemaphoreType.DMA,  # init copy
                pltpu.SemaphoreType.DMA,  # remote send
                pltpu.SemaphoreType.DMA((travel_slots(n_rounds),)),  # remote recv
            ],
        )
        v_o, done_o, xl_o = pallas_call_32bit(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((B, Np), jnp.float32),
                jax.ShapeDtypeStruct((B, 1), jnp.float32),
                jax.ShapeDtypeStruct((B, Mp), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=_VMEM_BUDGET + 32 * 1024 * 1024,
                # distinct from ops/shard_chunk.py's id 7 so both
                # collectives may live in one compiled program
                **({"collective_id": 8} if n_rounds > 0 else {}),
            ),
            cost_estimate=pl.CostEstimate(
                flops=12 * B * R * SPAN * chunk_steps,
                bytes_accessed=(B // Bb) * chunk_steps * R * SPAN * itemsize
                + 2 * B * Mp * 4 * chunk_steps,
                transcendentals=0,
            ),
        )(
            lo,
            seed,
            v01.astype(jnp.float32),
            done.reshape(B, 1).astype(jnp.float32),
            xl,
            sbias,
            nsign,
            cmask.reshape(1, Mp).astype(jnp.float32),
            planes.astype(mm_dtype),
        )
        return v_o, xl_o, done_o.reshape(B) > 0.5

    return call


def stoch_shard_arrays(fa: FormulaArrays):
    """Per-shard (S, K, Mp_local) stoch companions to the ODE shard
    plan's planes: ``sbias`` (1 where the literal is negated) and
    ``nsign`` (``-q`` per slot, 0 at padding) — see
    :func:`make_stoch_shard_eval`."""
    plan = fa.shard_plan
    S, Mp = plan.n_shards, plan.mp_local
    K = fa.lit_var.shape[0]
    sign = fa.sign.reshape(K, S, Mp).transpose(1, 0, 2)  # (S, K, Mp_local)
    mask = fa.lit_mask.reshape(K, S, Mp).transpose(1, 0, 2) > 0
    sbias = ((sign < 0) & mask).astype(np.float32)
    nsign = (-sign * mask).astype(np.float32)
    return sbias, nsign
