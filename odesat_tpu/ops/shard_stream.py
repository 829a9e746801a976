"""Clause-sharded streaming RHS: the fast path for huge CNFs on a mesh.

Round 1 forced every clause-sharded solve onto the segment_sum scan path
(4-17x slower than the chunk kernels in the repo's own shootout) and
rejected width-bucketed formulas outright. This module closes that gap —
the whole point of the clause axis is CNFs too big for one chip
(SURVEY.md §2b), and those are exactly the ones that need the fast
kernel and the width buckets.

Design
------

The clause axis is partitioned **per width bucket**: every global width
bucket is split contiguously into ``n_shards`` equal parts (padded to a
shared 128-aligned part length), so *every shard has the same static
local layout* — same bucket slices, same span count, same plane row
offsets. That uniformity is what lets one SPMD program (one shard_map
trace, one Pallas kernel) run all shards while each streams different
plane *data*.

Per shard, the incidence is packed into sign-baked variable-window
planes exactly like ops/stream_pallas.py (plane k of a span holds
``-q_i`` at the literal's variable row; one MXU pass over ``v`` yields
the per-literal clause values, and the transposed pass scatters dv).
Because span *metadata* must be shard-uniform, window widths are
uniformized per bucket (``W_b`` = the widest window any shard's span in
bucket b needs, 128-aligned, capped at Np) and only the window *offset*
``lo`` stays per-(shard, span) — it rides in as a scalar-prefetch array
and drives dynamic 128-aligned slices of ``v`` and the dv accumulator.

Unlike the single-device chunk kernels, a launch covers ONE evaluation
of the local clause shard — but the shard-local clamped xs/xl Euler
updates are fused into the kernel epilogue (:func:`make_fused_clause_step`,
round-2 VERDICT item 1): the per-clause independence that makes dv a
pure segment-sum + all-reduce (reference walk: src/system.rs:35-90)
makes the clause-memory updates entirely shard-local, so only the v
update — the one consumer of the psum'd dv — runs in XLA under
shard_map. Fixed-step mode is one launch per step; adaptive mode is the
minimum two (full-step derivatives, then the second evaluation at the
recomputed half step) with the dv psum between them. The plain
single-evaluation RHS (:func:`make_stream_shard_rhs`) remains the
parity-test surface against the scan path's ``make_step_fn``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from odesat_tpu.ops.kernelctx import pallas_call_32bit

from odesat_tpu.cnf.formula import CNFFormula
from odesat_tpu.constants import ALPHA, BETA, DELTA, EPSILON, GAMMA

_INF = float("inf")
_BIG = 1.0e9  # padding-slot clause value: loses every min, finite (inf*0 = NaN in the MXU)
SPAN = 128
_G_HBM_LIMIT = 2 * 1024 * 1024 * 1024  # per-shard plane HBM budget
_VMEM_BUDGET = 64 * 1024 * 1024

from odesat_tpu.cnf.arrays import _round_up  # noqa: E402 — same rounding everywhere


@dataclass(frozen=True)
class StreamShardPlan:
    """Static, shard-uniform layout + per-shard plane data.

    ``span_meta``: tuple of (row_offset, K_b, W_b, c0) — identical for
    every shard; ``lo`` (S, n_spans) int32 holds each shard's per-span
    variable-window offsets (the only per-shard metadata, passed as a
    scalar-prefetch array). ``planes`` (S, R, SPAN) f32, ``bias``
    (S, K, Mp_local) f32.
    """

    n_shards: int
    mp_local: int
    n_vars_padded: int
    span_meta: tuple
    planes: np.ndarray
    lo: np.ndarray
    bias: np.ndarray
    max_group_rows: int


def compile_stream_sharded(
    formula: CNFFormula,
    n_shards: int,
    *,
    var_pad: int = 128,
    bucket: bool = True,
    min_bucket: int = 256,
    window_sort: bool = True,
    dtype=np.float32,
):
    """Compile a normalized formula for the clause-sharded streaming
    kernel. Returns ``(FormulaArrays, StreamShardPlan)`` where the
    FormulaArrays' clause axis is laid out as ``n_shards`` contiguous,
    identically-shaped shard segments (so ``P('traj', 'clause')``
    sharding splits it exactly at segment boundaries) and remains a
    perfectly ordinary FormulaArrays — the scan path runs it unchanged,
    which is how kernel-vs-scan parity is tested.

    Mirrors cnf/arrays.py compile_formula's array construction (the
    occurrence layout convention must match for the fallback paths).
    """
    from odesat_tpu.cnf.arrays import FormulaArrays, _make_buckets

    if any(len(c) == 0 for c in formula.clauses):
        raise ValueError("formula contains an empty clause (trivially UNSAT)")
    M = formula.num_clauses
    K = max(formula.max_clause_width, 1)
    N = formula.varnum
    widths = [len(c) for c in formula.clauses]

    if bucket and M and len(set(widths)) > 1:
        index_buckets = _make_buckets(widths, min_bucket)
    else:
        index_buckets = [list(range(M))]
    if window_sort:
        index_buckets = [
            sorted(ix, key=lambda i: min(l.variable for l in formula.clauses[i]))
            for ix in index_buckets
        ]

    # split each bucket contiguously into n_shards parts, all padded to
    # one shared 128-aligned part length -> identical local layouts
    local_meta = []  # (m0_local, m1_local, Kb)
    shard_parts = []  # per bucket: list of per-shard clause-index lists
    cursor = 0
    for indices in index_buckets:
        Kb = max((widths[i] for i in indices), default=1)
        per = -(-len(indices) // n_shards) if indices else 0
        parts = [indices[s * per : (s + 1) * per] for s in range(n_shards)]
        Mb = _round_up(max((len(p) for p in parts), default=0), SPAN)
        local_meta.append((cursor, cursor + Mb, Kb))
        shard_parts.append(parts)
        cursor += Mb
    Mp_local = cursor
    Mp = Mp_local * n_shards
    Np = _round_up(N, var_pad)

    lit_var = np.zeros((K, Mp), dtype=np.int32)
    sign = np.zeros((K, Mp), dtype=dtype)
    lit_mask = np.zeros((K, Mp), dtype=dtype)
    clause_mask = np.zeros((Mp,), dtype=dtype)
    xs_init = np.full((Mp,), 1.0, dtype=dtype)

    # global clause order: shard 0's full local layout, then shard 1's, …
    # occurrence slots follow the same (bucket-major within shard) order
    # as compile_formula: flat slot = slot_offset + k * Mb + j
    occurrences = [[] for _ in range(Np)]
    global_buckets = []  # (m0, m1, Kb) in global coords, clause-axis order
    slot_offset = 0
    for s in range(n_shards):
        base = s * Mp_local
        for (m0, m1, Kb), parts in zip(local_meta, shard_parts):
            Mb = m1 - m0
            for j, ci in enumerate(parts[s]):
                m = base + m0 + j
                clause = formula.clauses[ci]
                clause_mask[m] = 1.0
                xs_init[m] = 1.0 if any(lit.is_negated for lit in clause) else -1.0
                for k, lit in enumerate(clause):
                    lit_var[k, m] = lit.variable
                    sign[k, m] = -1.0 if lit.is_negated else 1.0
                    lit_mask[k, m] = 1.0
                    occurrences[lit.variable].append(slot_offset + k * Mb + j)
            global_buckets.append((base + m0, base + m1, Kb))
            slot_offset += Kb * Mb
    n_slots = slot_offset

    D = max((len(o) for o in occurrences), default=1) or 1
    var_occ = np.zeros((Np, D), dtype=np.int32)
    occ_mask = np.zeros((Np, D), dtype=dtype)
    for i, occ in enumerate(occurrences):
        if occ:
            var_occ[i, : len(occ)] = occ
            occ_mask[i, : len(occ)] = 1.0

    fa_fields = dict(
        lit_var=lit_var,
        sign=sign,
        lit_mask=lit_mask,
        clause_mask=clause_mask,
        xs_init=xs_init,
        var_occ=var_occ,
        occ_mask=occ_mask,
        n_vars=N,
        n_vars_padded=Np,
        n_clauses=M,
        n_clauses_padded=Mp,
        max_width=K,
        min_width=min(widths, default=1),
        max_occ=D,
        density=formula.clause_density(),
        bucket_slices=tuple(global_buckets),
        n_slots=n_slots,
    )

    # ---- per-shard windowed planes with bucket-uniform window widths
    n_spans_total = Mp_local // SPAN
    # pass 1: window offset + width per (shard, local span)
    lo_raw = np.zeros((n_shards, n_spans_total), dtype=np.int64)
    need_w = np.zeros((n_shards, n_spans_total), dtype=np.int64)
    bucket_of_span = {}
    for b, (m0, m1, Kb) in enumerate(local_meta):
        for c0 in range(m0, m1, SPAN):
            bucket_of_span[c0 // SPAN] = b
    for s in range(n_shards):
        base = s * Mp_local
        for sp in range(n_spans_total):
            cols = np.arange(base + sp * SPAN, base + (sp + 1) * SPAN)
            Kb = local_meta[bucket_of_span[sp]][2]
            on = lit_mask[:Kb, cols] > 0
            if on.any():
                vs = lit_var[:Kb, cols][on]
                lo = (int(vs.min()) // SPAN) * SPAN
                hi = _round_up(int(vs.max()) + 1, SPAN)
            else:
                lo, hi = 0, SPAN
            lo_raw[s, sp] = lo
            need_w[s, sp] = hi - lo
    # uniform W per bucket = the widest any shard's span needs, capped Np
    W_b = {}
    for b, (m0, m1, Kb) in enumerate(local_meta):
        spans = [sp for sp in range(n_spans_total) if bucket_of_span[sp] == b]
        W_b[b] = min(int(max((need_w[:, sp].max() for sp in spans), default=SPAN)), Np)

    span_meta = []  # (row_offset, Kb, W, c0)
    row_off = 0
    for sp in range(n_spans_total):
        b = bucket_of_span[sp]
        Kb = local_meta[b][2]
        W = W_b[b]
        span_meta.append((row_off, Kb, W, sp * SPAN))
        row_off += Kb * W
    R = row_off

    lo_arr = np.zeros((n_shards, n_spans_total), dtype=np.int32)
    planes = np.zeros((n_shards, R, SPAN), dtype=np.float32)
    bias = np.full((n_shards, K, Mp_local), 1.0 + _BIG, dtype=np.float32)
    for s in range(n_shards):
        base = s * Mp_local
        for r0, Kb, W, c0 in span_meta:
            lo = min(int(lo_raw[s, c0 // SPAN]), Np - W)
            lo_arr[s, c0 // SPAN] = lo
            cols = np.arange(base + c0, base + c0 + SPAN)
            for k in range(Kb):
                on = lit_mask[k, cols] > 0
                planes[s, r0 + k * W + (lit_var[k, cols[on]] - lo), np.where(on)[0]] = (
                    -sign[k, cols[on]]
                )
                bias[s, k, c0 + np.where(on)[0]] = 1.0

    plan = StreamShardPlan(
        n_shards=n_shards,
        mp_local=Mp_local,
        n_vars_padded=Np,
        span_meta=tuple(span_meta),
        planes=planes,
        lo=lo_arr,
        bias=bias,
        max_group_rows=max((kb * w for _, kb, w, _ in span_meta), default=SPAN),
    )
    fa = FormulaArrays(**fa_fields, shard_plan=plan)
    return fa, plan


def stream_shard_supported(fa, plan: StreamShardPlan, itemsize: int = 4) -> bool:
    """Kernel eligibility: no unit clauses (infinite gradients, see
    ops/rhs.py), the per-shard plane array within its HBM budget, and
    the bias/cmask const blocks — which do NOT shrink with the
    trajectory block — within a fraction of the VMEM budget."""
    K = plan.bias.shape[1]
    bias_vmem = (K + 1) * plan.mp_local * 4
    return (
        fa.min_width >= 2
        and plan.planes.shape[1] * SPAN * itemsize <= _G_HBM_LIMIT
        and plan.n_vars_padded % SPAN == 0
        and bias_vmem <= _VMEM_BUDGET // 3
    )


def _block_footprint(
    bb: int,
    Np: int,
    Mp_local: int,
    group_rows: int,
    itemsize: int,
    Kmax: int,
    channels: int = 4,
) -> int:
    """VMEM working set of one trajectory block. Clause-axis state is
    span-streamed through a small staging buffer (``channels`` double-
    buffered (bb, SPAN) lanes, 4 for the RHS/fixed kernels, 6 for the
    adaptive second-eval kernel), so the footprint is v-dominated."""
    return (
        bb * Np * (3 * 4 + 2 * itemsize)  # v in + dv out + dv acc + v16 (+ pipeline copy)
        + 2 * channels * bb * SPAN * 4  # span staging (2 slots)
        + Kmax * bb * SPAN * 4  # per-slot clause-value scratch (vals_ref)
        + 2 * group_rows * SPAN * itemsize  # plane staging
        + (Kmax + 1) * Mp_local * 4  # bias + cmask const blocks
    )


def _pick_traj_block(
    batch: int,
    Np: int,
    Mp_local: int,
    group_rows: int,
    itemsize: int,
    Kmax: int = 3,
    channels: int = 4,
) -> int:
    """Largest power-of-two block dividing the batch whose VMEM footprint
    fits (at Np=10240 streamed staging allows 256-row blocks where
    whole-block staging forced 32 — 8x more MXU rows per pass). Bigger
    blocks divide the per-launch plane streaming by the grid size and
    feed the MXU more rows per pass (512 -> 2048 measured 3.22 -> 3.13
    ms/step alone on preprocessed n=1k random 3-SAT at B=4096; the
    carry-copy elimination via input_output_aliases is the larger win —
    tools/probe_shard_overhead.py)."""
    bb = 2048
    while bb > 8 and batch % bb:
        bb //= 2
    while bb > 8:
        if (
            _block_footprint(bb, Np, Mp_local, group_rows, itemsize, Kmax, channels)
            <= _VMEM_BUDGET
        ):
            break
        bb //= 2
    return max(bb, 8)


def make_single_device_runner(fa, zeta: float, ode, chunk_steps: int):
    """Jitted ``(state, dev) -> state`` driving the shard-stream step at
    S=1 on one device — the per-shard building block of the clause-mesh
    path, runnable (and benchmarkable) without a mesh. ``fa`` must come
    from :func:`compile_stream_sharded` with ``n_shards=1``."""
    plan = fa.shard_plan
    if plan is None or plan.n_shards != 1:
        raise ValueError("needs a compile_stream_sharded(n_shards=1) formula")

    step = make_fused_clause_step(fa, zeta, ode)

    def run_chunk(state, dev):
        def body(carry, _):
            return step(carry, dev), None

        out, _ = jax.lax.scan(body, state, None, length=chunk_steps)
        return out

    return jax.jit(run_chunk, donate_argnums=0)


def _build_kernel(mode, span_meta, zeta_c, paper, mm_dtype, mm_precision, xl_cap):
    """Span-streaming kernel body, shared across the three launch modes:

    * ``"rhs"``   — one RHS evaluation, derivatives out (the adaptive
      integrator's first launch; also the parity-test surface).
    * ``"fixed"`` — RHS + the clamped shard-local xs/xl Euler updates in
      the epilogue (reference: src/system.rs:93-97; the updates are
      per-clause local, so they need no collective — round-2 VERDICT
      item 1). Only the v update (the one consumer of the psum'd dv)
      stays in XLA.
    * ``"second"``— the adaptive integrator's second evaluation: streams
      the first launch's dxs/dxl back in, recomputes the half-step
      state in-register (cheaper than round-tripping four extra (B, M)
      arrays through HBM), evaluates the RHS at it, and emits the
      final frozen/stepped xs/xl plus the shard-local inf-norm error.

    Stream channels: 0/1 = xs/xl reads, ("second": 2/3 = dxs1/dxl1
    reads), last two = writes. Read semaphore = channel*2 + slot; write
    semaphore = (channel - first_write_channel)*2 + slot.
    """
    S_spans = len(span_meta)
    n_read = 4 if mode == "second" else 2
    wc0, wc1 = n_read, n_read + 1  # write channels

    def kernel(lo_ref, *refs):
        if mode == "rhs":
            (v_ref, xs_ref, xl_ref, bias_ref, cmask_ref, g_ref,
             dv_out, o0_out, o1_out, red_out,
             gbuf, iobuf, v16_ref, dv_ref, vals_ref, red_ref,
             gsem, rsem, wsem) = refs
            streams = (xs_ref, xl_ref)
            dt = adv = None
        elif mode == "fixed":
            (v_ref, dt_ref, xs_ref, xl_ref, bias_ref, cmask_ref, g_ref,
             dv_out, o0_out, o1_out, red_out,
             gbuf, iobuf, v16_ref, dv_ref, vals_ref, red_ref,
             gsem, rsem, wsem) = refs
            streams = (xs_ref, xl_ref)
            dt = dt_ref[:]  # (Bb, 1), already zeroed for done trajectories
            adv = None
        else:
            (v_ref, dt_ref, adv_ref, xs_ref, xl_ref, dxs1_ref, dxl1_ref,
             bias_ref, cmask_ref, g_ref,
             dv_out, o0_out, o1_out, red_out,
             gbuf, iobuf, v16_ref, dv_ref, vals_ref, red_ref,
             gsem, rsem, wsem) = refs
            streams = (xs_ref, xl_ref, dxs1_ref, dxl1_ref)
            dt = dt_ref[:]
            adv = adv_ref[:]  # (Bb, 1) f32 advance flags

        i = pl.program_id(0)
        Bb = v_ref.shape[0]
        rows = pl.ds(i * Bb, Bb)
        v16_ref[:] = v_ref[:].astype(mm_dtype)
        dv_ref[:] = jnp.zeros_like(dv_ref)
        # reduction scratch: running sat-AND ("rhs"/"fixed") or running
        # error max ("second")
        red_ref[:] = (
            jnp.zeros_like(red_ref) if mode == "second" else jnp.ones_like(red_ref)
        )

        # clause-axis state lives in HBM (ANY) and streams span-by-span
        # through iobuf — whole-block staging made VMEM clause-dominated
        # at large M and forced tiny trajectory blocks. Same
        # double-buffered DMA pattern as ops/stream_pallas.py.
        def g_dma(sp, slot):
            r0, kb, w, _ = span_meta[sp]
            return pltpu.make_async_copy(
                g_ref.at[r0 : r0 + kb * w], gbuf.at[slot, : kb * w], gsem.at[slot]
            )

        def read_dma(src, sp, slot, channel):
            c0 = span_meta[sp][3]
            return pltpu.make_async_copy(
                src.at[rows, pl.ds(c0, SPAN)],
                iobuf.at[slot, channel],
                rsem.at[channel * 2 + slot],
            )

        def write_dma(dst, sp, slot, channel):
            c0 = span_meta[sp][3]
            return pltpu.make_async_copy(
                iobuf.at[slot, channel],
                dst.at[rows, pl.ds(c0, SPAN)],
                wsem.at[(channel - wc0) * 2 + slot],
            )

        g_dma(0, 0).start()
        for ch, src in enumerate(streams):
            read_dma(src, 0, 0, ch).start()
        for sp in range(S_spans):
            slot = sp % 2
            if sp + 1 < S_spans:
                nslot = (sp + 1) % 2
                g_dma(sp + 1, nslot).start()
                for ch, src in enumerate(streams):
                    read_dma(src, sp + 1, nslot, ch).start()
            g_dma(sp, slot).wait()
            for ch, src in enumerate(streams):
                read_dma(src, sp, slot, ch).wait()
            r0, kb, w, c0 = span_meta[sp]
            # window offsets are 128-aligned by construction; Mosaic
            # needs the hint to allow the dynamic lane slice
            lo = pl.multiple_of(lo_ref[sp], SPAN)
            vwin = v16_ref[:, pl.ds(lo, w)]
            xs = iobuf[slot, 0]
            xl = iobuf[slot, 1]
            if mode == "second":
                # recompute the half-step clause state in-register from
                # the first launch's derivatives (src/system.rs:111-139)
                half = 0.5 * dt
                xs0, xl0 = xs, xl
                dxs1 = iobuf[slot, 2]
                dxl1 = iobuf[slot, 3]
                xs = jnp.fmin(jnp.fmax(xs0 + half * dxs1, EPSILON), 1.0 - EPSILON)
                xl = jnp.fmin(jnp.fmax(xl0 + half * dxl1, 1.0), xl_cap)

            m1 = m2 = None
            for k in range(kb):
                valk = jnp.dot(
                    vwin,
                    gbuf[slot, k * w : (k + 1) * w],
                    preferred_element_type=jnp.float32,
                    precision=mm_precision,
                ) + bias_ref[k : k + 1, c0 : c0 + SPAN]
                if m1 is None:
                    m1 = valk
                    m2 = jnp.full(valk.shape, _INF, dtype=jnp.float32)
                else:
                    m2 = jnp.minimum(m2, jnp.maximum(m1, valk))
                    m1 = jnp.minimum(m1, valk)
                vals_ref[k] = valk

            c = 0.5 * m1
            # hoisted per-clause coefficients; the -1/2 cancels the
            # sign-baked planes' -q_i (see ops/stream_pallas.py header)
            a = -0.5 * (xl * xs)
            b = -0.5 * ((1.0 + zeta_c * xl) * (1.0 - xs))
            A1 = a * m1
            A2 = a * m2
            dvw = jnp.zeros((Bb, w), dtype=jnp.float32)
            for k in range(kb):
                valk = vals_ref[k]
                is_min = valk <= m1
                if paper:
                    contrib = jnp.where(is_min, A2 + b * valk, A1)
                else:
                    gate = (valk == c).astype(jnp.float32)
                    contrib = jnp.where(is_min, A2, A1) + b * (valk * gate)
                dvw = dvw + jax.lax.dot_general(
                    contrib.astype(mm_dtype),
                    gbuf[slot, k * w : (k + 1) * w],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=mm_precision,
                )
            dv_ref[:, pl.ds(lo, w)] = dv_ref[:, pl.ds(lo, w)] + dvw

            cmask = cmask_ref[:, c0 : c0 + SPAN]
            if sp >= 2:
                write_dma(o0_out, sp - 2, slot, wc0).wait()
                write_dma(o1_out, sp - 2, slot, wc1).wait()
            dxs = BETA * (xs + EPSILON) * (c - GAMMA) * cmask
            dxl = ALPHA * (c - DELTA) * cmask
            if mode == "rhs":
                iobuf[slot, wc0] = dxs
                iobuf[slot, wc1] = dxl
            elif mode == "fixed":
                # clamped Euler epilogue (src/system.rs:93-97); dt is 0
                # for done trajectories, and the clamps are idempotent on
                # in-range state, so frozen rows pass through unchanged
                iobuf[slot, wc0] = jnp.fmin(
                    jnp.fmax(xs + dt * dxs, EPSILON), 1.0 - EPSILON
                )
                iobuf[slot, wc1] = jnp.fmin(jnp.fmax(xl + dt * dxl, 1.0), xl_cap)
            else:
                # two-half-step result, full-step trial, inf-norm error
                txs = jnp.fmin(jnp.fmax(xs + half * dxs, EPSILON), 1.0 - EPSILON)
                txl = jnp.fmin(jnp.fmax(xl + half * dxl, 1.0), xl_cap)
                fxs = jnp.fmin(jnp.fmax(xs0 + dt * dxs1, EPSILON), 1.0 - EPSILON)
                fxl = jnp.fmin(jnp.fmax(xl0 + dt * dxl1, 1.0), xl_cap)
                red_ref[:] = jnp.maximum(
                    red_ref[:],
                    jnp.maximum(
                        jnp.max(jnp.abs(fxs - txs), axis=1, keepdims=True),
                        jnp.max(jnp.abs(fxl - txl), axis=1, keepdims=True),
                    ),
                )
                keep = adv > 0.0
                iobuf[slot, wc0] = jnp.where(keep, txs, xs0)
                iobuf[slot, wc1] = jnp.where(keep, txl, xl0)
            write_dma(o0_out, sp, slot, wc0).start()
            write_dma(o1_out, sp, slot, wc1).start()
            if mode != "second":
                red_ref[:] = jnp.minimum(
                    red_ref[:],
                    jnp.min(
                        jnp.where(cmask > 0, (c < GAMMA).astype(jnp.float32), 1.0),
                        axis=1,
                        keepdims=True,
                    ),
                )
        for sp in (S_spans - 2, S_spans - 1):
            if sp >= 0:
                slot = sp % 2
                write_dma(o0_out, sp, slot, wc0).wait()
                write_dma(o1_out, sp, slot, wc1).wait()
        dv_out[:] = dv_ref[:]
        red_out[:] = red_ref[:]

    return kernel


def _make_shard_call(
    mode,
    plan: StreamShardPlan,
    zeta: float,
    ode,
    interpret: bool | None = None,
    traj_block: int | None = None,
    xl_cap: float | None = None,
):
    """Wrap :func:`_build_kernel` in a pallas_call with the mode's
    input/output plumbing. Returns a callable taking the mode's
    positional arrays (see the per-mode wrappers below)."""
    if getattr(ode, "dtype", "float32") == "float64":
        # f32 state + f32/bf16 MXU passes throughout; reject instead of
        # silently downcasting (same policy as the other Pallas kernels)
        raise ValueError(
            "dtype='float64' is not supported by the clause-shard streaming "
            "kernels; use the scan path (dv_strategy='segment_sum') for f64"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    paper = ode.rigidity == "paper"
    zeta_c = float(zeta)
    bf16 = getattr(ode, "matmul_dtype", "float32") == "bfloat16"
    mm_dtype = jnp.bfloat16 if bf16 else jnp.float32
    mm_precision = None if bf16 else jax.lax.Precision.HIGHEST
    itemsize = 2 if bf16 else 4

    span_meta = plan.span_meta
    Np = plan.n_vars_padded
    Mp = plan.mp_local
    Kmax = max(kb for _, kb, _, _ in span_meta)
    R = plan.planes.shape[1]
    n_read = 4 if mode == "second" else 2
    channels = n_read + 2
    n_scalar_rows = {"rhs": 0, "fixed": 1, "second": 2}[mode]

    kernel = _build_kernel(mode, span_meta, zeta_c, paper, mm_dtype, mm_precision, xl_cap)

    def call(v, scalar_rows, stream_ins, planes, lo, bias, cmask):
        B = v.shape[0]
        Bb = traj_block or _pick_traj_block(
            B, Np, Mp, plan.max_group_rows, itemsize, Kmax, channels
        )
        while Bb > 8 and B % Bb:
            Bb //= 2
        grid = (B // Bb,) if B % Bb == 0 else (1,)
        if B % Bb:
            # no power-of-two divisor >= 8: run the whole batch as one
            # block — but only if its scratch actually fits (a large odd
            # batch at big Np would blow VMEM; ask for a divisible batch)
            if (
                _block_footprint(B, Np, Mp, plan.max_group_rows, itemsize, Kmax, channels)
                > _VMEM_BUDGET
            ):
                raise ValueError(
                    f"batch size {B} has no power-of-two divisor >= 8 and is "
                    "too large for a single VMEM block; use a batch size "
                    "divisible by 8"
                )
            Bb = B

        # index maps receive (grid_idx, *scalar_prefetch_refs)
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
                *([row_blk((Bb, 1))] * n_scalar_rows),  # dt (+ advance)
                *([any_spec] * n_read),  # clause-axis state: span-streamed
                const_blk(bias.shape),
                const_blk((1, Mp)),
                any_spec,  # planes
            ],
            out_specs=[
                row_blk((Bb, Np)),
                any_spec,  # span-streamed clause-axis output
                any_spec,
                row_blk((Bb, 1)),  # sat ("rhs"/"fixed") or error ("second")
            ],
            scratch_shapes=[
                pltpu.VMEM((2, plan.max_group_rows, SPAN), mm_dtype),
                pltpu.VMEM((2, channels, Bb, SPAN), jnp.float32),
                pltpu.VMEM((Bb, Np), mm_dtype),
                pltpu.VMEM((Bb, Np), jnp.float32),
                pltpu.VMEM((Kmax, Bb, SPAN), jnp.float32),
                pltpu.VMEM((Bb, 1), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2 * n_read,)),  # span reads
                pltpu.SemaphoreType.DMA((4,)),  # span writes
            ],
        )
        # "fixed"/"second" write the updated clause state in place over
        # the xs/xl operands (safe: each span is read exactly once,
        # strictly before its write DMA starts) — without the alias the
        # scan carry forces XLA to copy both (B, Mp) outputs back into
        # the carry buffers every step (measured 0.5 ms/step at
        # B=4096, Mp=6528). Alias indices count the scalar-prefetch
        # operand: xs is operand 1 (v) + n_scalar_rows + 1.
        aliases = (
            {}
            if mode == "rhs"
            else {1 + n_scalar_rows + 1: 1, 1 + n_scalar_rows + 2: 2}
        )
        return pallas_call_32bit(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((B, Np), jnp.float32),
                jax.ShapeDtypeStruct((B, Mp), jnp.float32),
                jax.ShapeDtypeStruct((B, Mp), jnp.float32),
                jax.ShapeDtypeStruct((B, 1), jnp.float32),
            ],
            input_output_aliases=aliases,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=_VMEM_BUDGET + 32 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * B * R * SPAN,
                bytes_accessed=(B // Bb) * R * SPAN * itemsize
                + (n_read + 2) * B * Mp * 4,
                transcendentals=0,
            ),
        )(
            lo,
            v.astype(jnp.float32),
            *scalar_rows,
            *stream_ins,
            bias,
            cmask.reshape(1, Mp).astype(jnp.float32),
            planes.astype(mm_dtype),
        )

    return call


def make_stream_shard_rhs(
    plan: StreamShardPlan,
    zeta: float,
    ode,
    interpret: bool | None = None,
    traj_block: int | None = None,
):
    """Build ``rhs(v, xs, xl, planes, lo, bias, cmask) -> (dv, dxs, dxl,
    allsat)`` for ONE shard's local clause slice (runs inside shard_map;
    the caller psums dv and AND-reduces allsat over the clause axis).

    v: (B, Np) replicated over the clause axis; xs/xl: (B, Mp_local)
    the local shard segment; planes/lo/bias: this shard's slices of the
    plan arrays (leading shard axis already squeezed by shard_map).
    """
    call = _make_shard_call(mode="rhs", plan=plan, zeta=zeta, ode=ode,
                            interpret=interpret, traj_block=traj_block)

    def rhs(v, xs, xl, planes, lo, bias, cmask):
        dv, dxs, dxl, sat = call(v, (), (xs, xl), planes, lo, bias, cmask)
        return dv, dxs, dxl, sat.reshape(v.shape[0]) > 0.5

    return rhs


def make_fused_clause_step(
    fa,
    zeta: float,
    ode,
    clause_axis: str | None = None,
    interpret: bool | None = None,
    traj_block: int | None = None,
):
    """Build ``step(state, dev) -> state`` with the shard-local clamped
    xs/xl updates fused into the kernel epilogue — only the v update
    (the one consumer of the psum'd dv) and the (B,)-sized dt/done
    bookkeeping run in XLA. The per-clause independence that makes dv a
    pure segment-sum + all-reduce (reference walk: src/system.rs:35-90)
    makes the xs/xl memory updates entirely shard-local, so they never
    need to round-trip through XLA between kernel launches.

    Fixed mode is ONE launch per step (RHS + update); adaptive mode is
    two (the full-step derivatives, then the second evaluation at the
    half step) with the dv psum between them — the minimum without
    in-kernel ICI collectives. Integrator semantics match
    models/ode.py:make_step_fn exactly (freeze, no-advance-on-allsat,
    step-doubling error, dt clip)."""
    from odesat_tpu.constants import DT_MAX, DT_MIN, XL_CAP_PER_CLAUSE
    from odesat_tpu.models.ode import ODEState

    plan = fa.shard_plan
    if plan is None:
        raise ValueError("needs a compile_stream_sharded formula (shard plan)")
    if (
        ode.step_size is None
        and getattr(ode, "dt_mode", "per-trajectory") != "per-trajectory"
    ):
        # the fused step adapts dt per trajectory only; silently running
        # it for dt_mode='shared' would integrate with different dt
        # dynamics than the scan path / reference (src/system.rs:314)
        raise ValueError(
            "the clause-shard kernel supports per-trajectory dt only; "
            "dt_mode='shared' runs on the scan path"
        )
    xl_cap = XL_CAP_PER_CLAUSE * fa.n_clauses  # real clause count (src/system.rs:95)

    def reduce_dv_sat(dv, sat):
        allsat = sat.reshape(-1) > 0.5
        if clause_axis is not None:
            dv = jax.lax.psum(dv, clause_axis)
            allsat = jax.lax.psum((~allsat).astype(jnp.int32), clause_axis) == 0
        return dv, allsat

    if ode.step_size is not None:
        dt_fixed = float(ode.step_size)
        fixed_call = _make_shard_call(
            mode="fixed", plan=plan, zeta=zeta, ode=ode, interpret=interpret,
            traj_block=traj_block, xl_cap=xl_cap,
        )

        def step(state, dev):
            dt_eff = jnp.where(state.done, 0.0, dt_fixed).astype(state.v.dtype)
            dv, xs2, xl2, sat = fixed_call(
                state.v, (dt_eff[:, None],), (state.xs, state.xl),
                dev.planes[0], dev.span_lo[0], dev.span_bias[0], dev.clause_mask,
            )
            dv, allsat = reduce_dv_sat(dv, sat)
            v2 = jnp.fmin(jnp.fmax(state.v + dt_eff[:, None] * dv, -1.0), 1.0)
            return ODEState(v2, xs2, xl2, state.dt, state.done | allsat)

    else:
        tol = float(ode.tolerance)
        rhs_call = _make_shard_call(
            mode="rhs", plan=plan, zeta=zeta, ode=ode, interpret=interpret,
            traj_block=traj_block,
        )
        second_call = _make_shard_call(
            mode="second", plan=plan, zeta=zeta, ode=ode, interpret=interpret,
            traj_block=traj_block, xl_cap=xl_cap,
        )

        def step(state, dev):
            args = (dev.planes[0], dev.span_lo[0], dev.span_bias[0], dev.clause_mask)
            dv1, dxs1, dxl1, sat = rhs_call(
                state.v, (), (state.xs, state.xl), *args
            )
            dv1, allsat = reduce_dv_sat(dv1, sat)
            advance = ~state.done & ~allsat  # src/system.rs:122
            dt = state.dt
            dt_c = dt[:, None]
            half = 0.5 * dt_c
            fv = jnp.fmin(jnp.fmax(state.v + dt_c * dv1, -1.0), 1.0)
            hv = jnp.fmin(jnp.fmax(state.v + half * dv1, -1.0), 1.0)
            dv2, xs_fin, xl_fin, err_sl = second_call(
                hv,
                (dt_c, advance.astype(jnp.float32)[:, None]),
                (state.xs, state.xl, dxs1, dxl1),
                *args,
            )
            if clause_axis is not None:
                dv2 = jax.lax.psum(dv2, clause_axis)
            tv = jnp.fmin(jnp.fmax(hv + half * dv2, -1.0), 1.0)
            err = jnp.maximum(
                err_sl.reshape(-1), jnp.max(jnp.abs(fv - tv), axis=-1)
            )
            if clause_axis is not None:
                err = jax.lax.pmax(err, clause_axis)
            # err == 0 -> dt hits the ceiling (src/system.rs:132-135)
            new_dt = jnp.clip(
                dt * jnp.sqrt(tol / jnp.maximum(err, 1e-30)), DT_MIN, DT_MAX
            )
            v_fin = jnp.where(advance[:, None], tv, state.v)
            dt_fin = jnp.where(advance, new_dt, dt)
            return ODEState(v_fin, xs_fin, xl_fin, dt_fin, state.done | allsat)

    return step
