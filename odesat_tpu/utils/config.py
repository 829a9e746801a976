"""Solver configuration.

The reference keeps all knobs as clap CLI flags and in-code constants
(reference: src/main.rs:31-141, src/system.rs:19-23,164-174); here they
are dataclasses so library users, the CLI, and tests share one config
surface. Field names mirror the reference flags (`-t` tolerance, `-n`
steps, `-s` step_size, `-l` learning_rate/zeta, `-r` ctv_ratio, `-b`
batch_size) plus TPU-specific knobs.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Optional


def zeta_for_density(density: float) -> float:
    """Learning-rate table keyed on clause-to-variable density
    (reference: src/system.rs:164-173)."""
    if density >= 6.0:
        return 0.1
    if density >= 4.9:
        return 0.01
    return 0.001


@dataclass(frozen=True)
class ODEConfig:
    """Knobs of the ODE engine itself (reference layer L2)."""

    tolerance: float = 1e-3  # adaptive error tolerance (src/system.rs:174)
    step_size: Optional[float] = None  # fixed dt; None => adaptive (src/main.rs:49-51)
    steps: Optional[int] = None  # step budget; None => unbounded
    zeta: Optional[float] = None  # learning rate; None => density table
    rigidity: str = "paper"  # "paper" (argmin gate) | "reference" (exact-zero gate), SURVEY.md §2a
    dtype: str = "float32"  # "float32" | "float64" (reference is f64; TPU wants f32)
    # per-variable derivative accumulation:
    #   "auto"        - fused on TPU when the formula supports it, else gather
    #   "gather"      - variable-major gather+sum (any formula)
    #   "segment_sum" - scatter-add baseline
    #   "onehot"      - MXU matmul against the one-hot incidence
    #   "pallas"      - fused single-step Pallas kernel (onehot-based)
    #   "fused"       - multi-step Pallas chunk kernel, state in VMEM
    #                   (12-14x the scan path on v5e for small/medium CNFs)
    #   "stream"      - multi-step Pallas chunk kernel with the incidence
    #                   planes + clause memories streamed from HBM
    #                   (large CNFs the resident kernel can't hold; ~5x
    #                   the bucketed gather path on preprocessed n=1k)
    dv_strategy: str = "auto"
    # fused-kernel matmul input precision: "float32" (exact parity) or
    # "bfloat16" (2x MXU throughput, halves the incidence VMEM footprint;
    # trajectories diverge at ~1e-3 relative — solutions are still
    # oracle-verified, so only time-to-solution statistics can shift)
    matmul_dtype: str = "float32"
    # adaptive-dt coupling across the trajectory batch:
    #   "per-trajectory" - each trajectory carries its own dt (the
    #                      paper's intent; the only design that vmaps)
    #   "shared"         - one dt for the whole batch, adapted from the
    #                      max error norm over all trajectories — the
    #                      parallel analog of the reference inter mode's
    #                      single shared dt (src/system.rs:262-272,314;
    #                      the reference threads one dt *sequentially*
    #                      through trajectories, which cannot vmap — the
    #                      batch-max is the faithful SPMD rendering)
    dt_mode: str = "per-trajectory"
    # clause-mesh whole-chunk kernel with the dv all-reduce done INSIDE
    # the kernel via Pallas remote DMA over ICI (ops/shard_chunk.py) —
    # needs a power-of-two clause axis.
    #   "auto" - pick each engine's measured winner for the plan's
    #            per-shard plane size: always the whole-chunk kernel for
    #            the ODE (wins 1.10-1.11x at S=1 across the measured
    #            bracket), large-plane regimes only for stoch
    #            (ops/shard_chunk.resolve_shard_chunk, brackets from
    #            tools/bracket_shard_chunk.py)
    #   "on"   - force the whole-chunk kernel (errors if ineligible)
    #   "off"  - force the per-step launch path
    # Legacy bools are accepted (True -> "on", False -> "off"). The
    # multi-chip collective is interpret-validated on the CPU mesh and
    # AOT-compiled for mock pod topologies (tools/aot_collective.py);
    # first hardware runs self-check via the cross-shard consistency
    # assertion (RESULTS.md known gap #0).
    shard_chunk: str | bool = "auto"

    def resolve_zeta(self, density: float) -> float:
        return self.zeta if self.zeta is not None else zeta_for_density(density)


@dataclass(frozen=True)
class SolverConfig:
    """End-to-end solve configuration (CLI surface + runtime knobs)."""

    ode: ODEConfig = field(default_factory=ODEConfig)
    ctv_ratio: float = 7.0  # preprocessing target ratio (src/main.rs:150-154)
    preprocess: bool = True  # solve/stoch preprocess; batch/inter don't (src/main.rs:269,341)
    batch_size: int = 1  # trajectories per solve
    seed: Optional[int] = None  # None => nondeterministic (reference uses thread_rng)
    chunk_steps: int = 256  # scan steps per device dispatch (early-exit granularity)
    var_pad: int = 128
    clause_pad: int = 128
    # width bucketing of the clause axis ("auto" | "on" | "off"): group
    # clauses by width so mixed-width formulas (preprocessing emits wide
    # resolvents) don't pay max clause width on every clause
    bucket: str = "auto"
    # order clauses (within width buckets) by lowest variable so the
    # streaming kernel's per-span variable windows tighten on
    # locally-structured instances (encoder-numbered CNFs): measured 10x
    # plane-size cut on locality-256 n=4096 random 3-SAT. Clause order is
    # an internal layout choice — harmless for every other path.
    window_sort: bool = True
    checkpoint_path: Optional[str] = None  # optional state snapshot between chunks
    checkpoint_every_chunks: int = 0  # 0 => disabled
    resume_from: Optional[str] = None  # resume a solve from a snapshot (.npz)
    profile_dir: Optional[str] = None  # jax.profiler trace output
    log_every_chunks: int = 0  # 0 => no periodic progress logs
    wall_clock_budget_s: Optional[float] = None  # stop unbounded runs after this

    def with_ode(self, **kwargs) -> "SolverConfig":
        return replace(self, ode=replace(self.ode, **kwargs))

    def wants_chunk_cadence(self) -> bool:
        """True when the user asked for per-chunk side effects at a fixed
        interval — checkpoint cadence (only live when a path is set; the
        save branch requires both) or periodic logging. Shared by the
        chunk-escalation gate (models/loop.py) and the on-device
        multi-chunk loop gate (models/ode.py) so the two never drift."""
        return bool(
            (self.checkpoint_every_chunks and self.checkpoint_path)
            or self.log_every_chunks
        )
