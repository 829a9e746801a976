"""Solver engines: the continuous-time ODE engine (reference layer L2,
src/system.rs) and the stochastic discrete local-search engine
(reference layer L3, src/stoch.rs), both batched and jitted."""

from odesat_tpu.models import ode, stoch
from odesat_tpu.models.ode import (
    ODEState,
    SolveResult,
    init_state,
    make_chunk_runner,
    make_step_fn,
    simulate,
    simulate_batch,
)
from odesat_tpu.models.stoch import StochResult, StochState, search

__all__ = [
    "ODEState",
    "SolveResult",
    "StochResult",
    "StochState",
    "init_state",
    "make_chunk_runner",
    "make_step_fn",
    "ode",
    "search",
    "simulate",
    "simulate_batch",
    "stoch",
]
