"""Shared utilities: configuration, checkpointing, logging/metrics."""

from odesat_tpu.utils.checkpoint import load_state, save_state
from odesat_tpu.utils.config import ODEConfig, SolverConfig, zeta_for_density
from odesat_tpu.utils.logging import Throughput, chunk_metrics, log_chunk, logger

__all__ = [
    "ODEConfig",
    "SolverConfig",
    "Throughput",
    "chunk_metrics",
    "load_state",
    "log_chunk",
    "logger",
    "save_state",
    "zeta_for_density",
]
