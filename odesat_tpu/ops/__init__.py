"""Device compute ops: the fused ODE right-hand side (jnp and Pallas
variants), per-variable accumulation strategies, and the NumPy oracle
transcription of the reference kernel used as the test ground truth."""

from odesat_tpu.ops.rhs import (
    accumulate_dv_gather,
    accumulate_dv_onehot,
    accumulate_dv_segment,
    build_onehot,
    clause_values,
    compute_derivatives,
    top2_min,
)

__all__ = [
    "accumulate_dv_gather",
    "accumulate_dv_onehot",
    "accumulate_dv_segment",
    "build_onehot",
    "clause_values",
    "compute_derivatives",
    "top2_min",
]
