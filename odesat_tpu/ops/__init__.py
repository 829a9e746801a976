"""Device compute ops: the fused ODE right-hand side (jnp and Pallas
variants), per-variable accumulation strategies, and the NumPy oracle
transcription of the reference kernel used as the test ground truth."""

from odesat_tpu.ops.fused_pallas import fused_supported, make_fused_chunk
from odesat_tpu.ops.rhs import (
    accumulate_dv_gather,
    accumulate_dv_onehot,
    accumulate_dv_segment,
    build_onehot,
    clause_values,
    compute_derivatives,
    top2_min,
)
from odesat_tpu.ops.rhs_pallas import make_pallas_rhs
from odesat_tpu.ops.stoch_pallas import make_fused_stoch_chunk, stoch_fused_supported

__all__ = [
    "accumulate_dv_gather",
    "accumulate_dv_onehot",
    "accumulate_dv_segment",
    "build_onehot",
    "clause_values",
    "compute_derivatives",
    "fused_supported",
    "make_fused_chunk",
    "make_fused_stoch_chunk",
    "make_pallas_rhs",
    "stoch_fused_supported",
    "top2_min",
]
