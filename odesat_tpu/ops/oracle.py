"""NumPy transcription of the reference derivative kernel — the test oracle.

This is a direct, scalar-loop transcription of the reference's
``compute_derivatives`` / ``update_state`` / ``max_error``
(reference: src/system.rs:25-109), kept deliberately naive and host-only.
It exists so the fused XLA/Pallas RHS can be property-tested against the
reference semantics (SURVEY.md §4: "derivative kernel vs. a
straightforward NumPy oracle ... both rigidity variants").
"""

from __future__ import annotations

import numpy as np

from odesat_tpu.cnf.formula import CNFFormula
from odesat_tpu.constants import ALPHA, BETA, DELTA, EPSILON, GAMMA


def compute_derivatives_oracle(
    v: np.ndarray,
    xs: np.ndarray,
    xl: np.ndarray,
    formula: CNFFormula,
    zeta: float,
    rigidity: str = "reference",
):
    """Scalar-loop RHS. Returns (dv, dxs, dxl, allsat)."""
    dv = np.zeros_like(v)
    dxs = np.zeros_like(xs)
    dxl = np.zeros_like(xl)
    allsat = True

    for m, clause in enumerate(formula.clauses):
        # running min / second-min scan (src/system.rs:43-57)
        mn = np.inf
        mn2 = np.inf
        entries = []
        for lit in clause:
            q = -1.0 if lit.is_negated else 1.0
            value = 1.0 - q * v[lit.variable]
            if value < mn:
                mn2 = mn
                mn = value
            elif value < mn2:
                mn2 = value
            entries.append((lit.variable, value, q))

        c_m = 0.5 * mn
        for i, value, q in entries:
            g = 0.5 * q * (mn if value != mn else mn2)
            if rigidity == "reference":
                gate = c_m == (1.0 - q * v[i])  # src/system.rs:73
            else:  # paper: literal attains the min
                gate = value == mn
            r = 0.5 * (q - v[i]) if gate else 0.0
            dv[i] += xl[m] * xs[m] * g + (1.0 + zeta * xl[m]) * (1.0 - xs[m]) * r

        dxs[m] = BETA * (xs[m] + EPSILON) * (c_m - GAMMA)
        dxl[m] = ALPHA * (c_m - DELTA)
        allsat = allsat and (c_m < GAMMA)

    return dv, dxs, dxl, allsat


def update_state_oracle(v, xs, xl, dv, dxs, dxl, dt, n_clauses):
    """Clamped Euler update (src/system.rs:93-97). np.fmax/fmin replicate
    Rust f64::max/min NaN-ignoring clamp semantics."""
    xs = np.fmin(np.fmax(xs + dt * dxs, EPSILON), 1.0 - EPSILON)
    xl = np.fmin(np.fmax(xl + dt * dxl, 1.0), 1e4 * n_clauses)
    v = np.fmin(np.fmax(v + dt * dv, -1.0), 1.0)
    return v, xs, xl


def max_error_oracle(a, b):
    """Inf-norm of state difference over (v, xs, xl) (src/system.rs:100-109)."""
    return max(
        float(np.max(np.abs(a[0] - b[0]))),
        float(np.max(np.abs(a[1] - b[1]))),
        float(np.max(np.abs(a[2] - b[2]))),
    )
