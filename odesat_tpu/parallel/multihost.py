"""Multi-host initialization glue.

The reference has no distributed anything (SURVEY.md §2b); on a TPU pod
slice the TPU-native equivalent is ``jax.distributed.initialize`` +
a global mesh whose ``traj`` axis spans hosts. Trajectory parallelism
needs no cross-host communication inside the step — only the
between-chunk done-flag reduce rides DCN — so scaling across hosts is
embarrassingly parallel. Clause sharding should stay *within* a host's
ICI domain; ``make_pod_mesh`` lays the mesh out accordingly.

This module is exercised only single-process in this environment (no
multi-host hardware); it is the documented, tested-by-construction entry
point for pod runs.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. No-ops when running single-process
    (all arguments None and no cluster env detected)."""
    if coordinator_address is None and num_processes is None and process_id is None:
        try:
            jax.distributed.initialize()  # cluster auto-detection (TPU pods)
        except Exception:  # noqa: BLE001 — single-process fallback
            return
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_pod_mesh(n_clause: int = 1) -> Mesh:
    """Global ('traj', 'clause') mesh over every device in the job.

    The clause axis is filled from devices of the same process first so
    its psum collectives ride ICI; the traj axis spans the rest
    (including host boundaries — fine, it never communicates inside the
    step)."""
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    if len(devices) % n_clause != 0:
        raise ValueError(f"{len(devices)} devices not divisible by clause={n_clause}")
    grid = np.asarray(devices).reshape(len(devices) // n_clause, n_clause)
    return Mesh(grid, axis_names=("traj", "clause"))
