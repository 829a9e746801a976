"""Multi-host initialization glue.

The reference has no distributed anything (SURVEY.md §2b); on a TPU pod
slice the TPU-native equivalent is ``jax.distributed.initialize`` +
a global mesh whose ``traj`` axis spans hosts. Trajectory parallelism
needs no cross-host communication inside the step — only the
between-chunk done-flag reduce rides DCN — so scaling across hosts is
embarrassingly parallel. Clause sharding should stay *within* a host's
ICI domain; ``make_pod_mesh`` lays the mesh out accordingly.

Tested for real in tests/test_multihost.py: two coordinated CPU
processes (`jax.distributed.initialize` with an explicit coordinator)
build the pod mesh, run a sharded solve chunk over the global mesh, and
assert parity with the single-process result.
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
    initialization_timeout: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. No-ops when running single-process
    (all arguments None and no cluster env detected).

    Only the *absence of a detectable cluster* is swallowed (ValueError:
    "coordinator_address should be defined" / RuntimeError from cluster
    autodetection). A real cluster misconfiguration — wrong address,
    handshake failure — propagates instead of silently degrading to
    single-process (round-1 ADVICE)."""
    if coordinator_address is None and num_processes is None and process_id is None:
        try:
            jax.distributed.initialize()  # cluster auto-detection (TPU pods)
        except (ValueError, RuntimeError) as e:
            msg = str(e)
            if (
                "coordinator_address" in msg  # no cluster env detected
                or "must be called before" in msg  # backend already up, single-process
            ):
                return  # single-process
            raise
    else:
        kwargs = {}
        if initialization_timeout is not None:
            kwargs["initialization_timeout"] = initialization_timeout
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
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
