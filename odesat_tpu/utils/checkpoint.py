"""Solver-state checkpointing.

The reference persists nothing but the final assignment file
(reference: src/main.rs:196-199); SURVEY.md §5 recommends optional
snapshots of the scan carry between chunks as cheap insurance on long pod
runs. States are small (B x (N + 2M)), so a plain .npz is sufficient and
dependency-free; orbax is overkill for this shape of data.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np


def _atomic_savez(path: str, arrays: dict) -> None:
    """Write an .npz atomically (tmp file + rename)."""
    directory = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(directory, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as fh:
            np.savez(fh, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def save_state(path: str, state, steps: int) -> None:
    """Atomically snapshot a solver state NamedTuple (ODEState or
    StochState) plus the step counter. On a pod every process
    allgathers the global state (a collective — all must call) but only
    process 0 writes the file."""
    from odesat_tpu.parallel.dist import fetch, is_primary

    arrays = {f"field_{name}": fetch(value) for name, value in state._asdict().items()}
    arrays["steps"] = np.asarray(steps)
    arrays["fields"] = np.asarray(list(state._fields))
    if is_primary():
        _atomic_savez(path, arrays)


def load_state(path: str, state_cls):
    """Load a snapshot back into ``state_cls`` (ODEState or StochState).
    Returns (state, steps)."""
    with np.load(path, allow_pickle=False) as data:
        fields = [str(f) for f in data["fields"]]
        values = [data[f"field_{name}"] for name in fields]
        steps = int(data["steps"])
    return state_cls(*values), steps


def save_hybrid_state(path: str, ode_state, stoch_state, steps: int) -> None:
    """Snapshot the hybrid portfolio's two engine states into one file
    (field keys prefixed per engine; pod semantics as save_state)."""
    from odesat_tpu.parallel.dist import fetch, is_primary

    arrays = {f"ode_{k}": fetch(v) for k, v in ode_state._asdict().items()}
    arrays.update(
        {f"stoch_{k}": fetch(v) for k, v in stoch_state._asdict().items()}
    )
    arrays["steps"] = np.asarray(steps)
    arrays["ode_fields"] = np.asarray(list(ode_state._fields))
    arrays["stoch_fields"] = np.asarray(list(stoch_state._fields))
    if is_primary():
        _atomic_savez(path, arrays)


def load_hybrid_state(path: str, ode_cls, stoch_cls):
    """Load a hybrid snapshot. Returns (ode_state, stoch_state, steps)."""
    with np.load(path, allow_pickle=False) as data:
        if "ode_fields" not in data:
            raise ValueError(
                f"{path} is a single-engine snapshot, not a hybrid one"
            )
        ode = ode_cls(*[data[f"ode_{f}"] for f in (str(x) for x in data["ode_fields"])])
        stoch = stoch_cls(
            *[data[f"stoch_{f}"] for f in (str(x) for x in data["stoch_fields"])]
        )
        steps = int(data["steps"])
    return ode, stoch, steps
