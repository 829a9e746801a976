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


def mesh_layout_of(mesh) -> tuple:
    """(n_traj, n_clause) of a ('traj', 'clause') mesh; (1, 1) for none."""
    if mesh is None:
        return (1, 1)
    return (mesh.shape.get("traj", 1), mesh.shape.get("clause", 1))


def validate_mesh_layout(
    saved, mesh, what: str = "snapshot", traj_sensitive: bool = True
) -> None:
    """Reject a resume whose mesh layout differs from the snapshot's.

    The clause axis changes the compiled formula layout itself
    (compile_for_mesh reorders/re-pads clauses for the shard plan), so a
    mismatched resume would feed clause memories in the wrong order —
    silently wrong dynamics when the padded shapes happen to coincide.
    ``saved`` is None for snapshots written before layouts were recorded;
    those fall back to the caller's key-shape checks.

    ``traj_sensitive=False`` (pure-ODE resumes): the trajectory axis is
    plain data parallelism — it never reorders state, so an ODE snapshot
    may legally reshard onto a different --devices count and only the
    clause component is enforced. The stoch engine's per-device key
    layout (and therefore hybrid snapshots) genuinely depends on the
    traj width, so those keep the full check."""
    if saved is None:
        return
    cur = mesh_layout_of(mesh)
    saved = (int(saved[0]), int(saved[1]))
    if (traj_sensitive and saved != cur) or saved[1] != cur[1]:
        axes = "" if traj_sensitive else " clause axis of the"
        raise ValueError(
            f"cannot resume this {what}: it was taken on a "
            f"(traj={saved[0]}, clause={saved[1]}) mesh but this run uses "
            f"(traj={cur[0]}, clause={cur[1]}); resume with the same"
            f"{axes} --devices/--clause-shards layout"
        )


def save_state(path: str, state, steps: int, mesh_layout=None) -> None:
    """Atomically snapshot a solver state NamedTuple (ODEState or
    StochState) plus the step counter. On a pod every process
    allgathers the global state (a collective — all must call) but only
    process 0 writes the file."""
    from odesat_tpu.parallel.dist import fetch, is_primary

    arrays = {f"field_{name}": fetch(value) for name, value in state._asdict().items()}
    arrays["steps"] = np.asarray(steps)
    arrays["fields"] = np.asarray(list(state._fields))
    if mesh_layout is not None:
        arrays["mesh_layout"] = np.asarray(mesh_layout)
    if is_primary():
        _atomic_savez(path, arrays)


def load_state(path: str, state_cls):
    """Load a snapshot back into ``state_cls`` (ODEState or StochState).
    Returns (state, steps, mesh_layout) — mesh_layout is None for
    snapshots written before layouts were recorded."""
    with np.load(path, allow_pickle=False) as data:
        if "fields" not in data:
            kind = "hybrid" if "ode_fields" in data else "unrecognized"
            raise ValueError(
                f"{path} is a {kind} snapshot, not a single-engine one; "
                "resume it with the mode that wrote it"
            )
        fields = [str(f) for f in data["fields"]]
        if fields != list(state_cls._fields):
            raise ValueError(
                f"{path} holds a snapshot with fields {fields}, which do "
                f"not match {state_cls.__name__}{list(state_cls._fields)}; "
                "resume it with the engine that wrote it"
            )
        values = [data[f"field_{name}"] for name in fields]
        steps = int(data["steps"])
        layout = tuple(data["mesh_layout"]) if "mesh_layout" in data else None
    return state_cls(*values), steps, layout


def save_hybrid_state(
    path: str, ode_state, stoch_state, steps: int, mesh_layout=None
) -> None:
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
    if mesh_layout is not None:
        arrays["mesh_layout"] = np.asarray(mesh_layout)
    if is_primary():
        _atomic_savez(path, arrays)


def load_hybrid_state(path: str, ode_cls, stoch_cls):
    """Load a hybrid snapshot. Returns (ode_state, stoch_state, steps,
    mesh_layout) — mesh_layout is None for pre-layout snapshots."""
    with np.load(path, allow_pickle=False) as data:
        if "ode_fields" not in data:
            raise ValueError(
                f"{path} is a single-engine snapshot, not a hybrid one"
            )
        # same fields-vs-class check load_state does: a cross-version or
        # corrupted file must fail with this message, not a raw KeyError
        for key, cls in (("ode_fields", ode_cls), ("stoch_fields", stoch_cls)):
            fields = [str(f) for f in data[key]]
            if fields != list(cls._fields):
                raise ValueError(
                    f"{path} holds a hybrid snapshot whose {key} {fields} "
                    f"do not match {cls.__name__}{list(cls._fields)}; "
                    "resume it with the engine version that wrote it"
                )
        ode = ode_cls(*[data[f"ode_{f}"] for f in (str(x) for x in data["ode_fields"])])
        stoch = stoch_cls(
            *[data[f"stoch_{f}"] for f in (str(x) for x in data["stoch_fields"])]
        )
        steps = int(data["steps"])
        layout = tuple(data["mesh_layout"]) if "mesh_layout" in data else None
    return ode, stoch, steps, layout
