"""ctypes bindings for the native host runtime (odesat_native.cc).

Builds the shared library on first use with g++ (no pip deps); every
entry point has a pure-Python fallback in odesat_tpu.cnf /
odesat_tpu.preprocess, so the package works without a compiler. Parity
between the two implementations is enforced by tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from odesat_tpu.cnf.formula import CNFFormula, Literal
from odesat_tpu.preprocess.trace import (
    BlockedClauseElimination,
    SimplificationTrace,
    VariableElimination,
)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "odesat_native.cc")
_SO = os.path.join(_HERE, "libodesat_native.so")
_STAMP = _SO + ".provenance.json"
_lock = threading.Lock()
_lib = None
_lib_error = None


def _src_sha256() -> str:
    import hashlib

    with open(_SRC, "rb") as fh:
        return hashlib.sha256(fh.read()).hexdigest()


def _build() -> None:
    """Compile the library from the committed source and record its
    provenance (source hash + exact compiler invocation) next to it.
    The binary itself is never committed — it is always built from
    odesat_native.cc on the host that runs it, so there is no opaque
    artifact for a reviewer to trust."""
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-pthread",
        "-o",
        _SO,
        _SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    import json

    compiler = subprocess.run(
        ["g++", "--version"], check=False, capture_output=True, text=True
    ).stdout.splitlines()[:1]
    with open(_STAMP, "w") as fh:
        json.dump(
            {"source_sha256": _src_sha256(), "cmd": cmd, "compiler": compiler},
            fh,
            indent=2,
        )


def _stamp_current() -> bool:
    """True when the existing .so was built from the current source
    (hash-stamped; mtimes are unreliable across git checkouts)."""
    import json

    try:
        with open(_STAMP) as fh:
            return json.load(fh).get("source_sha256") == _src_sha256()
    except (OSError, ValueError):
        return False


def _load():
    global _lib, _lib_error
    with _lock:
        if _lib is not None or _lib_error is not None:
            return _lib
        try:
            if not os.path.exists(_SO) or not _stamp_current():
                _build()
            lib = ctypes.CDLL(_SO)
        except Exception as e:  # noqa: BLE001 — any failure => Python fallback
            _lib_error = e
            return None

        lib.odesat_free.argtypes = [ctypes.c_void_p]
        lib.odesat_parse_dimacs.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.odesat_preprocess.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.odesat_baseline_steps_per_sec.restype = ctypes.c_double
        lib.odesat_baseline_steps_per_sec.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.c_uint64,
        ]
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def _encode(formula: CNFFormula):
    """Formula -> (flat encoded literals, offsets). lit = (var<<1)|neg."""
    clauses = formula.clauses
    lits = [(lit.variable << 1) | lit.is_negated for c in clauses for lit in c]
    offsets = np.zeros(len(clauses) + 1, dtype=np.int64)
    np.cumsum([len(c) for c in clauses], out=offsets[1:])
    return np.asarray(lits, dtype=np.int32), offsets


def _decode(lits: np.ndarray, offsets: np.ndarray, varnum: int) -> CNFFormula:
    # Interned decode: only <= 2*varnum distinct literals exist, so build
    # each Literal once (the per-element construction was ~0.6 s of the
    # n=10k preprocess), intern ALL literals in one map pass, and carve
    # the clause tuples off a single iterator with islice — per-clause
    # list slicing was another ~0.1 s at 60k clauses.
    from itertools import islice, repeat, starmap

    lits_l = lits.tolist()
    lut = {e: Literal(e >> 1, bool(e & 1)) for e in set(lits_l)}
    mapped = iter(list(map(lut.__getitem__, lits_l)))
    widths = np.diff(offsets).tolist()
    clauses = list(map(tuple, starmap(islice, zip(repeat(mapped), widths))))
    return CNFFormula(clauses, varnum)


def _take_i32(lib, ptr, n) -> np.ndarray:
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy() if n else np.empty(0, np.int32)
    lib.odesat_free(ptr)
    return arr


def parse_dimacs_native(text: str) -> CNFFormula:
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_lib_error}")
    data = text.encode("utf-8")
    lits_p = ctypes.POINTER(ctypes.c_int32)()
    offs_p = ctypes.POINTER(ctypes.c_int64)()
    n_clauses = ctypes.c_int64()
    varnum = ctypes.c_int64()
    rc = lib.odesat_parse_dimacs(
        data, len(data), ctypes.byref(lits_p), ctypes.byref(offs_p),
        ctypes.byref(n_clauses), ctypes.byref(varnum),
    )
    if rc != 0:
        raise ValueError(f"native DIMACS parse failed (rc={rc})")
    m = n_clauses.value
    offsets = np.ctypeslib.as_array(offs_p, shape=(m + 1,)).copy()
    lib.odesat_free(offs_p)
    lits = _take_i32(lib, lits_p, int(offsets[-1]))
    formula = _decode(lits, offsets, varnum.value)
    if varnum.value < 0:  # no header: count used variables (reference fallback)
        formula.varnum = len(formula.variable_set())
    return formula


def _decode_trace(blob: bytes) -> SimplificationTrace:
    """The blob is an all-u32 little-endian stream (odesat_native.cc
    Pre::trace_u32): per step `kind, var, n_clauses, {len, lits...}*`.
    Decoded via one np.frombuffer + a list walk with interned Literals —
    the per-field byte walk this replaces was ~0.36 s of the n=10k
    preprocess."""
    w = np.frombuffer(blob, dtype="<u4").tolist()
    trace = SimplificationTrace()
    lut: dict = {}

    def lit(e):
        lo = lut.get(e)
        if lo is None:
            lo = lut[e] = Literal(e >> 1, bool(e & 1))
        return lo

    pos = 0
    end = len(w)
    while pos < end:
        kind, var, n_clauses = w[pos], w[pos + 1], w[pos + 2]
        pos += 3
        clauses = []
        for _ in range(n_clauses):
            n = w[pos]
            pos += 1
            clauses.append(frozenset(map(lit, w[pos : pos + n])))
            pos += n
        if kind == 0:
            trace.add(VariableElimination(var, frozenset(clauses)))
        else:
            (only,) = clauses
            trace.add(BlockedClauseElimination(var, only))
    return trace


def preprocess_native(formula: CNFFormula, target_ratio: float = 7.0):
    """Native preprocessing; same deterministic semantics as
    odesat_tpu.preprocess.preprocess_formula (parity-tested)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_lib_error}")
    lits, offsets = _encode(formula)
    out_lits = ctypes.POINTER(ctypes.c_int32)()
    out_offs = ctypes.POINTER(ctypes.c_int64)()
    out_m = ctypes.c_int64()
    out_varnum = ctypes.c_int64()
    trace_p = ctypes.POINTER(ctypes.c_uint8)()
    trace_len = ctypes.c_int64()
    rc = lib.odesat_preprocess(
        lits.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        formula.num_clauses,
        formula.varnum,
        float(target_ratio),
        ctypes.byref(out_lits),
        ctypes.byref(out_offs),
        ctypes.byref(out_m),
        ctypes.byref(out_varnum),
        ctypes.byref(trace_p),
        ctypes.byref(trace_len),
    )
    if rc != 0:
        raise ValueError(f"native preprocess failed (rc={rc})")
    m = out_m.value
    offs = np.ctypeslib.as_array(out_offs, shape=(m + 1,)).copy()
    lib.odesat_free(out_offs)
    flat = _take_i32(lib, out_lits, int(offs[-1]))
    blob = bytes(np.ctypeslib.as_array(trace_p, shape=(trace_len.value,)).copy()) if trace_len.value else b""
    lib.odesat_free(trace_p)
    return _decode(flat, offs, out_varnum.value), _decode_trace(blob)


def baseline_steps_per_sec(
    formula: CNFFormula, steps: int = 20000, dt: float = 0.01, zeta: float = 0.001, seed: int = 1
) -> float:
    """Single-core CPU ODE throughput (steps/s) on a *normalized* formula —
    the measured stand-in for the unrunnable Rust reference."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_lib_error}")
    lits, offsets = _encode(formula)
    return lib.odesat_baseline_steps_per_sec(
        lits.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        formula.num_clauses,
        formula.varnum,
        steps,
        dt,
        zeta,
        seed,
    )
