"""Determinism soak on the real chip: every Pallas kernel must produce
bit-identical states across repeated same-seed runs.

The kernels hand-schedule DMA (double-buffered plane streams, span
read/write pipelines); a missed semaphore wait shows up as run-to-run
nondeterminism long before it corrupts a verdict. Interpret mode cannot
catch these races — this soak is the hardware check, re-run after any
kernel DMA change.

    python tools/determinism_soak.py [repeats]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import numpy as np

from odesat_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from odesat_tpu.cnf import compile_formula, normalize_cnf_variables, parse_dimacs_file
from odesat_tpu.models.ode import formula_device, init_state
from odesat_tpu.models.stoch import init_stoch_state
from odesat_tpu.utils.config import ODEConfig
from odesat_tpu.utils.generate import random_ksat
from odesat_tpu.utils.timing import sync

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def run_repeats(name, make_state, runner, repeats, fields):
    ref = None
    for r in range(repeats):
        state = make_state()
        out = runner(state)
        sync(out)
        snap = {f: np.asarray(getattr(out, f)).copy() for f in fields}
        if ref is None:
            ref = snap
        else:
            for f in fields:
                if not np.array_equal(ref[f], snap[f]):
                    diff = np.abs(ref[f].astype(np.float64) - snap[f].astype(np.float64))
                    print(f"FAIL {name}: field {f} differs at repeat {r} "
                          f"(max {diff.max():.3e})")
                    return False
    print(f"OK   {name}: {repeats} repeats bit-identical")
    return True


def main():
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    ok = True

    formula = parse_dimacs_file(os.path.join(HERE, "tests", "data", "hard.cnf"))
    _, aim = normalize_cnf_variables(formula)
    fa_aim = compile_formula(aim)

    big = random_ksat(900, 3870, k=3, seed=5, planted=True)
    _, bignorm = normalize_cnf_variables(big)
    fa_big = compile_formula(bignorm, bucket=True, window_sort=True)

    for mode, kwargs in (("fixed", dict(step_size=0.01)), ("adaptive", dict(tolerance=1e-3))):
        ode = ODEConfig(matmul_dtype="bfloat16", **kwargs)

        from odesat_tpu.ops.fused_pallas import make_fused_chunk

        fn = make_fused_chunk(fa_aim, 0.001, ode, 2000)
        ok &= run_repeats(
            f"fused/{mode} (aim100, 2000 steps)",
            lambda: init_state(fa_aim, 2048, jax.random.PRNGKey(7), ode),
            fn,
            repeats,
            ("v", "xs", "xl", "dt", "done"),
        )

        from odesat_tpu.ops.stream_pallas import make_stream_chunk

        fn = make_stream_chunk(fa_big, 0.001, ode, 500)
        ok &= run_repeats(
            f"stream/{mode} (n=900, 500 steps)",
            lambda: init_state(fa_big, 512, jax.random.PRNGKey(7), ode),
            fn,
            repeats,
            ("v", "xs", "xl", "dt", "done"),
        )

        from odesat_tpu.ops.shard_stream import (
            compile_stream_sharded,
            make_single_device_runner,
        )

        fa_sh, _ = compile_stream_sharded(bignorm, 1)
        dev_sh = formula_device(fa_sh, matmul_dtype="bfloat16")
        fn = make_single_device_runner(fa_sh, 0.001, ode, 200)
        ok &= run_repeats(
            f"shard-stream/{mode} (n=900, 200 steps)",
            lambda: init_state(fa_sh, 256, jax.random.PRNGKey(7), ode),
            lambda st: fn(st, dev_sh),
            repeats,
            ("v", "xs", "xl", "dt", "done"),
        )

    from odesat_tpu.ops.stoch_pallas import make_fused_stoch_chunk, make_stream_stoch_chunk

    sfn = make_fused_stoch_chunk(fa_aim, 2000, matmul_dtype="bfloat16")
    ok &= run_repeats(
        "stoch-fused (aim100, 2000 steps)",
        lambda: init_stoch_state(fa_aim, 2048, jax.random.PRNGKey(7)),
        sfn,
        repeats,
        ("v", "xl", "done"),
    )
    sfn = make_stream_stoch_chunk(fa_big, 500, matmul_dtype="bfloat16")
    ok &= run_repeats(
        "stoch-stream (n=900, 500 steps)",
        lambda: init_stoch_state(fa_big, 512, jax.random.PRNGKey(7)),
        sfn,
        repeats,
        ("v", "xl", "done"),
    )

    print("SOAK", "PASSED" if ok else "FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
