"""One-command measurement runbook for the full TPU evidence refresh.

Round-3 retrospective: the backend outage left BENCH_r03.json at zero and
the "refresh runbook" existed only as a sentence in RESULTS.md. This file
IS the runbook — it lives in-repo, waits for the backend if asked, runs
the complete measurement set in dependency order, and writes both a
machine-readable summary and a RESULTS.md-ready markdown block.

Usage:
    python tools/measure_all.py [--wait] [--quick] [--skip soak,shard]

Sequence (each under its own timeout, logs under benchmarks/logs/):
  1. probe        — device enumeration + one jitted op (outage guard)
  2. cli drives   — solve/inter/stoch surface checks (verdicts must verify)
  3. soak         — tools/determinism_soak.py (DMA-race check; MANDATORY
                    before trusting any number from the chunk kernels)
  4. bench        — bench.py headline (hard.cnf fixed-step)
  5. suite        — benchmarks/run_benchmarks.py (writes results.json)
  6. tts          — tools/uf250_tts.py 20 4096 64 --exact (sub-chunk
                    steps-to-solution via final-chunk bisection)
  7. shard        — tools/bench_shard_stream.py (clause-shard overhead)
  8. roofline     — tools/roofline.py (per-config bound + limiter)

A step's nonzero exit is recorded, not fatal — later steps still run so
one flaky config can't blank the whole refresh. The summary calls out
every failed step loudly.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
PY = sys.executable


def probe(timeout_s: float = 600.0) -> bool:
    """True when the backend answers a jitted op within the timeout."""
    code = (
        "import jax, jax.numpy as jnp\n"
        "jax.jit(lambda a: a * 2 + 1)(jnp.ones((128, 128))).block_until_ready()\n"
        "print('TPU_OK')\n"
    )
    try:
        r = subprocess.run(
            [PY, "-c", code], timeout=timeout_s, capture_output=True, cwd=REPO
        )
    except subprocess.TimeoutExpired:
        return False
    return r.returncode == 0 and b"TPU_OK" in r.stdout


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--wait", action="store_true",
                    help="poll every 120s until the backend answers, then run")
    ap.add_argument("--quick", action="store_true",
                    help="pass --quick to the suite, shrink soak/tts")
    ap.add_argument("--skip", default="",
                    help="comma-separated step names to skip (e.g. soak,shard)")
    args = ap.parse_args()
    skip = {s.strip() for s in args.skip.split(",") if s.strip()}

    stamp = datetime.datetime.now(datetime.timezone.utc).strftime("%Y%m%dT%H%M%SZ")
    logdir = os.path.join(REPO, "benchmarks", "logs", stamp)
    os.makedirs(logdir, exist_ok=True)

    print(f"[measure_all] probing backend (logs -> {logdir})", flush=True)
    while not probe():
        if not args.wait:
            print("[measure_all] backend unreachable; rerun with --wait to poll",
                  file=sys.stderr)
            return 1
        print(f"[measure_all] {time.strftime('%H:%M:%S')} backend down; "
              "retrying in 120s", flush=True)
        time.sleep(120)
    print("[measure_all] backend OK", flush=True)

    q = args.quick
    steps = [
        # (name, timeout_s, argv)
        ("cli_solve_small", 900,
         [PY, "-m", "odesat_tpu", "solve", "-f", "tests/data/small.cnf",
          "-s", "0.01", "-n", "2000", "--seed", "0"]),
        ("cli_solve_easy", 900,
         [PY, "-m", "odesat_tpu", "solve", "-f", "tests/data/easy.cnf",
          "-n", "4000", "--seed", "1"]),
        ("cli_inter_hard", 900,
         [PY, "-m", "odesat_tpu", "inter", "-f", "tests/data/hard.cnf",
          "-b", "4", "-n", "300", "-s", "0.01"]),
        ("cli_stoch_small", 900,
         [PY, "-m", "odesat_tpu", "stoch", "-f", "tests/data/small.cnf",
          "-n", "2000", "-b", "8", "--seed", "3"]),
        ("soak", 3600,
         [PY, "tools/determinism_soak.py"] + (["--quick"] if q else [])),
        ("bench", 2400, [PY, "bench.py"]),
        ("suite", 7200,
         [PY, "benchmarks/run_benchmarks.py"] + (["--quick"] if q else [])),
        ("tts", 3600,
         [PY, "tools/uf250_tts.py", "5" if q else "20", "4096", "64",
          "--exact"]),
        ("shard", 3600, [PY, "tools/bench_shard_stream.py"]),
        ("roofline", 3600, [PY, "tools/roofline.py"]),
    ]

    summary: dict = {"stamp": stamp, "steps": {}}
    for name, tmo, argv in steps:
        if name in skip:
            summary["steps"][name] = {"rc": None, "skipped": True}
            print(f"[measure_all] SKIP {name}", flush=True)
            continue
        log = os.path.join(logdir, f"{name}.log")
        print(f"[measure_all] START {name} (timeout {tmo}s)", flush=True)
        t0 = time.perf_counter()
        with open(log, "wb") as fh:
            try:
                rc = subprocess.run(
                    argv, stdout=fh, stderr=subprocess.STDOUT,
                    timeout=tmo, cwd=REPO,
                ).returncode
            except subprocess.TimeoutExpired:
                rc = -9
        dt = time.perf_counter() - t0
        summary["steps"][name] = {"rc": rc, "seconds": round(dt, 1), "log": log}
        print(f"[measure_all] DONE  {name} rc={rc} ({dt:.0f}s)", flush=True)

    # --- pull headline artifacts into the summary ---------------------------
    bench_log = os.path.join(logdir, "bench.log")
    if os.path.exists(bench_log):
        with open(bench_log) as fh:
            for line in fh:
                line = line.strip()
                if line.startswith("{") and '"metric"' in line:
                    try:
                        summary["bench"] = json.loads(line)
                    except json.JSONDecodeError:
                        pass
    results_json = os.path.join(REPO, "benchmarks", "results.json")
    if os.path.exists(results_json):
        with open(results_json) as fh:
            summary["suite"] = json.load(fh)

    out_json = os.path.join(logdir, "summary.json")
    with open(out_json, "w") as fh:
        json.dump(summary, fh, indent=2)

    # --- RESULTS.md-ready block ---------------------------------------------
    lines = [f"### Measurement refresh {stamp} (tools/measure_all.py)", ""]
    failed = [n for n, s in summary["steps"].items()
              if s.get("rc") not in (0, None)]
    if failed:
        lines.append(f"**FAILED steps: {', '.join(failed)}** — see logs; "
                     "numbers below them are stale.")
        lines.append("")
    if "bench" in summary:
        b = summary["bench"]
        lines.append(f"- headline: **{b['value']:.4g} {b['unit']}** "
                     f"({b['vs_baseline']}x baseline) — {b['metric']}")
    if "suite" in summary:
        lines.append("")
        lines.append("| config | value | unit |")
        lines.append("|---|---|---|")
        for key, cfg in summary["suite"].get("configs", {}).items():
            for field in ("traj_steps_per_sec", "chain_steps_per_sec"):
                if field in cfg:
                    lines.append(f"| {key} | {cfg[field]:.4g} | {field} |")
            if "median_wall_s" in cfg:
                lines.append(f"| {key} | {cfg['median_wall_s']:.3f} | median_wall_s |")
    block = "\n".join(lines) + "\n"
    out_md = os.path.join(logdir, "summary.md")
    with open(out_md, "w") as fh:
        fh.write(block)
    print(block)
    print(f"[measure_all] summary: {out_json}\n[measure_all] markdown: {out_md}")
    return 2 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
