"""bench.py backend-outage guard.

The tunnel-backed TPU platform hangs device enumeration indefinitely
during a backend outage; bench.py must fail fast with an honest JSON
error line instead of hanging the driver's end-of-round measurement.
The tiny-timeout cases below are deterministic regardless of backend
health: no interpreter finishes startup inside 50 ms, so the probe
subprocess is always killed.
"""

import importlib.util
import json
import os

import pytest

_BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_probe_times_out_fast():
    bench = _load_bench()
    outage = bench.probe_backend(0.05)
    assert outage is not None and "unreachable" in outage


def test_probe_fast_failure_is_not_an_outage(monkeypatch, tmp_path):
    """A subprocess that exits nonzero QUICKLY means jax/the plugin is
    broken — that must raise with the real stderr, never masquerade as
    an infrastructure outage. Shadow jax with a module that raises at
    import so the probe subprocess dies instantly."""
    bench = _load_bench()
    (tmp_path / "jax.py").write_text("raise ImportError('broken jax install (test)')\n")
    monkeypatch.setenv("PYTHONPATH", str(tmp_path))
    with pytest.raises(RuntimeError, match="framework problem"):
        bench.probe_backend(120.0)


def test_main_prints_error_json_and_exits_nonzero(monkeypatch, capsys):
    bench = _load_bench()
    monkeypatch.setenv("ODESAT_BENCH_DEVICE_TIMEOUT", "0.05")
    with pytest.raises(SystemExit) as exc:
        bench.main()
    assert exc.value.code == 1
    out = capsys.readouterr().out.strip()
    result = json.loads(out)  # exactly one parseable JSON line
    assert "\n" not in out
    assert result["value"] == 0.0
    assert result["vs_baseline"] == 0.0
    assert result["unit"] == "traj*steps/s"
    assert "unreachable" in result["error"]
