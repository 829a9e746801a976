"""AOT compile of the butterfly collective kernels against a mock TPU
topology (tools/aot_collective.py — round-3 VERDICT item 5).

Interpret mode skips the entry barrier and discharges remote DMA
synchronously, so compiled-mode lowering of `get_barrier_semaphore`,
the MESH-addressed remote copies, and the semaphore allocation would
otherwise first run on a real pod. These tests force that lowering +
XLA/Mosaic compile for a mock v5e 2x4 topology on every CI run.
Execution semantics stay covered by tests/test_shard_chunk.py
(interpret parity) and the hardware determinism soak."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from aot_collective import aot_ode, aot_stoch  # noqa: E402

from odesat_tpu.utils.config import ODEConfig  # noqa: E402


def _has_mock_topologies() -> bool:
    from jax.experimental import topologies

    try:
        topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x4")
        return True
    except Exception:  # noqa: BLE001 — jaxlib without mock-topology support
        return False


pytestmark = pytest.mark.skipif(
    not _has_mock_topologies(),
    reason="installed jaxlib cannot describe mock v5e topologies",
)


def test_aot_ode_fixed_odd_chunk_s2():
    # odd chunk compiles the parity-flush tail + the entry barrier
    assert aot_ode(2, ODEConfig(step_size=0.01), 7) is not None


def test_aot_ode_adaptive_s2():
    assert aot_ode(2, ODEConfig(tolerance=1e-3), 4) is not None


def test_aot_stoch_odd_chunk_s2():
    assert aot_stoch(2, 7) is not None


def test_aot_ode_fixed_s8_three_rounds():
    # 3 butterfly rounds: multi-round slot/semaphore indexing compiles
    assert aot_ode(8, ODEConfig(step_size=0.01), 7) is not None
