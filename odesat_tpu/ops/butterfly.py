"""Butterfly (recursive-doubling) all-reduce over ICI remote DMA —
shared by the whole-chunk clause-sharded kernels (ops/shard_chunk.py
for the ODE, ops/stoch_pallas.make_stoch_shard_chunk for the discrete
engine).

Round r exchanges the accumulator with partner ``axis_index ^ 2^r`` and
both sides combine; every round's pairwise grouping is identical on all
shards, so an add-combine is bit-identical everywhere (IEEE addition is
commutative; a sequential ring would sum in per-shard order and let
clause-replicated state drift apart).

Race-freedom (the single-staging-slot version this replaces could
deliver a delayed round-r payload into a wait that a *later* round's
arrival had already satisfied, corrupting the reduction on congested
ICI):

* **in-invocation**: each round receives into its own slot and
  semaphore, so a wait on round r can only be satisfied by the unique
  round-r partner's arrival;
* **adjacent invocations** use opposite ``parity`` (caller-threaded:
  the loop step for once-per-step reductions, the static call index
  for the adaptive integrator's two per step), landing in disjoint
  slots. Alternation must hold across the GLOBAL invocation sequence —
  trajectory-block and kernel-launch boundaries included: a kernel
  cannot finish until all payloads addressed to it have arrived (every
  send has a matching same-launch wait on the receiver), but its own
  final sends are only read-out-complete, so a shard may enter the
  next block/launch while a partner still waits in the previous one.
  Callers therefore keep the invocation count per block even — the
  once-per-step kernels issue a dead-data parity-1 flush invocation
  after an odd chunk (ops/shard_chunk.py, ops/stoch_pallas.py), and
  the adaptive integrator is even by construction. Launch boundaries
  are additionally fenced by ``entry_barrier`` in compiled mode: no
  shard issues a remote send until every shard has entered the
  launch, so a payload can never land in a *different* program's
  VMEM (grid blocks within a launch still rely on the parity
  discipline alone);
* **same-parity reuse** (invocations i and i+2) is ordered without any
  handshake: the partner starts invocation i+2 only after completing
  i+1, which required receiving our invocation-i+1 round-r payload,
  which we send only after completing invocation i — program order —
  which includes consuming slot (r, parity) at invocation i.

Sends read straight from ``acc_ref``: ``copy.wait()`` covers the send
semaphore, so the accumulator is mutated only after the DMA engine has
read it out (the old staging copy was pure overhead).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def entry_barrier(*, n_rounds: int, ring_axis: str, interpret: bool):
    """Barrier with every butterfly partner at kernel entry, BEFORE the
    first remote DMA (the canonical Pallas-TPU collective prologue).

    Without it a shard that enters this launch early could fire a remote
    write into a partner that is still executing the *previous* program
    (there is no cross-shard XLA data dependency between chunk launches
    once the all-reduce lives in-kernel), clobbering whatever that
    program keeps at the travel buffer's VMEM address and signalling a
    semaphore it may be using for its own DMAs. The barrier semaphore is
    keyed by the pallas_call's ``collective_id``; each shard signals all
    log2(S) partners once and waits for the matching count, so counts
    stay balanced across launches even when shards skew (early signals
    accumulate and are consumed by the receiver's next entry wait).

    Skipped under interpret mode: ``get_barrier_semaphore`` cannot be
    discharged there (it lowers to a constant ref), and interpret mode
    discharges remote copies synchronously, so the launch-skew race the
    barrier guards against cannot occur on the CPU mesh. The handshake
    therefore first executes on real multi-chip hardware — it is the
    canonical prologue from the Pallas-TPU distributed guide."""
    if n_rounds == 0 or interpret:
        return
    ci = jax.lax.axis_index(ring_axis)
    sem = pltpu.get_barrier_semaphore()
    for r in range(n_rounds):
        partner = jax.lax.bitwise_xor(ci, jnp.int32(1 << r))
        pltpu.semaphore_signal(
            sem,
            1,
            device_id={ring_axis: partner},
            device_id_type=pltpu.DeviceIdType.MESH,
        )
    pltpu.semaphore_wait(sem, n_rounds)


def travel_slots(n_rounds: int) -> int:
    """Receive-slot count for ``butterfly_allreduce``'s travel buffer
    and semaphore array: one per (round, invocation parity); at least
    one so S=1 kernels still allocate a well-formed scratch."""
    return max(1, 2 * n_rounds)


def butterfly_allreduce(
    acc_ref,
    travel_ref,
    ssem,
    rvsem,
    *,
    n_rounds: int,
    ring_axis: str,
    interpret: bool,
    parity,
    combine,
):
    """Run one all-reduce invocation over ``ring_axis``.

    ``acc_ref``: VMEM accumulator, sent as-is each round and updated via
    ``combine(recv_block)`` (a closure mutating ``acc_ref``).
    ``travel_ref``: VMEM ``(travel_slots(n_rounds), *acc.shape)`` recv
    slots; ``rvsem``: DMA semaphore array of the same leading size;
    ``ssem``: a single DMA send semaphore (sends are serialized by the
    per-round wait). ``parity`` ∈ {0, 1} (Python int or traced int32)
    must differ between consecutive invocations on every shard.
    """
    if n_rounds == 0:
        return
    ci = jax.lax.axis_index(ring_axis)
    base = parity * n_rounds
    for r in range(n_rounds):
        partner = jax.lax.bitwise_xor(ci, jnp.int32(1 << r))
        slot = base + r
        if interpret:
            # CPU-mesh discharge supports one named axis only: the test
            # mesh is clause-only, logical id == axis index
            dev_id, dev_type = partner, pltpu.DeviceIdType.LOGICAL
        else:
            dev_id, dev_type = {ring_axis: partner}, pltpu.DeviceIdType.MESH
        copy = pltpu.make_async_remote_copy(
            src_ref=acc_ref,
            dst_ref=travel_ref.at[slot],
            send_sem=ssem,
            recv_sem=rvsem.at[slot],
            device_id=dev_id,
            device_id_type=dev_type,
        )
        copy.start()
        copy.wait()
        combine(travel_ref[slot])
