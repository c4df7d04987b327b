"""Multi-host initialization + preemption-safe training helpers.

TPU-native replacement for the reference's SLURM/NCCL runtime
(`multinode_train_egoclip.py:63-99`: rank/world-size from SLURM env, TCP
rendezvous, SIGUSR1 requeue). On TPU pods `jax.distributed.initialize()`
discovers peers from the TPU environment; preemption safety comes from
periodic orbax checkpoints plus a SIGTERM-triggered final save instead of
requeueing.
"""

from __future__ import annotations

import os
import signal
import threading
from typing import Callable, Optional

import jax


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> dict:
    """Initialize jax.distributed when running multi-host; no-op single-host.

    On Cloud TPU pods all arguments are auto-discovered; explicit values
    support SLURM-style launches (reference run.sh: 4 nodes x 8 devices)."""
    already_multi = num_processes is not None or any(
        k in os.environ for k in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS")
    )
    if already_multi or os.environ.get("JAX_MULTIHOST", "0") == "1":
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        # jax_share_binary_between_hosts is deliberately NOT enabled: its
        # KV exchange is keyed by the persistent-cache key, which on this
        # stack is PER-PROCESS (measured: the identical global psum program
        # hashes differently under process_id 0 vs 1 — and only process 0
        # writes the persistent cache). A warm process 0 then cache-hits,
        # skips the KV set, and every other process deadlocks waiting for a
        # key nobody will write. Each process compiles independently
        # instead; `precompiled_epoch` (AOT compile + coordination barrier
        # before the first dispatch) is what keeps compile skew away from
        # XLA:CPU Gloo's ~30 s first-collective rendezvous window.
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def is_main_process() -> bool:
    return jax.process_index() == 0


def barrier(name: str, timeout_ms: int = 1_200_000) -> None:
    """Cross-process rendezvous via the coordination service (pure gRPC) —
    NOT a device collective.

    Used right before the first train-step dispatch: XLA:CPU's Gloo
    rendezvous tolerates only ~30 s of skew between processes (hardcoded
    GetKeyValue timeout), and per-process setup/compile skew can exceed
    that on loaded hosts. Meeting here means every process dispatches the
    first collective program together. No-op single-process."""
    if jax.process_count() <= 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_ms)


def precompiled_epoch(step_fn, state, it, name: str):
    """Multi-process: peek the first batch, AOT-compile the jitted train
    step on it, then meet at a coordination barrier before dispatching.

    `barrier()` alone absorbs setup skew but NOT compile skew — the step
    compiles lazily on its first call, AFTER the barrier, and on a loaded
    (or 1-core) host two processes timesharing trace+compile can drift far
    past XLA:CPU Gloo's ~30 s first-collective rendezvous window.
    `.lower().compile()` does not execute anything (so no collective can
    fire during the skewed phase); the barrier that follows is pure gRPC
    against the coordination service, whose timeout we control.
    Post-barrier skew is then microseconds of Python.

    Returns an iterator equivalent to `it` (the peeked batch is re-chained).
    Single-process: returns `it` untouched."""
    if jax.process_count() <= 1:
        return it
    import itertools

    it = iter(it)
    first = next(it, None)
    if first is not None:
        step_fn.lower(state, first).compile()
    barrier(name)
    return itertools.chain([first], it) if first is not None else iter(())


class PreemptionGuard:
    """SIGTERM-aware preemption flag (replaces the reference's SIGUSR1 ->
    scontrol requeue flow, multinode_train_egoclip.py:56-61, with
    save-before-death).

    The handler only sets a flag (and runs the optional `on_preempt`
    callback); training loops poll `guard.preempted` once per step and do
    the final checkpoint save from loop context — orbax's async save is
    not reentrant from a signal handler."""

    def __init__(self, on_preempt: Optional[Callable[[], None]] = None):
        self._fired = threading.Event()
        self._cb = on_preempt
        self._prev = signal.signal(signal.SIGTERM, self._handler)

    def _handler(self, signum, frame):
        if not self._fired.is_set():
            self._fired.set()
            if self._cb is not None:
                self._cb()

    @property
    def preempted(self) -> bool:
        return self._fired.is_set()

    def restore(self):
        """Reinstate the previous SIGTERM handler (call on clean exit)."""
        if self._prev is not None:
            signal.signal(signal.SIGTERM, self._prev)
            self._prev = None
