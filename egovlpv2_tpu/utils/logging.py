"""Observability: JSONL stats, optional TensorBoard, step timing, profiler.

Capability-parity target: reference L9 (SURVEY.md §1): python logging +
tensorboardX scalars on rank 0 (`multinode_train_egoclip.py:152-153`) and the
JSON-lines `stats.txt` (`trainer_egoclip.py:97-101,153-159`). Additions the
reference lacks (SURVEY.md §5): steps/sec + clips/sec tracking and a
`jax.profiler` trace hook for TPU performance work.
"""

from __future__ import annotations

import json
import logging
import os
import time
from contextlib import contextmanager
from typing import Dict, Optional

import jax


def setup_logging(save_dir: Optional[str] = None, level=logging.INFO):
    handlers = [logging.StreamHandler()]
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        handlers.append(logging.FileHandler(os.path.join(save_dir, "info.log")))
    logging.basicConfig(
        level=level,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
        handlers=handlers,
        force=True,
    )
    return logging.getLogger("egovlpv2_tpu")


class StatsWriter:
    """JSON-lines stats file + optional TensorBoard scalars (rank 0 only)."""

    def __init__(self, save_dir: str, is_main: bool = True,
                 tensorboard: bool = True):
        self.is_main = is_main
        self._tb = None
        self._fh = None
        if not is_main:
            return
        os.makedirs(save_dir, exist_ok=True)
        self._fh = open(os.path.join(save_dir, "stats.txt"), "a")
        if tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(os.path.join(save_dir, "tf"))
            except ImportError:
                self._tb = None

    def write(self, step: int, metrics: Dict[str, float], prefix: str = "train"):
        if not self.is_main:
            return
        record = {"step": int(step), **{k: float(v) for k, v in metrics.items()}}
        self._fh.write(json.dumps(record) + "\n")
        self._fh.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(f"{prefix}/{k}", float(v), int(step))

    def close(self):
        if self._fh:
            self._fh.close()
        if self._tb:
            self._tb.close()


class MetricsPipeline:
    """Depth-1 pipelined metrics fetch for training loops.

    Fetching step i-1's scalars AFTER dispatching step i keeps the
    in-flight dispatch queue bounded at 2 while hiding the device->host
    round trip behind step i's compute. Both halves matter on a tunneled
    backend (measured: an unsynchronized dispatch loop degrades ~50x,
    and a synchronous per-step fetch pays the ~30 ms RTT serially —
    see bench.py, which uses the same discipline); on a directly
    attached host the bounded queue is still the correct backpressure.
    """

    def __init__(self):
        self._prev = None

    def push(self, step: int, metrics) -> Optional[tuple]:
        """Dispatch-side: record step's device metrics; return the
        previous step as ``(step, {name: float})``, fetched now."""
        out, self._prev = self._prev, (step, metrics)
        return self._fetch(out)

    def flush(self) -> Optional[tuple]:
        """Drain the in-flight step (call at epoch end / loop exit)."""
        out, self._prev = self._prev, None
        return self._fetch(out)

    @staticmethod
    def _fetch(entry):
        if entry is None:
            return None
        step, metrics = entry
        return step, {k: float(v) for k, v in metrics.items()}


class Throughput:
    """steps/sec + items/sec over a sliding window."""

    def __init__(self, items_per_step: int, window: int = 20):
        self.items_per_step = items_per_step
        self.window = window
        self._times = []

    def tick(self) -> Dict[str, float]:
        now = time.perf_counter()
        self._times.append(now)
        if len(self._times) > self.window + 1:
            self._times.pop(0)
        if len(self._times) < 2:
            return {}
        dt = (self._times[-1] - self._times[0]) / (len(self._times) - 1)
        return {
            "steps_per_sec": 1.0 / dt,
            "items_per_sec": self.items_per_step / dt,
        }


@contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace context; view in TensorBoard / xprof."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
