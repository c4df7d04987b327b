"""Benchmark: pre-training clips/sec/chip on real TPU hardware.

Runs the flagship EgoVLPv2 pretrain step (EgoNCE + MLM + 2*ITM, TimeSformer-
B/16 @ 4 frames + RoBERTa-base, bf16 + remat) on synthetic data and prints ONE
JSON line. Baseline: the reference trains 20 epochs x 500k clips in ~5 days on
32x A100 (EgoVLPv2/README.md:146) = 0.723 clips/sec/chip.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: the flagship step is a big program and this host
# may have few cores; one compile, reused across rounds.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

BASELINE_CLIPS_PER_SEC_PER_CHIP = 10_000_000 / (5 * 86400) / 32  # 0.723


def _devices_with_retry(attempts: int = 5, wait_s: float = 60.0,
                        attempt_timeout_s: int = 300):
    """The tunneled TPU backend can fail to initialize transiently
    (observed: RuntimeError 'Unable to initialize backend ... UNAVAILABLE')
    or HANG indefinitely inside jax.devices() when the tunnel is down
    (observed during the round-3 outage). The hang is inside a C call that
    never returns to the interpreter, so an in-process SIGALRM handler
    cannot fire (measured: a 300 s alarm never raised in 580 s). Probe in
    a SUBPROCESS instead — a hung child can always be killed — and only
    init the backend in-process once a probe has succeeded. The probe
    child exits before we init, so it never contends for the chip."""
    import subprocess
    import sys

    last = None
    for i in range(attempts):
        try:
            out = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, text=True, timeout=attempt_timeout_s)
            if out.returncode == 0:
                return jax.devices()
            last = (f"probe exit {out.returncode}: "
                    f"{out.stderr.strip()[-300:]}")
        except subprocess.TimeoutExpired:
            last = f"probe exceeded {attempt_timeout_s}s (tunnel down?)"
        if i == attempts - 1:
            # Emit a parseable record of the outage before raising so the
            # driver's bench log captures the cause, not just a traceback.
            print(json.dumps({
                "metric": "pretrain_clips_per_sec_per_chip",
                "value": None,
                "unit": "clips/s/chip",
                "vs_baseline": None,
                "error": f"TPU backend unavailable: {last}",
            }), flush=True)
            raise RuntimeError(f"TPU backend unavailable: {last}")
        print(f"# backend probe failed ({last}); retry {i + 1}/{attempts}",
              flush=True)
        time.sleep(wait_s)


def main():
    from egovlpv2_tpu.core.config import ModelConfig, OptimConfig, TrainConfig
    from egovlpv2_tpu.parallel.mesh import make_mesh, shard_batch
    from egovlpv2_tpu.tasks.pretrain import build_pretrain, synthetic_batch

    n_dev = len(_devices_with_retry())
    batch_per_chip = int(os.environ.get("BENCH_BATCH", "16"))
    batch_size = batch_per_chip * n_dev

    # remat=False: bf16 activations at this batch fit v5e HBM, and XLA's
    # compile time for grad-of-remat on the unrolled 24-block graph is
    # pathological on few-core hosts (measured: >90 min vs 4.4 min without).
    # Measured on v5e @ batch 16 (round 2): xla+path-remat 697 ms, pallas
    # divided-attention kernel 599 ms, pallas+no-path-remat 484 ms. bf16
    # activations at batch<=16 fit HBM without the path-level recompute.
    cfg = TrainConfig(
        model=ModelConfig(compute_dtype="bfloat16",
                          attn_impl=os.environ.get("BENCH_ATTN", "pallas"),
                          remat=os.environ.get("BENCH_REMAT", "0") == "1"),
        optim=OptimConfig(max_steps=1000),
        path_remat=os.environ.get("BENCH_PATH_REMAT", "0") == "1",
        global_batch_size=batch_size,
    )
    mesh = make_mesh((-1, 1), ("data", "model"))
    batch = synthetic_batch(cfg, batch_size)

    with mesh:
        model, init_state = build_pretrain(cfg, mesh=mesh)
        state, step = init_state(batch)
        dev_batch = shard_batch(batch, mesh)

        # warmup/compile: the first couple of executions absorb server-side
        # compile + one-time allocation/defrag (~100 s observed on the first
        # post-compile step); steady state is what we report.
        for _ in range(3):
            state, metrics = step(state, dev_batch)
            loss = float(metrics["loss_total"])

        # NOTE: fetch a loss scalar every iteration. block_until_ready on
        # this tunneled TPU backend is a no-op future, and an unsynchronized
        # dispatch loop degrades ~50x (measured 50 s/step vs 0.9 s/step
        # with a per-step scalar fetch). Fetching step i-1's loss AFTER
        # dispatching step i keeps the in-flight queue bounded (depth 2)
        # while overlapping the ~30 ms tunnel RTT with device compute —
        # the same depth-1 pipeline a real training loop uses for logging.
        n_iters = 10
        t0 = time.perf_counter()
        prev = None
        for _ in range(n_iters):
            state, metrics = step(state, dev_batch)
            if prev is not None:
                loss = float(prev["loss_total"])
            prev = metrics
        loss = float(prev["loss_total"])
        dt = time.perf_counter() - t0

    clips_per_sec = batch_size * n_iters / dt
    per_chip = clips_per_sec / n_dev
    print(
        json.dumps(
            {
                "metric": "pretrain_clips_per_sec_per_chip",
                "value": round(per_chip, 3),
                "unit": "clips/s/chip",
                "vs_baseline": round(per_chip / BASELINE_CLIPS_PER_SEC_PER_CHIP, 3),
                "detail": {
                    "devices": n_dev,
                    "global_batch": batch_size,
                    "step_ms": round(1000 * dt / n_iters, 1),
                    "loss": loss,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
