"""Benchmark: pre-training clips/sec/chip on real TPU hardware.

Runs the flagship EgoVLPv2 pretrain step (EgoNCE + MLM + 2*ITM, TimeSformer-
B/16 @ 4 frames + RoBERTa-base, bf16 + remat) on synthetic data and prints ONE
JSON line. Baseline: the reference trains 20 epochs x 500k clips in ~5 days on
32x A100 (EgoVLPv2/README.md:146) = 0.723 clips/sec/chip.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_CLIPS_PER_SEC_PER_CHIP = 10_000_000 / (5 * 86400) / 32  # 0.723


def main():
    from egovlpv2_tpu.core.config import ModelConfig, OptimConfig, TrainConfig
    from egovlpv2_tpu.parallel.mesh import make_mesh, shard_batch
    from egovlpv2_tpu.tasks.pretrain import build_pretrain, synthetic_batch

    n_dev = len(jax.devices())
    batch_per_chip = 16
    batch_size = batch_per_chip * n_dev

    cfg = TrainConfig(
        model=ModelConfig(compute_dtype="bfloat16", remat=True),
        optim=OptimConfig(max_steps=1000),
        global_batch_size=batch_size,
    )
    mesh = make_mesh((-1, 1), ("data", "model"))
    batch = synthetic_batch(cfg, batch_size)

    with mesh:
        model, init_state = build_pretrain(cfg, mesh=mesh)
        state, step = init_state(batch)
        dev_batch = shard_batch(batch, mesh)

        # warmup/compile
        state, metrics = step(state, dev_batch)
        jax.block_until_ready(metrics["loss_total"])

        n_iters = 10
        t0 = time.perf_counter()
        for _ in range(n_iters):
            state, metrics = step(state, dev_batch)
        jax.block_until_ready(metrics["loss_total"])
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
                    "loss": float(metrics["loss_total"]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
