"""Unified CLI: one entry point, task subcommands, JSON config + overrides.

Replaces the reference's three overlapping config mechanisms (SURVEY.md §5:
ConfigParser reflection + per-entry argparse + import-time YAML globals) with
one dataclass tree (`egovlpv2_tpu.core.config`) loaded from JSON and
overridable with --set dotted.key=value flags.

Subcommands:
  pretrain   — EgoClip EgoNCE+MLM+ITM pre-training (synthetic data when no
               --meta/--data given, for smoke/perf runs)
  egomcq     — EgoMCQ zero-shot validation
  extract    — dense window features for MQ/NLQ/QFVS
  bench      — one train-step throughput measurement (same as bench.py)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from typing import Any, Dict

import numpy as np


def _apply_overrides(cfg, overrides):
    for item in overrides or []:
        key, _, raw = item.partition("=")
        try:
            value = json.loads(raw)
        except json.JSONDecodeError:
            value = raw
        parts = key.split(".")
        # rebuild nested frozen dataclasses
        def rec(node, parts):
            if len(parts) == 1:
                return dataclasses.replace(node, **{parts[0]: value})
            child = getattr(node, parts[0])
            return dataclasses.replace(node, **{parts[0]: rec(child, parts[1:])})

        cfg = rec(cfg, parts)
    return cfg


def load_train_config(path=None, overrides=None):
    from egovlpv2_tpu.core import config as C

    cfg = C.TrainConfig()
    if path:
        with open(path) as f:
            raw = json.load(f)

        def build(cls, data):
            fields = {f.name: f for f in dataclasses.fields(cls)}
            kwargs = {}
            for k, v in data.items():
                if k not in fields:
                    raise KeyError(f"unknown config key {k} for {cls.__name__}")
                ftype = fields[k].type
                if isinstance(v, dict):
                    sub_cls = type(getattr(cls(), k)) if False else None
                    # nested dataclass types resolved from defaults
                    default = getattr(C.TrainConfig(), k, None)
                    kwargs[k] = build(type(default), v)
                else:
                    kwargs[k] = tuple(v) if isinstance(v, list) else v
            return cls(**kwargs)

        cfg = build(C.TrainConfig, raw)
    return _apply_overrides(cfg, overrides)


def cmd_pretrain(args):
    import jax

    from egovlpv2_tpu.parallel.mesh import make_mesh, shard_batch
    from egovlpv2_tpu.tasks.pretrain import build_pretrain, synthetic_batch
    from egovlpv2_tpu.train.checkpoint import CheckpointManager
    from egovlpv2_tpu.utils.logging import StatsWriter, Throughput, setup_logging

    log = setup_logging(args.save_dir)
    cfg = load_train_config(args.config, args.set)
    mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axes)
    stats = StatsWriter(args.save_dir) if args.save_dir else None
    ckpt = CheckpointManager(f"{args.save_dir}/ckpt") if args.save_dir else None

    with mesh:
        model, init_state = build_pretrain(cfg, mesh=mesh)
        if args.synthetic:
            batch = synthetic_batch(cfg, cfg.global_batch_size)
            batches = lambda epoch: iter(
                lambda: shard_batch(batch, mesh), None
            )
        else:
            from egovlpv2_tpu.data.datasets import EgoClipDataset
            from egovlpv2_tpu.data.loader import (
                DataLoader, HostShardSampler, Tokenizer, pretrain_post_fn,
            )

            ds = EgoClipDataset(
                args.meta, args.data, num_frames=cfg.model.video.num_frames,
                neg_param=60,
            )
            tok = Tokenizer(args.tokenizer, max_len=cfg.max_text_len)
            loader = DataLoader(
                ds, cfg.global_batch_size // (2 if True else 1),
                sampler=HostShardSampler(len(ds), jax.process_count(),
                                         jax.process_index(), seed=cfg.seed),
                post_fn=pretrain_post_fn(tok, cfg.mlm_prob),
            )
            batches = loader.epoch

        state, step_fn = init_state(
            synthetic_batch(cfg, cfg.global_batch_size), seed=cfg.seed
        )
        if ckpt and args.resume:
            restored = ckpt.restore(jax.device_get(state))
            if restored is not None:
                from egovlpv2_tpu.parallel.mesh import replicate

                # restored arrays land on one device; re-place on the mesh
                state = replicate(restored, mesh)
                log.info("resumed from step %d", int(state.step))

        tp = Throughput(cfg.global_batch_size)
        step = int(state.step)
        for epoch in range(args.epochs):
            if args.synthetic:
                it = (shard_batch(synthetic_batch(cfg, cfg.global_batch_size,
                                                  np.random.default_rng(i)),
                                  mesh)
                      for i in range(args.steps_per_epoch))
            else:
                it = batches(epoch)
            for batch in it:
                state, metrics = step_fn(state, batch)
                step += 1
                if step % args.log_every == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    m.update(tp.tick())
                    log.info("step %d: %s", step,
                             {k: round(v, 4) for k, v in m.items()})
                    if stats:
                        stats.write(step, m)
                if ckpt and step % args.ckpt_every == 0:
                    ckpt.save(step, jax.device_get(state))
            if ckpt:
                ckpt.save(step, jax.device_get(state))
        if ckpt:
            ckpt.wait()
    log.info("done at step %d", step)


def cmd_bench(args):
    import bench

    bench.main()


def main(argv=None):
    parser = argparse.ArgumentParser("egovlpv2-tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("pretrain")
    p.add_argument("--config", default=None)
    p.add_argument("--set", nargs="*", default=[], help="dotted.key=value")
    p.add_argument("--save_dir", default=None)
    p.add_argument("--meta", default=None, help="egoclip.csv path")
    p.add_argument("--data", default=None, help="chunked video root")
    p.add_argument("--tokenizer", default="roberta-base")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--steps_per_epoch", type=int, default=10)
    p.add_argument("--log_every", type=int, default=1)
    p.add_argument("--ckpt_every", type=int, default=1000)
    p.add_argument("--resume", action="store_true")
    p.set_defaults(fn=cmd_pretrain)

    b = sub.add_parser("bench")
    b.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
