"""Unified CLI: one entry point, task subcommands, JSON config + overrides.

Replaces the reference's three overlapping config mechanisms (SURVEY.md §5:
ConfigParser reflection + per-entry argparse + import-time YAML globals) with
one dataclass tree (`egovlpv2_tpu.core.config`) loaded from JSON and
overridable with --set dotted.key=value flags.

Subcommands (reference entry points they replace):
  pretrain      — EgoClip EgoNCE+MLM+ITM pre-training with optional per-epoch
                  EgoMCQ validation, monitor-best checkpointing and early
                  stopping (multinode_train_egoclip.py + base_trainer.py).
                  Synthetic data when --synthetic is given.
  egomcq        — EgoMCQ zero-shot validation (configs/eval/egomcq.json flow,
                  trainer_egoclip.py:202-313).
  extract       — dense window features for MQ/NLQ/QFVS (test_mq.py:25-86).
  ft-epic       — EK-100 MIR dual-encoder fine-tune (multinode_train_epic.py).
  ft-charades   — Charades-Ego dual-encoder fine-tune
                  (multinode_train_charades.py).
  bench         — one train-step throughput measurement (same as bench.py).
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import itertools
import json
import os
import sys
from typing import Any, Dict, Optional

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
                if k.startswith("_"):  # comment keys, e.g. "_doc"
                    continue
                if k not in fields:
                    raise KeyError(f"unknown config key {k} for {cls.__name__}")
                if isinstance(v, dict):
                    # nested dataclass types resolved from this level's default
                    default = getattr(cls(), k)
                    kwargs[k] = build(type(default), v)
                else:
                    kwargs[k] = tuple(v) if isinstance(v, list) else v
            return cls(**kwargs)

        cfg = build(C.TrainConfig, raw)
    return _apply_overrides(cfg, overrides)


def _load_params(model, cfg, ckpt_path: Optional[str], seed: int = 0):
    """Initialize the model and overlay a checkpoint if given.

    `ckpt_path` may be a torch .pth reference checkpoint (imported with
    temporal-embed inflation) or an orbax directory saved by `pretrain`.
    """
    import jax
    import jax.numpy as jnp

    v = cfg.model.video
    video = jnp.zeros((1, v.num_frames, v.img_size, v.img_size, v.in_chans),
                      jnp.float32)
    ids = jnp.zeros((1, cfg.max_text_len), jnp.int32)
    mask = jnp.ones((1, cfg.max_text_len), jnp.int32)
    params = model.init(jax.random.PRNGKey(seed), video, ids, mask,
                        method=model.init_all)["params"]
    if not ckpt_path:
        return params
    if os.path.isdir(ckpt_path):
        from egovlpv2_tpu.train.checkpoint import CheckpointManager

        mngr = CheckpointManager(ckpt_path)
        # restore just the params subtree from the saved TrainState template
        restored = mngr.restore_params(params)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint found under {ckpt_path}")
        return restored
    from egovlpv2_tpu.train.checkpoint_import import (
        import_reference_checkpoint, load_torch_state_dict,
    )

    sd = load_torch_state_dict(ckpt_path)
    params, report = import_reference_checkpoint(
        sd, params, num_frames=v.num_frames
    )
    print(f"imported {len(report['imported'])} tensors from {ckpt_path} "
          f"({len(report['skipped'])} skipped)")
    return params


def _save_resolved_config(cfg, save_dir: Optional[str]):
    """Write the fully-resolved config into save_dir for reproducibility
    (reference: ConfigParser writes the resolved JSON on every run with a
    save dir, parse_config.py:62-89). Process-0 only."""
    if not save_dir:
        return
    from egovlpv2_tpu.parallel.distributed import is_main_process

    if not is_main_process():
        return
    os.makedirs(save_dir, exist_ok=True)
    with open(os.path.join(save_dir, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)


class Monitor:
    """Monitored-metric best tracking + early stop
    (base_trainer.py:284-292,366-388): spec 'max:key' or 'min:key'."""

    def __init__(self, spec: str, early_stop: int = 0):
        mode, _, key = spec.partition(":")
        if mode not in ("min", "max") or not key:
            raise ValueError(f"monitor spec must be 'min:key' or 'max:key', got {spec!r}")
        self.mode, self.key = mode, key
        self.early_stop = early_stop
        self.best: Optional[float] = None
        self.not_improved = 0

    def update(self, metrics: Dict[str, float]) -> bool:
        """Returns True when this is a new best. Missing key = not improved."""
        val = metrics.get(self.key)
        if val is None:
            self.not_improved += 1
            return False
        improved = (
            self.best is None
            or (self.mode == "max" and val > self.best)
            or (self.mode == "min" and val < self.best)
        )
        if improved:
            self.best = val
            self.not_improved = 0
        else:
            self.not_improved += 1
        return improved

    @property
    def should_stop(self) -> bool:
        return self.early_stop > 0 and self.not_improved >= self.early_stop

    def state_dict(self) -> Dict[str, Any]:
        return {"mode": self.mode, "key": self.key, "best": self.best,
                "not_improved": self.not_improved}

    def load_state_dict(self, state: Dict[str, Any]) -> bool:
        """Restore best/early-stop progress saved alongside a checkpoint
        (reference persists monitor_best per save, base_trainer.py:412-436).
        Ignored (returns False) when the monitored metric changed."""
        if state.get("mode") != self.mode or state.get("key") != self.key:
            return False
        self.best = state.get("best")
        self.not_improved = int(state.get("not_improved", 0))
        return True


def _make_egomcq_batches(args, cfg, tokenizer_name: str, batch_size: int = 4):
    """Returns callable(epoch) -> iterator of egomcq eval batches
    (video5/ids/mask/answer/type), real or synthetic."""
    from egovlpv2_tpu.data.loader import DataLoader, Tokenizer

    tok = Tokenizer(tokenizer_name, max_len=cfg.max_text_len,
                    vocab_cap=cfg.model.text.vocab_size)

    if getattr(args, "val_meta", None) or getattr(args, "meta", None):
        from egovlpv2_tpu.data.datasets import EgoMCQDataset

        meta = getattr(args, "val_meta", None) or args.meta
        data = getattr(args, "val_data", None) or args.data
        ds = EgoMCQDataset(meta, data, num_frames=cfg.model.video.num_frames,
                           input_res=cfg.model.video.img_size, loading="lax",
                           device_norm=getattr(args, "device_norm", False))

        def post(batch):
            enc = tok(batch.pop("text"))
            return {"video5": batch["video5"], "ids": enc["text_ids"],
                    "mask": enc["text_mask"], "answer": batch["answer"],
                    "type": batch["type"]}

        loader = DataLoader(ds, batch_size, post_fn=post, drop_last=False,
                            num_workers=getattr(args, "num_workers", 4))
        return loader.epoch

    # synthetic smoke batches
    v = cfg.model.video
    n_batches = getattr(args, "val_batches", 2)

    def batches(epoch: int = 0):
        rng = np.random.default_rng(1234 + epoch)
        for _ in range(n_batches):
            texts = ["someone does something"] * batch_size
            enc = tok(texts)
            yield {
                "video5": rng.standard_normal(
                    (batch_size, 5, v.num_frames, v.img_size, v.img_size,
                     v.in_chans)).astype(np.float32),
                "ids": enc["text_ids"],
                "mask": enc["text_mask"],
                "answer": rng.integers(0, 5, batch_size),
                "type": rng.integers(1, 3, batch_size),
            }

    return batches


def cmd_pretrain(args):
    import jax

    from egovlpv2_tpu.parallel.mesh import (
        host_state, local_batch_size, make_mesh, shard_batch,
    )
    from egovlpv2_tpu.tasks.pretrain import build_pretrain, synthetic_batch
    from egovlpv2_tpu.train.checkpoint import CheckpointManager
    from egovlpv2_tpu.utils.logging import (MetricsPipeline, StatsWriter,
                                             Throughput, setup_logging)

    from egovlpv2_tpu.parallel.distributed import (PreemptionGuard, barrier,
                                                     is_main_process,
                                                     precompiled_epoch)

    # rank-0-only file outputs: on a pod every host runs this command
    # against a shared save_dir (reference: rank-0 logging in trainer/)
    log = setup_logging(args.save_dir if is_main_process() else None)
    cfg = load_train_config(args.config, args.set)
    mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axes)
    _save_resolved_config(cfg, args.save_dir)
    stats = (StatsWriter(args.save_dir)
             if args.save_dir and is_main_process() else None)
    ckpt = CheckpointManager(f"{args.save_dir}/ckpt") if args.save_dir else None
    monitor = Monitor(args.monitor, args.early_stop) if args.monitor else None
    # each process feeds shard_batch its own global//process_count slice
    local_bs = local_batch_size(cfg.global_batch_size)

    with mesh:
        model, init_state = build_pretrain(cfg, mesh=mesh)
        if args.synthetic:
            def batches(epoch):
                # generate the GLOBAL batch identically on every process
                # (seeded rng), then slice this process's contiguous block —
                # keeps multi-process losses bit-identical to single-process
                pid = jax.process_index()
                for i in range(args.steps_per_epoch):
                    b = synthetic_batch(
                        cfg, cfg.global_batch_size,
                        np.random.default_rng(epoch * 100003 + i))
                    if local_bs != cfg.global_batch_size:
                        b = {k: v[pid * local_bs:(pid + 1) * local_bs]
                             for k, v in b.items()}
                    yield shard_batch(b, mesh)
        else:
            from egovlpv2_tpu.data.datasets import EgoClipDataset
            from egovlpv2_tpu.data.loader import (
                DataLoader, HostShardSampler, RoundRobinLoader, Tokenizer,
                device_prefetch, pretrain_post_fn,
            )

            tok = Tokenizer(args.tokenizer, max_len=cfg.max_text_len,
                            vocab_cap=cfg.model.text.vocab_size)
            # scene negatives concat a second clip per item at collate time
            # (trainer_egoclip.py:112-116), so the loader batch is halved to
            # keep the device-visible batch at global_batch_size; on a pod
            # each host additionally loads only its 1/process_count share.
            loader_batch = local_bs // (2 if args.neg_param else 1)

            def make_loader(meta_path):
                ds = EgoClipDataset(
                    meta_path, args.data,
                    num_frames=cfg.model.video.num_frames,
                    input_res=cfg.model.video.img_size,
                    neg_param=args.neg_param,
                    device_norm=args.device_norm,
                )
                return DataLoader(
                    ds, loader_batch,
                    sampler=HostShardSampler(len(ds), jax.process_count(),
                                             jax.process_index(),
                                             seed=cfg.seed),
                    num_workers=args.num_workers,
                    post_fn=pretrain_post_fn(tok, cfg.mlm_prob),
                )

            # comma-separated metas round-robin across datasets per step
            # (BaseMultiDataLoader, base_data_loader.py:142)
            loaders = [make_loader(m) for m in args.meta.split(",")]
            loader = loaders[0] if len(loaders) == 1 else RoundRobinLoader(loaders)

            def batches(epoch):
                # feeder-thread H2D prefetch: batch N+1 ships while step N
                # computes (data/loader.py device_prefetch)
                return device_prefetch(loader.epoch(epoch),
                                       lambda b: shard_batch(b, mesh))

        # per-epoch EgoMCQ validation (trainer_egoclip.py:194-195)
        val_batches = None
        if args.val_meta or args.val_synthetic:
            from egovlpv2_tpu.tasks.egomcq import (
                evaluate_egomcq, make_egomcq_eval_step,
            )

            val_batches = _make_egomcq_batches(args, cfg, args.tokenizer)
            eval_step = make_egomcq_eval_step(model, with_vtm=not args.val_vtc_only)

        state, step_fn = init_state(
            synthetic_batch(cfg, cfg.global_batch_size), seed=cfg.seed
        )
        start_epoch = 0
        if ckpt and args.resume:
            restored = ckpt.restore(host_state(state))
            if restored is not None:
                from egovlpv2_tpu.parallel.mesh import replicate

                # restored arrays land on one device; re-place on the mesh
                state = replicate(restored, mesh)
                # continue after the last completed epoch (base_trainer.py:
                # 438-495 resumes at checkpoint_epoch + 1)
                last = ckpt.last_epoch()
                start_epoch = last + 1 if last is not None else 0
                log.info("resumed from step %d (epoch %d)",
                         int(state.step), start_epoch)
                if monitor:
                    ms = ckpt.monitor_state()
                    if ms and monitor.load_state_dict(ms):
                        log.info("restored monitor: best %s=%s (%d stale)",
                                 monitor.key, monitor.best,
                                 monitor.not_improved)

        tp = Throughput(cfg.global_batch_size)
        pipe = MetricsPipeline()
        step = int(state.step)

        def handle(ready):
            # `ready` is the PREVIOUS step's metrics, fetched after the
            # current step was dispatched (bounded queue depth 2, RTT
            # hidden behind device compute — same discipline as bench.py)
            if not ready:
                return None
            rstep, m = ready
            rates = tp.tick()
            if rstep % args.log_every == 0:
                full = {**m, **rates}
                log.info("step %d: %s", rstep,
                         {k: round(v, 4) for k, v in full.items()})
                if stats:
                    stats.write(rstep, full)
            return m

        # preemption safety: poll the SIGTERM flag per step and save from
        # loop context (all pod hosts receive SIGTERM together, so the
        # collective orbax save below stays collective)
        guard = PreemptionGuard()
        # meet before the first collective dispatch (see barrier())
        barrier("pretrain_start")
        # epoch cap in loader samples (trainer_egoclip.py:108 breaks once
        # (batch_idx+1)*batch_sum exceeds it; scene negatives double the
        # device batch but the cap counts loader rows, so divide those out)
        samples_per_step = cfg.global_batch_size // (
            2 if (not args.synthetic and args.neg_param) else 1)
        steps_cap = (max(1, cfg.max_samples_per_epoch // samples_per_step)
                     if cfg.max_samples_per_epoch else None)
        # validate once before any training (base_trainer.py:86; with
        # --epochs 0 this reproduces the reference's eval-mode configs,
        # configs/eval/egomcq.json "init_val": true + epochs 0)
        if args.init_val and val_batches is not None and start_epoch == 0:
            val = evaluate_egomcq(eval_step, state.params, val_batches(-1))
            log.info("init val: %s",
                     {k: round(v, 3) for k, v in val.items()})
            if stats:
                stats.write(step, {f"val_{k}": v for k, v in val.items()})
        for epoch in range(start_epoch, args.epochs):
            epoch_it = itertools.islice(batches(epoch), steps_cap)
            if epoch == start_epoch:
                # absorb compile skew before the first collective dispatch
                epoch_it = precompiled_epoch(step_fn, state, epoch_it,
                                             "pretrain_compile")
            for batch in epoch_it:
                state, metrics = step_fn(state, batch)
                step += 1
                handle(pipe.push(step, metrics))
                if ckpt and step % args.ckpt_every == 0:
                    ckpt.save(step, host_state(state))
                if guard.preempted:
                    if ckpt:
                        # this epoch is incomplete: resume replays it
                        # (skip if the periodic save above already wrote it)
                        if ckpt.latest_step() != step:
                            ckpt.save(step, host_state(state), epoch=epoch - 1)
                        ckpt.wait()
                    log.info("preempted (SIGTERM): saved at step %d, exiting",
                             step)
                    guard.restore()
                    return
            # drain the in-flight step so epoch metrics are the last step's
            epoch_metrics = handle(pipe.flush()) or {}
            if val_batches is not None:
                val = evaluate_egomcq(eval_step, state.params, val_batches(epoch))
                epoch_metrics.update(val)
                log.info("epoch %d val: %s", epoch,
                         {k: round(v, 3) for k, v in val.items()})
                if stats:
                    stats.write(step, {f"val_{k}": v for k, v in val.items()})
            is_best = monitor.update(epoch_metrics) if monitor else False
            if ckpt:
                ckpt.save(step, host_state(state), metrics=epoch_metrics,
                          is_best=is_best, epoch=epoch)
                if monitor:
                    ckpt.save_monitor(monitor.state_dict())
            if monitor and monitor.should_stop:
                log.info("early stop at epoch %d (no improvement in %d epochs, "
                         "best %s=%.4f)", epoch, monitor.not_improved,
                         monitor.key, monitor.best)
                break
        guard.restore()
        if ckpt:
            ckpt.wait()
    log.info("done at step %d", step)


def cmd_egomcq(args):
    from egovlpv2_tpu.models.egovlp import EgoVLPv2
    from egovlpv2_tpu.tasks.egomcq import evaluate_egomcq, make_egomcq_eval_step

    cfg = load_train_config(args.config, args.set)
    model = EgoVLPv2(cfg.model)
    params = _load_params(model, cfg, args.ckpt)
    batches = _make_egomcq_batches(args, cfg, args.tokenizer,
                                   batch_size=args.batch_size)
    eval_step = make_egomcq_eval_step(model, with_vtm=not args.vtc_only)
    metrics = evaluate_egomcq(eval_step, params, batches(0))
    print(json.dumps({k: round(v, 4) for k, v in metrics.items()}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(metrics, f, indent=2)


def cmd_extract(args):
    """MQ-style dense window features: one .npy/.pt per clip (test_mq.py)."""
    from egovlpv2_tpu.data import readers
    from egovlpv2_tpu.data import transforms
    from egovlpv2_tpu.models.egovlp import EgoVLPv2
    from egovlpv2_tpu.tasks.extract import FeatureExtractor, save_features

    cfg = load_train_config(args.config, args.set)
    model = EgoVLPv2(cfg.model)
    params = _load_params(model, cfg, args.ckpt)
    # normalize on device: ship compact uint8 windows (4x fewer
    # host->device bytes) and fold (x/255 - mean)/std into the jitted
    # encoder program
    ex = FeatureExtractor(model, params, inner_batch=args.inner_batch,
                          device_norm="imagenet")

    paths = sorted(glob.glob(args.videos))
    if not paths:
        raise FileNotFoundError(f"no videos match {args.videos!r}")
    os.makedirs(args.out, exist_ok=True)
    for path in paths:
        uid = os.path.splitext(os.path.basename(path))[0]
        total = readers.get_video_len(path)
        frames, _ = readers.read_frames_cv2(path, max(total, 1), sample="uniform")
        # back to uint8 for the geometric pipeline + transfer (the decoded
        # source was uint8; resize-then-quantize matches the reference's
        # PIL-resize-then-ToTensor semantics)
        frames = np.round(np.asarray(frames) * 255.0).astype(np.uint8)
        frames = transforms.eval_transform(frames, size=args.input_res,
                                           normalize=False)
        feats = ex.clip_features(frames, cfg.model.video.num_frames)
        save_features(os.path.join(args.out, uid), feats)
        print(f"{uid}: {feats.shape}")


def _run_dual_ft(args, dataset_name: str):
    """Shared driver for ft-epic / ft-charades (multinode_train_epic.py /
    multinode_train_charades.py capability)."""
    import jax

    from egovlpv2_tpu.core.config import LossConfig
    from egovlpv2_tpu.data.loader import (
        DataLoader, HostShardSampler, Tokenizer,
    )
    from egovlpv2_tpu.models.egovlp import EgoVLPv2
    from egovlpv2_tpu.parallel.mesh import (
        host_state, local_batch_size, make_mesh, shard_batch,
    )
    from egovlpv2_tpu.tasks.retrieval import (
        epoch_milestone_schedule, make_dual_train_step,
    )
    from egovlpv2_tpu.train.checkpoint import CheckpointManager
    from egovlpv2_tpu.train.optimizer import make_optimizer
    from egovlpv2_tpu.train.step import TrainState
    from egovlpv2_tpu.utils.logging import (MetricsPipeline, StatsWriter,
                                             Throughput, setup_logging)

    from egovlpv2_tpu.parallel.distributed import (PreemptionGuard, barrier,
                                                     is_main_process,
                                                     precompiled_epoch)

    log = setup_logging(args.save_dir if is_main_process() else None)
    cfg = load_train_config(args.config, args.set)
    # retrieval fine-tunes use the small projections + Dual loss
    loss_type = "AdaptiveMaxMargin" if dataset_name == "epic" else "NormSoftmax"
    model_cfg = dataclasses.replace(cfg.model, projection="small",
                                    projection_dim=256, with_itm_head=False,
                                    with_mlm_head=False)
    if getattr(args, "device_norm", False):
        # uint8 feed: the model normalizes on device with the dataset's
        # regime (EPIC trains in 0-255 units, Charades in [0,1] imagenet)
        model_cfg = dataclasses.replace(
            model_cfg, video=dataclasses.replace(
                model_cfg.video,
                uint8_norm="epic" if dataset_name == "epic" else "imagenet"))
    cfg = dataclasses.replace(
        cfg,
        model=model_cfg,
        loss=dataclasses.replace(cfg.loss, type=loss_type),
        max_text_len=30,  # fine-tunes tokenize at 30 (trainer_epic.py:134)
    )
    mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axes)
    model = EgoVLPv2(cfg.model)
    params = _load_params(model, cfg, args.ckpt)
    tx = make_optimizer(cfg.optim, params)
    _save_resolved_config(cfg, args.save_dir)
    stats = (StatsWriter(args.save_dir)
             if args.save_dir and is_main_process() else None)
    ckpt = CheckpointManager(f"{args.save_dir}/ckpt") if args.save_dir else None

    tok = Tokenizer(args.tokenizer, max_len=cfg.max_text_len,
                    vocab_cap=cfg.model.text.vocab_size)

    local_bs = local_batch_size(cfg.global_batch_size)
    if args.synthetic:
        v = cfg.model.video

        def batches(epoch):
            rng = np.random.default_rng(epoch)
            pid = jax.process_index()
            for _ in range(args.steps_per_epoch):
                texts = ["someone does something"] * cfg.global_batch_size
                enc = tok(texts)
                b = {
                    "video": rng.standard_normal(
                        (cfg.global_batch_size, v.num_frames, v.img_size,
                         v.img_size, v.in_chans)).astype(np.float32),
                    "text_ids": enc["text_ids"],
                    "text_mask": enc["text_mask"],
                }
                if dataset_name == "epic":
                    # per-ROW caption relevancy weights [B]
                    # (AdaptiveMaxMargin, model_epic_charades.py:410-441)
                    b["relevancy"] = np.ones(cfg.global_batch_size,
                                             np.float32)
                if local_bs != cfg.global_batch_size:
                    b = {k: val[pid * local_bs:(pid + 1) * local_bs]
                         for k, val in b.items()}
                yield shard_batch(b, mesh)
    else:
        from egovlpv2_tpu.data.datasets import (
            CharadesEgoDataset, EpicKitchensMIRDataset,
        )

        if dataset_name == "epic":
            ds = EpicKitchensMIRDataset(
                args.meta, args.data, split="train",
                num_frames=cfg.model.video.num_frames,
                input_res=cfg.model.video.img_size,
                device_norm=getattr(args, "device_norm", False))
        else:
            ds = CharadesEgoDataset(
                args.meta, args.data, split="train",
                num_frames=cfg.model.video.num_frames,
                input_res=cfg.model.video.img_size,
                device_norm=getattr(args, "device_norm", False))

        def post(batch):
            enc = tok(batch.pop("text"))
            batch.update(enc)
            return batch

        loader = DataLoader(
            ds, local_bs,
            sampler=HostShardSampler(len(ds), jax.process_count(),
                                     jax.process_index(), seed=cfg.seed),
            num_workers=args.num_workers, post_fn=post,
        )

        def batches(epoch):
            from egovlpv2_tpu.data.loader import device_prefetch as dp
            return dp(loader.epoch(epoch), lambda b: shard_batch(b, mesh))

    # per-epoch retrieval validation (trainer_epic.py:200-306 /
    # trainer_charades.py:216-274)
    run_val = _make_dual_val(args, cfg, dataset_name, model, tok, log)

    with mesh:
        step_fn = make_dual_train_step(model, cfg, tx, mesh=mesh)
        state = TrainState(params, tx.init(params),
                           jax.numpy.zeros((), jax.numpy.int32),
                           jax.random.PRNGKey(cfg.seed))
        start_epoch = 0
        if ckpt and getattr(args, "resume", False):
            restored = ckpt.restore(host_state(state))
            if restored is not None:
                from egovlpv2_tpu.parallel.mesh import replicate

                state = replicate(restored, mesh)
                last = ckpt.last_epoch()
                start_epoch = last + 1 if last is not None else 0
                log.info("resumed from step %d (epoch %d)",
                         int(state.step), start_epoch)
        tp = Throughput(cfg.global_batch_size)
        pipe = MetricsPipeline()
        step = int(state.step)

        def handle(ready):
            # previous step's metrics, fetched after dispatching the
            # current one (see cmd_pretrain / bench.py)
            if not ready:
                return
            rstep, m = ready
            rates = tp.tick()
            if rstep % args.log_every == 0:
                full = {**m, **rates}
                log.info("step %d: %s", rstep,
                         {k: round(v, 4) for k, v in full.items()})
                if stats:
                    stats.write(rstep, full)

        guard = PreemptionGuard()
        barrier("dual_ft_start")
        # pre-training validation pass (base_trainer.py:330; --epochs 0
        # + --init_val reproduces the reference eval-mode configs)
        if args.init_val and run_val is not None and start_epoch == 0:
            val = run_val(state.params)
            log.info("init val: %s", {k: round(v, 4) for k, v in val.items()})
            if stats:
                stats.write(step, {f"val_{k}": v for k, v in val.items()})
        for epoch in range(start_epoch, args.epochs):
            epoch_it = batches(epoch)
            if epoch == start_epoch:
                # absorb compile skew before the first collective dispatch
                epoch_it = precompiled_epoch(step_fn, state, epoch_it,
                                             "dual_ft_compile")
            for batch in epoch_it:
                state, metrics = step_fn(state, batch)
                step += 1
                handle(pipe.push(step, metrics))
                if guard.preempted:
                    if ckpt:
                        ckpt.save(step, host_state(state), epoch=epoch - 1)
                        ckpt.wait()
                    log.info("preempted (SIGTERM): saved at step %d, exiting",
                             step)
                    guard.restore()
                    return
            handle(pipe.flush())
            if run_val is not None:
                val = run_val(state.params)
                log.info("epoch %d val: %s", epoch,
                         {k: round(v, 4) for k, v in val.items()})
                if stats:
                    stats.write(step, {f"val_{k}": v for k, v in val.items()})
            if ckpt:
                ckpt.save(step, host_state(state), epoch=epoch)
        guard.restore()
        if ckpt:
            ckpt.wait()
    log.info("done at step %d", step)


def _make_dual_val(args, cfg, dataset_name, model, tok, log):
    """Optional per-epoch retrieval validation for the dual fine-tunes.

    epic: EK-100 MIR official mAP/nDCG over the test split + relevancy pkl
    (trainer_epic.py:200-306). charades: 157 class-prompt mAP over the val
    split (trainer_charades.py:216-274, prompts from --classes, one per
    line). Both honor --sliding_window_stride (base_dataset.py:82-106)."""
    if not getattr(args, "val_meta", None):
        return None
    from egovlpv2_tpu.data.loader import DataLoader
    from egovlpv2_tpu.tasks.retrieval import evaluate_charades, evaluate_mir

    val_data = getattr(args, "val_data", None) or args.data
    stride = getattr(args, "sliding_window_stride", -1)
    num_workers = getattr(args, "num_workers", 4)

    if dataset_name == "epic":
        import pickle

        from egovlpv2_tpu.data.datasets import EpicKitchensMIRDataset

        ds = EpicKitchensMIRDataset(
            args.val_meta, val_data, split="test",
            num_frames=cfg.model.video.num_frames,
            input_res=cfg.model.video.img_size,
            sliding_window_stride=stride,
        )
        rel_path = os.path.join(
            args.val_meta, "relevancy",
            "caption_relevancy_EPIC_100_retrieval_test.pkl")
        with open(rel_path, "rb") as f:
            relevancy = pickle.load(f)

        # official column alignment (metric.py:288-305): video ids from
        # EPIC_100_retrieval_test.csv col 0, unique-sentence ids from
        # EPIC_100_retrieval_test_sentence.csv col 0. Without these the
        # similarity columns are misaligned with the relevancy matrix.
        import pandas as pd

        video_ids = pd.read_csv(os.path.join(
            args.val_meta, "EPIC_100_retrieval_test.csv")).values[:, 0]
        sent_path = os.path.join(
            args.val_meta, "EPIC_100_retrieval_test_sentence.csv")
        if os.path.exists(sent_path):
            sentence_video_ids = pd.read_csv(sent_path).values[:, 0]
        else:
            log.warning("%s missing: MIR validation falls back to the "
                        "square-similarity layout (synthetic-test only)",
                        sent_path)
            video_ids = sentence_video_ids = None

        # optional HTML retrieval visualizer, hooked into the EPIC val the
        # way the reference does (trainer_epic.py:293-298 -> utils/visualizer)
        viz = None
        if getattr(args, "visualize", False) and args.save_dir:
            from egovlpv2_tpu.utils.visualizer import RetrievalVisualizer

            viz = RetrievalVisualizer(os.path.join(args.save_dir, "web"))
        texts_seen: list = []
        epoch_counter = [0]

        def post(batch):
            if viz is not None:
                texts_seen.extend(batch["text"])
            enc = tok(batch.pop("text"))
            batch.update(enc)
            return batch

        def run_val(params):
            loader = DataLoader(ds, args.val_batch_size, post_fn=post,
                                drop_last=False, num_workers=num_workers)
            texts_seen.clear()

            def on_sim(sim_tv, idx):
                if viz is None:
                    return
                n = min(len(texts_seen), sim_tv.shape[0])
                viz.write_epoch(epoch_counter[0], texts_seen[:n], sim_tv[:n],
                                gt_indices=list(range(n)))
                epoch_counter[0] += 1

            return evaluate_mir(model, params, loader.epoch(0),
                                np.asarray(relevancy),
                                video_ids=video_ids,
                                sentence_video_ids=sentence_video_ids,
                                on_sim=on_sim)

        return run_val

    from egovlpv2_tpu.data.datasets import CharadesEgoDataset

    if not getattr(args, "classes", None):
        raise ValueError(
            "--classes (157 class prompts, one per line) is required when "
            "--val_meta is given for charades validation")
    ds = CharadesEgoDataset(
        args.val_meta, val_data, split="val",
        num_frames=cfg.model.video.num_frames,
        input_res=cfg.model.video.img_size,
        sliding_window_stride=stride,
    )
    with open(args.classes) as f:  # 157 class prompts, one per line
        prompts = [line.strip() for line in f if line.strip()]
    enc = tok(prompts)

    def run_val(params):
        loader = DataLoader(ds, args.val_batch_size, drop_last=False,
                            num_workers=num_workers)
        return evaluate_charades(model, params, loader.epoch(0),
                                 enc["text_ids"], enc["text_mask"])

    return run_val


def cmd_ft_epic(args):
    _run_dual_ft(args, "epic")


def cmd_ft_charades(args):
    _run_dual_ft(args, "charades")


def cmd_bench(args):
    import bench

    bench.main()


def _emit_metrics(metrics: Dict[str, Any], out: Optional[str]):
    line = json.dumps({k: float(v) for k, v in metrics.items()})
    print(line)
    if out:
        os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
        with open(out, "w") as f:
            f.write(line + "\n")


def cmd_mq(args):
    """EgoMQ: VSGN on extracted features -> proposals -> detection mAP
    (EgoMQ/Train.py:24-65 + Infer/Eval scripts as one entry)."""
    from egovlpv2_tpu.tasks.orchestrators import run_egomq

    metrics = run_egomq(
        args.anno, args.features, args.out, epochs=args.epochs,
        batch_size=args.batch_size, lr=args.lr, step_size=args.step_size,
        gamma=args.gamma, temporal_scale=args.temporal_scale,
        input_feat_dim=args.input_feat_dim, num_levels=args.num_levels,
        window_stride=args.window_stride, use_vss=args.use_vss,
    )
    _emit_metrics(metrics, args.metrics_out)


def cmd_mq_anno(args):
    """Official Ego4D moments jsons -> the clip-annotation table `mq`
    consumes (EgoMQ/Convert_annotations.py)."""
    from egovlpv2_tpu.downstream.mq_data import write_clip_annotations

    counts = write_clip_annotations(
        args.out, args.moments.split(","), args.info,
        feature_dir=args.features)
    print(json.dumps(counts))


def cmd_nlq(args):
    """EgoNLQ: official nlq json + extracted per-query features -> VSLNet ->
    R@k/mIoU (EgoNLQ/main.py:197-330)."""
    from egovlpv2_tpu.downstream.nlq_data import (
        attach_feature_indices, load_nlq_annotations,
    )
    from egovlpv2_tpu.tasks.orchestrators import run_egonlq

    train_rec = load_nlq_annotations(args.train_anno)
    val_rec = load_nlq_annotations(args.val_anno)

    # window counts come from the extracted feature dumps
    # (<clip>_<ann>_<qidx>.npy written by extract_nlq_features)
    nw: Dict[str, int] = {}
    for r in train_rec + val_rec:
        if r["clip_uid"] in nw:
            continue
        p = os.path.join(
            args.features,
            f"{r['clip_uid']}_{r['annotation_uid']}_{r['query_idx']}.npy")
        if os.path.exists(p):
            nw[r["clip_uid"]] = int(np.load(p, mmap_mode="r").shape[0])
    train_meta = attach_feature_indices(train_rec, nw)
    val_meta = attach_feature_indices(val_rec, nw)
    gt = {(r["clip_uid"], r["annotation_uid"], r["query_idx"]):
          (r["s_time"], r["e_time"]) for r in val_meta if "s_time" in r}

    metrics = run_egonlq(
        train_meta, val_meta, args.features, gt, epochs=args.epochs,
        batch_size=args.batch_size, lr=args.lr, max_pos_len=args.max_pos_len,
        video_feature_dim=args.video_feature_dim,
    )
    _emit_metrics(metrics, args.metrics_out)


def cmd_taskqa(args):
    """EgoTaskQA: QA json + interval videos -> fused backbone + QA head ->
    overall / per-reasoning-type accuracy (EgoTaskQA/main_end2end.py:84-185,
    incl. --resume and --test_only modes :164-200)."""
    from egovlpv2_tpu.data.loader import Tokenizer
    from egovlpv2_tpu.downstream.datasets import EgoTaskQADataset
    from egovlpv2_tpu.models.egovlp import EgoVLPv2
    from egovlpv2_tpu.tasks.orchestrators import run_egotaskqa

    cfg = load_train_config(args.config, args.set)
    with open(args.answer_set) as f:  # output_dim == len(answers)
        num_answers = len([line for line in f if line.strip()])
    reasoning_types = []
    if args.reasoning_types:
        with open(args.reasoning_types) as f:
            reasoning_types = [line.strip() for line in f if line.strip()]

    tok = Tokenizer(args.tokenizer, max_len=cfg.max_text_len,
                    vocab_cap=cfg.model.text.vocab_size)

    class _TokenizedQA:
        def __init__(self, ds):
            self.ds = ds

        def __len__(self):
            return len(self.ds)

        def __getitem__(self, i):
            item = self.ds[i]
            enc = tok([item.pop("text")])
            item["text_ids"] = enc["text_ids"][0]
            item["text_mask"] = enc["text_mask"][0]
            return item

    mk = lambda qa_json, split: _TokenizedQA(EgoTaskQADataset(
        qa_json, args.videos, num_frames=cfg.model.video.num_frames,
        input_res=cfg.model.video.img_size, split=split))
    train = mk(args.qa_train, "train")
    val = mk(args.qa_val, "val")

    backbone_params = None
    if args.ckpt:
        backbone_params = _load_params(EgoVLPv2(cfg.model), cfg, args.ckpt)

    metrics = run_egotaskqa(
        cfg.model, train, val, num_answers,
        reasoning_types=reasoning_types, epochs=args.epochs,
        batch_size=args.batch_size, lr=args.lr, save_dir=args.save_dir,
        resume=args.resume, test_only=args.test_only,
        backbone_params=backbone_params,
    )
    _emit_metrics(metrics, args.metrics_out)


def cmd_qfvs(args):
    """QFVS: packed shot features + oracle summaries -> summary scorer ->
    leave-one-out bipartite F1 (QFVS/main.py:37-54)."""
    from egovlpv2_tpu.downstream.qfvs_data import QFVSDataset, load_videos_tag
    from egovlpv2_tpu.tasks.orchestrators import run_qfvs

    train_ids = [int(x) for x in args.train_videos.split(",")]
    test_id = int(args.test_video)
    feats = {}
    for vid in train_ids + [test_id]:
        with np.load(os.path.join(args.features, f"P0{vid}.npz")) as z:
            feats[str(vid)] = {k: z[k] for k in (
                "seg_len", "feat_concept1", "feat_concept2", "feat_oracle")}

    mk = lambda ids: QFVSDataset(
        args.oracle, args.tags, ids, feats,
        max_segment_num=args.max_segments, max_frame_num=args.max_shots)
    ds = mk(train_ids)
    test_ds = mk([test_id])
    test_items = [test_ds[i] for i in range(len(test_ds))]
    shots_tag = load_videos_tag(args.tags_mat)[test_id - 1]

    metrics = run_qfvs(ds, test_items, shots_tag, epochs=args.epochs,
                       lr=args.lr, top_percent=args.top_percent)
    _emit_metrics(metrics, args.metrics_out)


def _add_common(p, with_data=True):
    p.add_argument("--config", default=None)
    p.add_argument("--set", nargs="*", default=[], help="dotted.key=value")
    p.add_argument("--tokenizer", default="roberta-base")
    # multi-host SPMD (reference: torch.distributed multinode_train_*.py;
    # here one CLI process per host, rendezvous via jax.distributed).
    # --multihost alone auto-discovers everything on Cloud TPU pods; the
    # explicit triple supports SLURM-style launches.
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed before touching devices "
                        "(auto-discovers on Cloud TPU pods)")
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (implies --multihost)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    if with_data:
        p.add_argument("--meta", default=None)
        p.add_argument("--data", default=None)
        p.add_argument("--num_workers", type=int, default=4)


def main(argv=None):
    parser = argparse.ArgumentParser("egovlpv2-tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("pretrain")
    _add_common(p)
    p.add_argument("--save_dir", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--device_norm", action="store_true",
                   help="ship uint8 frames and normalize on device "
                        "(4x fewer host->device bytes per batch)")
    p.add_argument("--neg_param", type=int, default=60,
                   help="scene-negative window seconds; 0 disables")
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--steps_per_epoch", type=int, default=10)
    p.add_argument("--log_every", type=int, default=1)
    p.add_argument("--ckpt_every", type=int, default=1000)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--val_meta", default=None, help="egomcq.json for per-epoch val")
    p.add_argument("--val_data", default=None)
    p.add_argument("--val_synthetic", action="store_true")
    p.add_argument("--val_batches", type=int, default=2)
    p.add_argument("--val_vtc_only", action="store_true")
    p.add_argument("--monitor", default="",
                   help="'max:key' or 'min:key' over epoch metrics, e.g. "
                        "max:ensemble/Inter-video or min:loss_total")
    p.add_argument("--early_stop", type=int, default=0,
                   help="stop after N epochs without improvement (0=off)")
    p.add_argument("--init_val", action="store_true",
                   help="validate once before training (base_trainer.py:86; "
                        "with --epochs 0 this is the reference's eval mode)")
    p.set_defaults(fn=cmd_pretrain)

    e = sub.add_parser("egomcq")
    _add_common(e)
    e.add_argument("--ckpt", default=None, help="torch .pth or orbax dir")
    e.add_argument("--batch_size", type=int, default=4)
    e.add_argument("--val_batches", type=int, default=2,
                   help="synthetic-mode batch count")
    e.add_argument("--vtc_only", action="store_true")
    e.add_argument("--device_norm", action="store_true",
                   help="ship uint8 frames and normalize on device")
    e.add_argument("--out", default=None, help="write metrics JSON here")
    e.set_defaults(fn=cmd_egomcq)

    x = sub.add_parser("extract")
    _add_common(x, with_data=False)
    x.add_argument("--ckpt", default=None)
    x.add_argument("--videos", required=True, help="glob of video files")
    x.add_argument("--out", required=True, help="output feature dir")
    x.add_argument("--inner_batch", type=int, default=64)
    x.add_argument("--input_res", type=int, default=224)
    x.set_defaults(fn=cmd_extract)

    for name, fn in (("ft-epic", cmd_ft_epic), ("ft-charades", cmd_ft_charades)):
        f = sub.add_parser(name)
        _add_common(f)
        f.add_argument("--ckpt", default=None)
        f.add_argument("--save_dir", default=None)
        f.add_argument("--synthetic", action="store_true")
        f.add_argument("--device_norm", action="store_true",
                       help="ship uint8 frames and normalize on device")
        f.add_argument("--epochs", type=int, default=1)
        f.add_argument("--steps_per_epoch", type=int, default=4)
        f.add_argument("--log_every", type=int, default=1)
        f.add_argument("--val_meta", default=None,
                       help="epic: test csv+relevancy meta dir; charades: "
                            "meta dir with metadata_val.csv")
        f.add_argument("--val_data", default=None)
        f.add_argument("--val_batch_size", type=int, default=8)
        f.add_argument("--classes", default=None,
                       help="charades: 157 class prompts, one per line")
        f.add_argument("--sliding_window_stride", type=int, default=-1,
                       help="test-time window expansion stride (-1 = off)")
        f.add_argument("--resume", action="store_true",
                       help="continue from the latest checkpoint in "
                            "save_dir/ckpt (optimizer state + epoch)")
        f.add_argument("--visualize", action="store_true",
                       help="write per-epoch HTML retrieval pages to "
                            "save_dir/web during epic validation")
        f.add_argument("--init_val", action="store_true",
                       help="validate once before training (base_trainer.py"
                            ":330; with --epochs 0 this is eval mode)")
        f.set_defaults(fn=fn)

    b = sub.add_parser("bench")
    b.set_defaults(fn=cmd_bench)

    m = sub.add_parser("mq", help="EgoMQ: train VSGN + infer + detection mAP")
    m.add_argument("--anno", required=True, help="clip annotation json")
    m.add_argument("--features", required=True, help="extracted feature dir")
    m.add_argument("--out", required=True, help="work/output dir")
    m.add_argument("--epochs", type=int, default=10)
    m.add_argument("--batch_size", type=int, default=16)
    m.add_argument("--lr", type=float, default=1e-4)
    m.add_argument("--step_size", type=int, default=10)
    m.add_argument("--gamma", type=float, default=0.5)
    m.add_argument("--temporal_scale", type=int, default=928)
    m.add_argument("--input_feat_dim", type=int, default=4096)
    m.add_argument("--num_levels", type=int, default=5)
    m.add_argument("--window_stride", type=int, default=None)
    m.add_argument("--use_vss", action="store_true")
    m.add_argument("--metrics_out", default=None)
    m.set_defaults(fn=cmd_mq)

    ma = sub.add_parser(
        "mq-anno",
        help="convert official Ego4D moments jsons to clip annotations")
    ma.add_argument("--moments", required=True,
                    help="comma-separated moments_{train,val,test}.json")
    ma.add_argument("--info", required=True,
                    help="ego4d.json video metadata (duration_sec)")
    ma.add_argument("--features", default=None,
                    help="feature dir: skip videos without dumps, record fps")
    ma.add_argument("--out", required=True, help="output clip-annotation json")
    ma.set_defaults(fn=cmd_mq_anno)

    n = sub.add_parser("nlq", help="EgoNLQ: train VSLNet + official metrics")
    n.add_argument("--train_anno", required=True, help="official nlq_train.json")
    n.add_argument("--val_anno", required=True, help="official nlq_val.json")
    n.add_argument("--features", required=True,
                   help="dir of <clip>_<ann>_<qidx>.npy + *_query.npy dumps")
    n.add_argument("--epochs", type=int, default=10)
    n.add_argument("--batch_size", type=int, default=32)
    n.add_argument("--lr", type=float, default=1e-3)
    n.add_argument("--max_pos_len", type=int, default=256)
    n.add_argument("--video_feature_dim", type=int, default=768)
    n.add_argument("--metrics_out", default=None)
    n.set_defaults(fn=cmd_nlq)

    t = sub.add_parser("taskqa", help="EgoTaskQA: QA fine-tune + accuracy")
    _add_common(t, with_data=False)
    t.add_argument("--qa_train", required=True, help="train QA json")
    t.add_argument("--qa_val", required=True, help="val/test QA json")
    t.add_argument("--videos", required=True, help="interval .mp4 dir")
    t.add_argument("--answer_set", required=True,
                   help="answer_set.txt (one answer per line)")
    t.add_argument("--reasoning_types", default=None,
                   help="all_reasoning_types.txt")
    t.add_argument("--ckpt", default=None, help="pretrained backbone ckpt")
    t.add_argument("--save_dir", default=None)
    t.add_argument("--resume", action="store_true")
    t.add_argument("--test_only", action="store_true")
    t.add_argument("--epochs", type=int, default=1)
    t.add_argument("--batch_size", type=int, default=8)
    t.add_argument("--lr", type=float, default=2e-4)
    t.add_argument("--metrics_out", default=None)
    t.set_defaults(fn=cmd_taskqa)

    q = sub.add_parser("qfvs", help="QFVS: summary scorer + bipartite F1")
    q.add_argument("--oracle", required=True, help="Oracle_Summaries root")
    q.add_argument("--tags", required=True, help="Dense_per_shot_tags root")
    q.add_argument("--tags_mat", required=True, help="Tags.mat path")
    q.add_argument("--features", required=True,
                   help="dir of P0<v>.npz packed shot features")
    q.add_argument("--train_videos", required=True, help="e.g. 1,2,3")
    q.add_argument("--test_video", required=True)
    q.add_argument("--epochs", type=int, default=5)
    q.add_argument("--lr", type=float, default=1e-4)
    q.add_argument("--top_percent", type=float, default=0.02)
    q.add_argument("--max_segments", type=int, default=20)
    q.add_argument("--max_shots", type=int, default=200)
    q.add_argument("--metrics_out", default=None)
    q.set_defaults(fn=cmd_qfvs)

    args = parser.parse_args(argv)
    if getattr(args, "multihost", False) or getattr(args, "coordinator", None):
        # must run before any command initializes the jax backend
        from egovlpv2_tpu.parallel.distributed import initialize_multihost

        os.environ.setdefault("JAX_MULTIHOST", "1")
        topo = initialize_multihost(args.coordinator, args.num_processes,
                                    args.process_id)
        print(f"# multihost: process {topo['process_index']}/"
              f"{topo['process_count']}, {topo['local_devices']} local / "
              f"{topo['global_devices']} global devices", flush=True)
    args.fn(args)


if __name__ == "__main__":
    main()
