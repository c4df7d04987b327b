"""BASELINE configs 1-4 measured on the real TPU chip.

The driver's bench.py covers BASELINE config 5 (pretrain clips/s/chip); this
script measures the remaining named workloads end to end at production dims
(synthetic inputs — the compute graph is identical to real data):

  1. egomcq_4f / egomcq_16f — zero-shot EgoMCQ eval step (VTC + VTM fused
     stack; trainer_egoclip.py:202-313), clips/s (5 candidates per item).
  2. zs_retrieval — dual-encoder encode throughput (EK-100 ZS path:
     compute_video + compute_text per batch), clips/s.
  3. ft_charades_32f — dual-encoder NormSoftmax train step at 32 frames
     (multinode_train_charades.py), clips/s.
  4. extract — dense window feature extraction videos/s (test_mq.py:25-86
     flow: 600-frame video -> 4-frame windows -> batched encoder).

Usage: python scripts/bench_eval.py [substring filter]
Prints one JSON line per config. Timing per the axon-tunnel rules: scalar
fetch per step, >=3 warmup steps, best-of over timed repeats.
"""

import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from egovlpv2_tpu.core.config import TrainConfig, ModelConfig  # noqa: E402
from egovlpv2_tpu.models.egovlp import EgoVLPv2  # noqa: E402


def _model_cfg(num_frames=4, dual=False):
    cfg = TrainConfig(model=ModelConfig(compute_dtype="bfloat16", remat=False))
    video = dataclasses.replace(cfg.model.video, num_frames=num_frames)
    model = dataclasses.replace(cfg.model, video=video)
    if dual:
        model = dataclasses.replace(
            model, projection="small", projection_dim=256,
            with_itm_head=False, with_mlm_head=False)
    return dataclasses.replace(cfg, model=model)


def _init(cfg, seed=0):
    model = EgoVLPv2(cfg.model)
    v = cfg.model.video
    video = jnp.zeros((1, v.num_frames, v.img_size, v.img_size, 3), jnp.float32)
    ids = jnp.zeros((1, cfg.max_text_len), jnp.int32)
    mask = jnp.ones((1, cfg.max_text_len), jnp.int32)
    params = model.init(jax.random.PRNGKey(seed), video, ids, mask,
                        method=model.init_all)["params"]
    return model, params


def _time_steps(step, warmup=3, timed=6):
    for _ in range(warmup):
        step()
    best = float("inf")
    for _ in range(timed):
        t0 = time.perf_counter()
        step()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_egomcq(num_frames, batch=4):
    from egovlpv2_tpu.tasks.egomcq import make_egomcq_eval_step

    cfg = _model_cfg(num_frames)
    model, params = _init(cfg)
    eval_step = make_egomcq_eval_step(model, with_vtm=True)
    rs = np.random.RandomState(0)
    v = cfg.model.video
    video5 = jnp.asarray(rs.randn(batch, 5, num_frames, v.img_size,
                                  v.img_size, 3), jnp.float32)
    ids = jnp.asarray(rs.randint(4, 1000, (batch, cfg.max_text_len)), jnp.int32)
    mask = jnp.ones((batch, cfg.max_text_len), jnp.int32)

    def step():
        out = eval_step(params, video5, ids, mask)
        float(jnp.sum(out["vtc"]) + jnp.sum(out["vtm"]))

    dt = _time_steps(step)
    clips = batch * 5  # 5 candidate clips scored per item
    return {"metric": f"egomcq_{num_frames}f_clips_per_sec",
            "value": round(clips / dt, 2), "unit": "clips/s",
            "detail": {"batch": batch, "step_ms": round(dt * 1000, 1)}}


def bench_egomcq_feed(num_frames=16, batch=4, dtype="uint8"):
    """Transfer-inclusive MCQ eval: each step ships a fresh host batch
    (f32 host-normalized vs uint8 device-normalized) before scoring —
    measures the real eval loop where the host->device link participates
    (the pure-compute bench_egomcq keeps data resident)."""
    from egovlpv2_tpu.tasks.egomcq import make_egomcq_eval_step

    cfg = _model_cfg(num_frames)
    model, params = _init(cfg)
    eval_step = make_egomcq_eval_step(model, with_vtm=True)
    rs = np.random.RandomState(0)
    v = cfg.model.video
    shape = (batch, 5, num_frames, v.img_size, v.img_size, 3)
    if dtype == "uint8":
        host_video = rs.randint(0, 256, shape).astype(np.uint8)
        # patchify normalizes uint8 on device (imagenet regime)
    else:
        host_video = rs.randn(*shape).astype(np.float32)
    ids = jnp.asarray(rs.randint(4, 1000, (batch, cfg.max_text_len)), jnp.int32)
    mask = jnp.ones((batch, cfg.max_text_len), jnp.int32)

    def step():
        video5 = jnp.asarray(host_video)
        out = eval_step(params, video5, ids, mask)
        float(jnp.sum(out["vtc"]) + jnp.sum(out["vtm"]))

    dt = _time_steps(step)
    clips = batch * 5
    return {"metric": f"egomcq_{num_frames}f_feed_{dtype}_clips_per_sec",
            "value": round(clips / dt, 2), "unit": "clips/s",
            "detail": {"batch": batch, "step_ms": round(dt * 1000, 1),
                       "host_bytes_per_step": host_video.nbytes}}


def bench_zs_retrieval(batch=32, num_frames=4):
    cfg = _model_cfg(num_frames, dual=True)
    model, params = _init(cfg)

    @jax.jit
    def encode(params, video, ids, mask):
        t = model.apply({"params": params}, ids, mask, method=model.compute_text)
        v_ = model.apply({"params": params}, video, method=model.compute_video)
        return jnp.sum(t) + jnp.sum(v_)

    rs = np.random.RandomState(0)
    v = cfg.model.video
    video = jnp.asarray(rs.randn(batch, num_frames, v.img_size, v.img_size, 3),
                        jnp.float32)
    ids = jnp.asarray(rs.randint(4, 1000, (batch, 30)), jnp.int32)
    mask = jnp.ones((batch, 30), jnp.int32)

    def step():
        float(encode(params, video, ids, mask))

    dt = _time_steps(step)
    return {"metric": "zs_retrieval_encode_clips_per_sec",
            "value": round(batch / dt, 2), "unit": "clips/s",
            "detail": {"batch": batch, "step_ms": round(dt * 1000, 1)}}


def bench_ft_charades(batch=8, num_frames=32):
    from egovlpv2_tpu.tasks.retrieval import make_dual_train_step
    from egovlpv2_tpu.train.optimizer import make_optimizer
    from egovlpv2_tpu.train.step import TrainState

    cfg = _model_cfg(num_frames, dual=True)
    cfg = dataclasses.replace(
        cfg, loss=dataclasses.replace(cfg.loss, type="NormSoftmax"),
        max_text_len=30, global_batch_size=batch)
    model, params = _init(cfg)
    tx = make_optimizer(cfg.optim, params)
    step_fn = make_dual_train_step(model, cfg, tx)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32),
                       jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    v = cfg.model.video
    batch_data = {
        "video": jnp.asarray(
            rs.randn(batch, num_frames, v.img_size, v.img_size, 3), jnp.float32),
        "text_ids": jnp.asarray(rs.randint(4, 1000, (batch, 30)), jnp.int32),
        "text_mask": jnp.ones((batch, 30), jnp.int32),
    }

    holder = {"state": state}

    def step():
        s, metrics = step_fn(holder["state"], batch_data)
        holder["state"] = s
        float(metrics["loss_total"])

    dt = _time_steps(step)
    return {"metric": "ft_charades_32f_clips_per_sec",
            "value": round(batch / dt, 2), "unit": "clips/s",
            "detail": {"batch": batch, "num_frames": num_frames,
                       "step_ms": round(dt * 1000, 1)}}


def bench_extract(video_frames=600, num_frames=4, inner_batch=64):
    from egovlpv2_tpu.tasks.extract import FeatureExtractor

    cfg = _model_cfg(num_frames)
    model, params = _init(cfg)
    # production pipeline: ship compact uint8 windows, normalize on device
    # (cli.py cmd_extract). f32 host-normalized frames measured 0.089
    # videos/s on the same link — host->device bytes dominate extraction.
    ex = FeatureExtractor(model, params, inner_batch=inner_batch,
                          device_norm="imagenet")
    rs = np.random.RandomState(0)
    frames = rs.randint(0, 256, (video_frames, 224, 224, 3)).astype(np.uint8)

    def step():
        feats = ex.clip_features(frames, num_frames)
        np.asarray(feats).sum()

    dt = _time_steps(step, warmup=3, timed=4)
    return {"metric": "feat_extract_videos_per_sec",
            "value": round(1.0 / dt, 3), "unit": "videos/s",
            "detail": {"video_frames": video_frames,
                       "windows": video_frames // num_frames,
                       "inner_batch": inner_batch,
                       "video_ms": round(dt * 1000, 1)}}


def _write_looped_egoclip(root, uids=8, rows_per_uid=32, res=256, fps=30,
                          seconds=8):
    """Chunked EgoClip-layout mp4s + metadata, sized so a feed bench can
    stream a few hundred distinct clips from disk (the 'small looped set'
    of real video: same on-disk layout the production loader reads)."""
    import cv2

    data = os.path.join(root, "videos")
    header = ("video_uid\tnarration_time\tclip_start\tclip_end\tclip_text"
              "\ttag_noun\ttag_verb")
    rows = [header]
    rs = np.random.RandomState(0)
    for u in range(uids):
        uid = f"vid_{u:02d}"
        d = os.path.join(data, uid)
        os.makedirs(d, exist_ok=True)
        w = cv2.VideoWriter(os.path.join(d, "0.mp4"),
                            cv2.VideoWriter_fourcc(*"mp4v"), fps, (res, res))
        frame = rs.randint(0, 255, (res, res, 3), np.uint8)
        for _ in range(fps * seconds):
            # cheap temporal variation; content doesn't matter for timing
            frame = np.roll(frame, 7, axis=1)
            w.write(frame)
        w.release()
        span = seconds - 1.2
        for i in range(rows_per_uid):
            t0 = 0.2 + (i / max(rows_per_uid - 1, 1)) * span
            rows.append(f"{uid}\t{t0:.2f}\t{t0:.2f}\t{t0 + 1.0:.2f}\t"
                        f"c does action {i}\t[{i % 40}]\t[{i % 10}]")
    meta = os.path.join(root, "egoclip.csv")
    with open(meta, "w") as f:
        f.write("\n".join(rows))
    return meta, data


def bench_pretrain_feed(batch=16, timed=12, workers=None, tiny=False):
    """Feed-INCLUSIVE pretrain clips/s: chunked mp4s on disk -> the
    production loader (threaded cv2 decode, geometric transforms, uint8
    device_norm feed, MLM collate, prefetch=2) -> the real flagship train
    step on the chip. The reference's hot loop includes DataLoader decode
    (SURVEY §3.1); bench.py's synthetic number excludes it — this measures
    the gap. Same step discipline as bench.py (depth-1 pipelined fetch)."""
    if workers is None:  # r5c sweep knob
        workers = int(os.environ.get("EGOVLP_FEED_WORKERS", "6"))
    import tempfile

    from egovlpv2_tpu.core.config import ModelConfig, OptimConfig, TrainConfig
    from egovlpv2_tpu.data.datasets import EgoClipDataset
    from egovlpv2_tpu.data.loader import DataLoader, Tokenizer, pretrain_post_fn
    from egovlpv2_tpu.parallel.mesh import make_mesh, shard_batch
    from egovlpv2_tpu.tasks.pretrain import build_pretrain

    if tiny:  # CPU smoke lane (tests): 8 virtual devices, toy dims
        from egovlpv2_tpu.tasks.pretrain import tiny_train_config

        cfg = tiny_train_config()
        res = cfg.model.video.img_size
    else:
        cfg = TrainConfig(
            model=ModelConfig(compute_dtype="bfloat16", remat=False),
            optim=OptimConfig(max_steps=1000),
        )
        res = cfg.model.video.img_size  # 224
    cfg = dataclasses.replace(cfg, global_batch_size=batch)

    root = tempfile.mkdtemp(prefix="feed_bench_")
    n_clips = batch * (timed + 4)
    meta, data = _write_looped_egoclip(
        root, uids=8, rows_per_uid=-(-n_clips // 8),
        res=256 if not tiny else max(res, 64))
    ds = EgoClipDataset(meta, data, num_frames=cfg.model.video.num_frames,
                        input_res=res, neg_param=None, device_norm=True)
    tok = Tokenizer("roberta-base", max_len=cfg.max_text_len,
                    vocab_cap=cfg.model.text.vocab_size)
    loader = DataLoader(ds, batch, num_workers=workers,
                        post_fn=pretrain_post_fn(tok, cfg.mlm_prob))

    mesh = make_mesh((-1, 1), ("data", "model"))
    with mesh:
        model, init_state = build_pretrain(cfg, mesh=mesh)
        it = loader.epoch(0)
        first = next(it)
        state, step_fn = init_state(first)
        dev0 = shard_batch(first, mesh)
        for _ in range(3):  # compile + allocator warmup on a resident batch
            state, m = step_fn(state, dev0)
            float(m["loss_total"])

        # timed: stream fresh batches through decode -> H2D -> step with the
        # loss fetched one step behind (same overlap a training loop gets).
        # device_prefetch ships batch N+1 from a feeder thread while step N
        # computes (depth 0 = round-4's inline-put behavior, for A/B).
        from egovlpv2_tpu.data.loader import device_prefetch

        depth = int(os.environ.get("EGOVLP_FEED_DEPTH", "2"))
        n = 0
        prev = None
        t0 = time.perf_counter()
        for db in device_prefetch(it, lambda b: shard_batch(b, mesh), depth):
            state, m = step_fn(state, db)
            if prev is not None:
                float(prev["loss_total"])
            prev = m
            n += 1
            if n >= timed:
                break
        loss = float(prev["loss_total"])
        dt = time.perf_counter() - t0

        # synthetic resident-batch reference in the SAME process/config
        # (uint8 feed): isolates the decode+transfer share
        rs = np.random.RandomState(1)
        v = cfg.model.video
        synth = dict(first)
        synth["video"] = rs.randint(
            0, 256, (batch, v.num_frames, res, res, 3)).astype(np.uint8)
        dev_s = shard_batch(synth, mesh)
        for _ in range(2):
            state, m = step_fn(state, dev_s)
            float(m["loss_total"])
        t1 = time.perf_counter()
        prev = None
        for _ in range(timed):
            state, m = step_fn(state, dev_s)
            if prev is not None:
                float(prev["loss_total"])
            prev = m
        float(prev["loss_total"])
        dt_s = time.perf_counter() - t1

    feed_cps = batch * timed / dt
    synth_cps = batch * timed / dt_s
    return {"metric": "pretrain_feed_clips_per_sec_per_chip",
            "value": round(feed_cps, 2), "unit": "clips/s",
            "detail": {"batch": batch, "timed_steps": timed,
                       "workers": workers, "feed_depth": depth,
                       "step_ms": round(1000 * dt / timed, 1),
                       "synthetic_resident_clips_per_sec": round(synth_cps, 2),
                       "feed_vs_synthetic": round(feed_cps / synth_cps, 3),
                       "loss": loss}}


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else ""
    benches = [
        ("egomcq_4f", lambda: bench_egomcq(4)),
        ("egomcq_16f", lambda: bench_egomcq(16)),
        ("zs_retrieval", bench_zs_retrieval),
        ("ft_charades_32f", bench_ft_charades),
        ("extract", bench_extract),
        ("feed_f32", lambda: bench_egomcq_feed(dtype="f32")),
        ("feed_uint8", lambda: bench_egomcq_feed(dtype="uint8")),
        # named so the queued `bench_eval.py feed` (MCQ transfer bench)
        # doesn't also pull this heavier run
        ("pretrain_realdata", bench_pretrain_feed),
    ]
    for name, fn in benches:
        if only and only not in name:
            continue
        try:
            print(json.dumps(fn()), flush=True)
        except Exception as exc:  # report and continue (e.g. HBM OOM)
            print(json.dumps({"metric": name, "error": f"{type(exc).__name__}: "
                              f"{str(exc)[:200]}"}), flush=True)


if __name__ == "__main__":
    main()
