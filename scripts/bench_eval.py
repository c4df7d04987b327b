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
