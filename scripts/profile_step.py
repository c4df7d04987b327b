"""Capture a jax.profiler trace of the flagship pretrain step on the TPU and
print a per-kernel-category time breakdown (parsed from the perfetto trace).

Usage: python scripts/profile_step.py [trace_dir]
Env: BENCH_ATTN / BENCH_PATH_REMAT / BENCH_BATCH as in bench.py.
"""

import collections
import glob
import gzip
import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def categorize(name: str) -> str:
    n = name.lower()
    if "pallas" in n or "divided" in n or "custom-call" in n:
        return "pallas/custom"
    if n.startswith("copy") or "copy" in n[:12]:
        return "copy"
    if "transpose" in n:
        return "transpose"
    if "convert" in n:
        return "convert"
    if "reshape" in n or "bitcast" in n:
        return "reshape"
    if "dot" in n or "conv" in n or "matmul" in n or n.startswith("%dot"):
        return "matmul/conv"
    if "reduce" in n:
        return "reduce"
    if "fusion" in n:
        return "fusion(other)"
    return "other"


def _step_pretrain():
    from egovlpv2_tpu.core.config import ModelConfig, OptimConfig, TrainConfig
    from egovlpv2_tpu.parallel.mesh import make_mesh, shard_batch
    from egovlpv2_tpu.tasks.pretrain import build_pretrain, synthetic_batch

    batch_size = int(os.environ.get("BENCH_BATCH", "16"))
    cfg = TrainConfig(
        model=ModelConfig(compute_dtype="bfloat16",
                          attn_impl=os.environ.get("BENCH_ATTN", "pallas"),
                          remat=False),
        optim=OptimConfig(max_steps=1000),
        path_remat=os.environ.get("BENCH_PATH_REMAT", "0") == "1",
        global_batch_size=batch_size,
    )
    mesh = make_mesh((-1, 1), ("data", "model"))
    batch = synthetic_batch(cfg, batch_size)
    ctx = mesh.__enter__()
    model, init_state = build_pretrain(cfg, mesh=mesh)
    state, step = init_state(batch)
    dev_batch = shard_batch(batch, mesh)
    holder = {"state": state}

    def one():
        holder["state"], metrics = step(holder["state"], dev_batch)
        _ = float(metrics["loss_total"])
    return one


def _step_charades32():
    """The ft-charades 32-frame dual-encoder train step (bench_eval's
    ft_charades_32f workload)."""
    sys.path.insert(0, os.path.dirname(__file__))
    from bench_eval import _model_cfg, _init
    import dataclasses
    import numpy as np
    from egovlpv2_tpu.tasks.retrieval import make_dual_train_step
    from egovlpv2_tpu.train.optimizer import make_optimizer
    from egovlpv2_tpu.train.step import TrainState

    batch, num_frames = 8, 32
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
    data = {
        "video": jnp.asarray(
            rs.randn(batch, num_frames, v.img_size, v.img_size, 3),
            jnp.float32),
        "text_ids": jnp.asarray(rs.randint(4, 1000, (batch, 30)), jnp.int32),
        "text_mask": jnp.ones((batch, 30), jnp.int32),
    }
    holder = {"state": state}

    def one():
        holder["state"], metrics = step_fn(holder["state"], data)
        _ = float(metrics["loss_total"])
    return one


def _step_egomcq16():
    """The egomcq_16f zero-shot eval step (bench_eval's long-S fwd-only
    workload, base 590.8 ms @ batch 4) — identifies where the eval
    milliseconds actually go before any long-S kernel work is prioritized."""
    sys.path.insert(0, os.path.dirname(__file__))
    from bench_eval import _model_cfg, _init
    import numpy as np
    from egovlpv2_tpu.tasks.egomcq import make_egomcq_eval_step

    batch, num_frames = 4, 16
    cfg = _model_cfg(num_frames)
    model, params = _init(cfg)
    eval_step = make_egomcq_eval_step(model, with_vtm=True)
    rs = np.random.RandomState(0)
    v = cfg.model.video
    video5 = jnp.asarray(rs.randn(batch, 5, num_frames, v.img_size,
                                  v.img_size, 3), jnp.float32)
    ids = jnp.asarray(rs.randint(4, 1000, (batch, cfg.max_text_len)),
                      jnp.int32)
    mask = jnp.ones((batch, cfg.max_text_len), jnp.int32)

    def one():
        out = eval_step(params, video5, ids, mask)
        _ = float(jnp.sum(out["vtc"]) + jnp.sum(out["vtm"]))
    return one


_MODES = {"pretrain": _step_pretrain, "charades32": _step_charades32,
          "egomcq16": _step_egomcq16}


def main():
    args = [a for a in sys.argv[1:]]
    mode = "pretrain"
    if args and args[0] in _MODES:
        mode = args.pop(0)
    trace_dir = args[0] if args else "/tmp/egovlp_trace"
    one = _MODES[mode]()
    for _ in range(4):  # compile + server warmup
        one()
    from egovlpv2_tpu.utils.logging import profile_trace
    with profile_trace(trace_dir):
        for _ in range(3):
            one()

    # parse the perfetto trace: flat 'XLA Ops' device track only (the
    # 'Steps' / 'XLA Modules' / name-scope tracks nest and double-count)
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        print(json.dumps({"error": f"no trace under {trace_dir}"}))
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    ops_tids = set()
    for e in events:
        if (e.get("ph") == "M" and e.get("name") == "thread_name"
                and e.get("args", {}).get("name") == "XLA Ops"):
            ops_tids.add((e["pid"], e["tid"]))
    import re

    cat_time = collections.Counter()
    cat_count = collections.Counter()
    op_time = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in ops_tids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        c = categorize(name)
        cat_time[c] += dur
        cat_count[c] += 1
        op_time[re.sub(r"[.\d]+$", "", name)[:44]] += dur
        total += dur
    n_steps = 3
    print(json.dumps({
        "per_step_ms": round(total / n_steps, 1),
        "by_category_ms_per_step": {k: round(v / n_steps, 1) for k, v in
                                    cat_time.most_common()},
        "by_category_n_per_step": {k: v // n_steps
                                   for k, v in cat_count.items()},
        "top_ops_ms_per_step": {k: round(v / n_steps, 1) for k, v in
                                op_time.most_common(25)},
    }, indent=1))


if __name__ == "__main__":
    main()
