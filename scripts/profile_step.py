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


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/egovlp_trace"
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
    with mesh:
        model, init_state = build_pretrain(cfg, mesh=mesh)
        state, step = init_state(batch)
        dev_batch = shard_batch(batch, mesh)
        for _ in range(4):  # compile + server warmup
            state, metrics = step(state, dev_batch)
            _ = float(metrics["loss_total"])
        jax.profiler.start_trace(trace_dir)
        for _ in range(3):
            state, metrics = step(state, dev_batch)
            _ = float(metrics["loss_total"])
        jax.profiler.stop_trace()

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
