"""Micro-benchmark: divided-attention kernel vs the XLA einsum path.

Times forward and forward+backward at the framework's hot shapes on the real
TPU chip (serialize with other TPU jobs — one process at a time).

Timing method: the axon tunnel adds a ~28 ms round-trip per scalar fetch, so
per-call timing is meaningless. Instead each measurement runs N chained
iterations of the op inside ONE jit (each iteration's input depends on the
previous output, so iterations serialize on device) and reports
(t_N - t_1) / (N - 1).

Usage: python scripts/microbench_attn.py   (prints one JSON line per case)
"""

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

from egovlpv2_tpu.ops.divided import divided_attention  # noqa: E402

CASES = [
    ("space_pretrain", "space", 16, 4, 196, 12, 64),
    ("time_pretrain", "time", 16, 4, 196, 12, 64),
    ("space_eval16f", "space", 4, 16, 196, 12, 64),
    ("time_eval16f", "time", 4, 16, 196, 12, 64),
    # ft-charades trains at 32 frames (S=6273)
    ("space_ft32f", "space", 2, 32, 196, 12, 64),
    ("time_ft32f", "time", 2, 32, 196, 12, 64),
]

N_ITER = 24


def _chained(step_fn, n):
    """n serialized applications of step_fn inside one jit."""

    @jax.jit
    def run(qkv):
        def body(_, x):
            return step_fn(x)
        return jax.lax.fori_loop(0, n, body, qkv)

    return run


def _measure(run_fn, qkv, repeats=4):
    float(jnp.sum(run_fn(qkv).astype(jnp.float32)))  # compile + warmup
    float(jnp.sum(run_fn(qkv).astype(jnp.float32)))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(jnp.sum(run_fn(qkv).astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rs = np.random.RandomState(0)
    only = sys.argv[1] if len(sys.argv) > 1 else ""
    for name, axis, b, f, n, h, dh in CASES:
        if only and only not in name:
            continue
        s = 1 + f * n
        qkv = jnp.asarray(rs.randn(b, s, 3, h, dh), jnp.bfloat16)
        scale = dh ** -0.5
        row = {"case": name, "shape": [b, s, h, dh]}
        for impl in ("xla", "pallas"):

            def fwd_step(x, impl=impl):
                o = divided_attention(x, scale=scale, axis=axis,
                                      num_frames=f, impl=impl)
                # feed the output back so iterations serialize
                return x + jnp.concatenate(
                    [o[:, :, None], o[:, :, None], o[:, :, None]],
                    axis=2) * jnp.bfloat16(1e-30)

            def grad_step(x, impl=impl):
                g = jax.grad(lambda q: jnp.sum(
                    divided_attention(q, scale=scale, axis=axis,
                                      num_frames=f, impl=impl)
                    .astype(jnp.float32)))(x)
                return x + g * jnp.bfloat16(1e-30)

            for tag, step in (("fwd", fwd_step), ("fwdbwd", grad_step)):
                t1 = _measure(_chained(step, 1), qkv)
                tn = _measure(_chained(step, N_ITER), qkv)
                row[f"{impl}_{tag}_ms"] = round(
                    (tn - t1) / (N_ITER - 1) * 1000, 3)
        for tag in ("fwd", "fwdbwd"):
            x, p_ = row[f"xla_{tag}_ms"], row[f"pallas_{tag}_ms"]
            row[f"{tag}_speedup"] = round(x / p_, 2) if p_ > 0 else None
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
