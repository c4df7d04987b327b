"""Micro-benchmark: divided-attention kernel vs the XLA einsum path.

Times forward and forward+backward at the framework's hot shapes on the real
TPU chip (serialize with other TPU jobs — one process at a time):

  * space attention, pretrain: B=16, F=4,  N=196, H=12, Dh=64 (197 keys)
  * time attention,  pretrain: B=16, F=4,  N=196 (5 keys per query)
  * space attention, eval/extract: B=4, F=16, N=196

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
]


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jnp.sum(out if isinstance(out, jax.Array) else out[0]).block_until_ready()
    # axon tunnel: force scalar fetches to synchronize
    for _ in range(2):
        float(jnp.sum(fn(*args) if isinstance(out, jax.Array)
                      else fn(*args)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
        float(jnp.sum(r if isinstance(r, jax.Array) else r[0]))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    rs = np.random.RandomState(0)
    for name, axis, b, f, n, h, dh in CASES:
        s = 1 + f * n
        qkv = jnp.asarray(rs.randn(b, s, 3, h, dh), jnp.bfloat16)
        ct = jnp.asarray(rs.randn(b, s, h, dh), jnp.bfloat16)
        scale = dh ** -0.5
        row = {"case": name}
        for impl in ("xla", "pallas"):
            fwd = jax.jit(lambda x, impl=impl: divided_attention(
                x, scale=scale, axis=axis, num_frames=f, impl=impl))
            row[f"{impl}_fwd_ms"] = round(timeit(fwd, qkv), 3)

            def loss(x, impl=impl):
                o = divided_attention(x, scale=scale, axis=axis,
                                      num_frames=f, impl=impl)
                return jnp.sum((o * ct).astype(jnp.float32))

            gfn = jax.jit(jax.grad(loss))
            row[f"{impl}_fwdbwd_ms"] = round(timeit(gfn, qkv), 3)
        row["fwd_speedup"] = round(row["xla_fwd_ms"] / row["pallas_fwd_ms"], 2)
        row["fwdbwd_speedup"] = round(
            row["xla_fwdbwd_ms"] / row["pallas_fwdbwd_ms"], 2)
        print(json.dumps(row))


if __name__ == "__main__":
    main()
