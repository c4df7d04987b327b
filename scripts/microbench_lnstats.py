#!/usr/bin/env python
"""LayerNorm-stats reduction probes (the 134 ms eval convert bucket).

The r5b PM 16f profile shows `convert_reduce_fusion` at 134.4 ms/step over
~367 convert ops — ~0.37 ms per fused stat reduce of a [4, 3137, 768]
activation whose traffic floor is ~24 us (15x off). Hypothesis: XLA lowers
the LANE-dimension (768-wide) mean/var reduces as VPU shuffle trees; the
MXU can do the same reduction as a [rows, 768] x [768, 8] ones-matmul at
memory bandwidth. These probes measure, at the eval LN shape:

  mean_lane      jnp.mean(x.f32, -1)                  (the flax lowering)
  mean_mxu       dot(x, ones[768, 8])[..., :1] / D    (MXU segmented sum)
  ln_xla         the repo's _ln_xla (convert + 2 lane reduces + normalize)
  ln_mxu         prototype: stats via 2 ones-dots, normalize elementwise

One JSON line per case; chained-iteration timing (see microbench_attn.py).
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

from egovlpv2_tpu.ops.layernorm import _ln_xla  # noqa: E402

B, S, D = 4, 3137, 768
N_ITER = 24
EPS = 1e-5


def _measure(run_fn, *args, repeats=4):
    float(jnp.sum(run_fn(*args).astype(jnp.float32)))
    float(jnp.sum(run_fn(*args).astype(jnp.float32)))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(jnp.sum(run_fn(*args).astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best


def _bench(name, step_fn, *args):
    @jax.jit
    def run(a, *rest):
        def body(_, x):
            return step_fn(x, *rest)
        return jax.lax.fori_loop(0, N_ITER, body, a)

    @jax.jit
    def run1(a, *rest):
        return step_fn(a, *rest)

    t1 = _measure(run1, *args)
    tn = _measure(run, *args)
    ms = (tn - t1) / (N_ITER - 1) * 1000
    print(json.dumps({"case": name, "ms": round(ms, 4)}), flush=True)


def main():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, S, D), jnp.bfloat16)
    sc = jnp.ones((D,), jnp.float32)
    bi = jnp.zeros((D,), jnp.float32)
    ones8 = jnp.zeros((D, 8), jnp.bfloat16).at[:, 0].set(1)
    eps = jnp.bfloat16(1e-30)

    def mean_lane(x):
        m = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
        return x + m.astype(x.dtype) * eps

    def mean_mxu(x):
        m = jax.lax.dot_general(
            x, ones8, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[..., :1] / D
        return x + m.astype(x.dtype) * eps

    def ln_xla(x):
        return x + _ln_xla(x, sc, bi, EPS) * eps

    def ln_mxu(x):
        xf = x.astype(jnp.float32)
        s1 = jax.lax.dot_general(
            x, ones8, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[..., :1]
        s2 = jax.lax.dot_general(
            xf * xf, ones8.astype(jnp.float32), (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[..., :1]
        mean = s1 / D
        var = jnp.maximum(s2 / D - mean * mean, 0.0)
        y = (xf - mean) * jax.lax.rsqrt(var + EPS) * sc + bi
        return x + y.astype(x.dtype) * eps

    for name, fn in (("mean_lane", mean_lane), ("mean_mxu", mean_mxu),
                     ("ln_xla", ln_xla), ("ln_mxu", ln_mxu)):
        _bench(name, fn, x)


if __name__ == "__main__":
    main()
