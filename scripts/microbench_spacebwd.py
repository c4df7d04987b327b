#!/usr/bin/env python
"""Space-attention backward decomposition probes (VERDICT r4 task 5).

The round-4 forensics ASSERTED the space backward's 4.3x gap to its traffic
floor is structural MXU underfill ([196, 64] tiles: K=64 -> 50% systolic
fill, M=N=196 -> 76% tile fill) without measuring it. These probes time the
constituent matmul shapes as XLA batched dots on the chip at one bwd call's
work volume (B=16, H=12, F=4 -> 768 per-head-frame tiles, 96x2 CLS passes)
against widened comparators:

  logits_k64 / logits_k128   the QK^T shape at K=64 vs K=128 (same M, N)
  pv_n64     / pv_n128       the PV / dQ / dK shape at N=64 vs N=128
  cls_m8                     the per-head CLS-row pass's M=8 logits matmul
  cls_allh                   the all-heads segmented-reduce CLS equivalent

If K=128 runs at ~the same wall time as K=64 (2x the FLOPs for free), the
50%-fill claim is confirmed; same logic for N. cls_m8 vs cls_allh measures
the EGOVLP_SPACE_CLS_ALLH win in isolation. XLA probes are a fill-behavior
proxy (an upper bound) for the Mosaic kernels' in-loop rates; end-to-end
arbitration stays with bench.py (rule of two).

Timing: N chained iterations inside one jit (the tunnel adds ~28 ms RTT per
fetch; see scripts/microbench_attn.py). One JSON line per case.
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

N_ITER = 24
G_TILES = 16 * 12 * 4   # per-head-frame tiles in one pretrain bwd call
G_CLS = 16 * 12         # per-head CLS passes in one call
S, N, DH = 785, 196, 64


def _measure(run_fn, *args, repeats=4):
    float(jnp.sum(run_fn(*args).astype(jnp.float32)))  # compile + warmup
    float(jnp.sum(run_fn(*args).astype(jnp.float32)))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(jnp.sum(run_fn(*args).astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best


def _chained_pair(step_fn, n):
    """step_fn(a, b) -> a'; iterate with a serialized dependency."""

    @jax.jit
    def run(a, b):
        def body(_, x):
            return step_fn(x, b)
        return jax.lax.fori_loop(0, n, body, a)

    return run


def _bench(name, step_fn, a, b, useful_flops):
    t1 = _measure(_chained_pair(step_fn, 1), a, b)
    tn = _measure(_chained_pair(step_fn, N_ITER), a, b)
    ms = (tn - t1) / (N_ITER - 1) * 1000
    print(json.dumps({
        "case": name, "ms": round(ms, 4),
        "useful_tflops": round(useful_flops / (ms * 1e-3) / 1e12, 1),
    }), flush=True)
    return ms


def main():
    rs = np.random.RandomState(0)

    def arr(*shape):
        return jnp.asarray(rs.randn(*shape), jnp.bfloat16)

    eps = jnp.bfloat16(1e-30)

    # -- logits shape: [G, M, K] x [G, N, K] -> [G, M, N], K=64 vs 128 ----
    for k in (64, 128):
        q = arr(G_TILES, N, k)
        kk = arr(G_TILES, N, k)

        def logits(q, kk):
            out = jnp.einsum("gmk,gnk->gmn", q, kk,
                             preferred_element_type=jnp.float32)
            return q + out[..., :q.shape[-1]].astype(q.dtype) * eps

        _bench(f"logits_k{k}", logits, q, kk, 2 * G_TILES * N * N * k)

    # -- PV / dQ / dK shape: [G, M, 196] x [G, 196, N], N=64 vs 128 ------
    for n_out in (64, 128):
        p = arr(G_TILES, N, N)
        v = arr(G_TILES, N, n_out)

        def pv(p, v):
            out = jnp.einsum("gmn,gnk->gmk", p, v,
                             preferred_element_type=jnp.float32)
            return p + out[..., :1].astype(p.dtype) * eps

        _bench(f"pv_n{n_out}", pv, p, v, 2 * G_TILES * N * N * n_out)

    # -- per-head CLS-row pass: M=8 logits over the full sequence --------
    q8 = arr(G_CLS, 8, DH)
    kf = arr(G_CLS, S, DH)

    def cls_m8(q8, kf):
        out = jnp.einsum("gmk,gnk->gmn", q8, kf,
                         preferred_element_type=jnp.float32)
        return q8 + out[..., :DH].astype(q8.dtype) * eps

    _bench("cls_m8", cls_m8, q8, kf, 2 * G_CLS * 8 * S * DH)

    # -- all-heads segmented CLS equivalent: one elementwise product +
    #    block-ones reduce per program (hp=2 heads, W=128 lanes) ---------
    hp, w = 2, 128
    g_prog = 16 * 6  # bwd grid at the pretrain shape
    kw = arr(g_prog, S, w)
    q0 = arr(g_prog, 1, w)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (w, hp), 0) // DH
    cols = jax.lax.broadcasted_iota(jnp.int32, (w, hp), 1)
    seg = (lanes == cols).astype(jnp.float32)

    def cls_allh(kw, q0):
        prod = (kw * q0).astype(jnp.float32)
        l0 = jnp.einsum("gsw,wh->gsh", prod, seg)
        return kw + l0[..., :1].astype(kw.dtype) * eps

    _bench("cls_allh", cls_allh, kw, q0, 2 * g_prog * S * w * hp)


if __name__ == "__main__":
    main()
