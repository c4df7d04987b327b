#!/usr/bin/env python
"""Bisection repro for the EGOVLP_TIME_PM Mosaic SIGABRT (round-4 handoff).

The r4h chip queue's first `EGOVLP_TIME_PM=1 egomcq_16f` exposure died with
`tpu_compile_helper subprocess exit signal SIGABRT (6)` and the round ended
before a root cause. This compiles JUST the patch-major TIME attention
(fwd / bwd) at the failing shape in named variants that isolate one suspect
construct each; run one variant per process (the gate flags are read at
module import).

Variants:
  base      F=16, N=196 (S=3137) — the exact failing config (64-row partial
            last window: 3136 = 24*128 + 64)
  f32       F=32, N=196 (S=6273) — exact windows (6272 = 49*128)
  exact192  F=16, N=192 (S=3073) — no partial window at win=128
  win112    F=16, N=196, win=112 — no partial window (3136 = 28*112)
  zerobias  base + _pm_win_bias patched to zeros — isolates the iota/where
            NEG_INF block-diag constant
  hp1       base + one head per program — isolates lane-block width
  win16     F=16, win=16 — one group per window (trivial bias)

Usage: python scripts/repro_timepm.py <variant> [fwd|bwd|both]
       [--compile-only] [--interpret]
Prints one JSON line per direction: {"variant":..., "dir":..., "ok":...}.
"""
import contextlib
import json
import os
import sys
import time
import traceback

VARIANTS = {
    "base": dict(F=16, n=196),
    "f32": dict(F=32, n=196),
    "exact192": dict(F=16, n=192),
    "win112": dict(F=16, n=196, win=112),
    # larger exact-divisor windows (3136 = 14*224 = 7*448): bigger MXU
    # tiles / fewer per-window ops at 14x / 28x key waste (vs 112's 7x) —
    # candidate fix for the r5a residual (511 ms vs the ~360 the FLOP cut
    # predicts; suspect: per-op overhead of [112,112] tiles)
    "win224": dict(F=16, n=196, win=224),
    "win448": dict(F=16, n=196, win=448),
    "f32w224": dict(F=32, n=196, win=224),
    "f32w448": dict(F=32, n=196, win=448),
    "zerobias": dict(F=16, n=196, zerobias=True),
    "hp1": dict(F=16, n=196, hp1=True),
    "win16": dict(F=16, n=196, win=16),
}


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    compile_only = "--compile-only" in sys.argv
    interpret = "--interpret" in sys.argv
    name = argv[0] if argv else "base"
    which = argv[1] if len(argv) > 1 else "both"
    v = VARIANTS[name]
    os.environ["EGOVLP_TIME_PM"] = "1"
    if "win" in v:
        os.environ["EGOVLP_TIME_PM_WIN"] = str(v["win"])
    sys.path.insert(0, ".")

    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from egovlpv2_tpu.ops import divided

    if v.get("zerobias"):
        divided._pm_win_bias = lambda win, f: jnp.zeros((win, win),
                                                        jnp.float32)
    if v.get("hp1"):
        orig = divided._packed_heads
        divided._packed_heads = (
            lambda h, dh, s, itemsize, budget=0: 1 if orig(
                h, dh, s, itemsize, budget=budget) else None)

    F, n, h, dh = v["F"], v["n"], 12, 64
    s = F * n + 1
    qkv = jax.random.normal(jax.random.PRNGKey(0), (1, s, 3, h, dh),
                            jnp.bfloat16)
    scale = dh ** -0.5

    def fwd(x):
        return divided.divided_attention(x, scale=scale, axis="time",
                                         num_frames=F)

    def loss(x):
        return jnp.sum(fwd(x).astype(jnp.float32))

    rc = 0
    for dname, fn in (("fwd", fwd), ("bwd", jax.grad(loss))):
        if which not in (dname, "both"):
            continue
        t0 = time.time()
        ctx = (pltpu.force_tpu_interpret_mode() if interpret
               else contextlib.nullcontext())
        row = {"variant": name, "dir": dname, "F": F, "S": s}
        try:
            with ctx:
                compiled = jax.jit(fn).lower(qkv).compile()
                if not compile_only:
                    jax.block_until_ready(compiled(qkv))
            row["ok"] = True
        except Exception as e:
            row["ok"] = False
            row["error"] = f"{type(e).__name__}: {e}"[:2000]
            traceback.print_exc()
            rc = 1
        row["secs"] = round(time.time() - t0, 1)
        print(json.dumps(row), flush=True)
    return rc


if __name__ == "__main__":
    sys.exit(main())
