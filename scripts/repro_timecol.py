#!/usr/bin/env python
"""Minimal compile repro for the loop-structured column-chunked TIME kernel.

The r4e chip queue's `EGOVLP_TIME_COL=1 egomcq_16f` run died in ~2 min with
`MosaicError: ... tpu_compile_helper subprocess exit code 1` (a compiler
crash, not a timeout) — but bench_eval's error capture truncates the
message. This compiles JUST the col kernel (fwd, then fwd+bwd) at the
failing shape and prints the full error so the crash can be attributed to a
specific construct (prime suspect: `pl.ds` dynamic sublane offsets at
non-8-aligned positions `1 + f*196` inside `fori_loop`).

Usage: EGOVLP_TIME_COL=1 python scripts/repro_timecol.py [F] [fwd|bwd|both]
       (--interpret as a trailing arg sanity-checks the script on CPU)
"""
import contextlib
import os
import sys
import time
import traceback

os.environ.setdefault("EGOVLP_TIME_COL", "1")
sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from egovlpv2_tpu.ops import divided


def main():
    interpret = "--interpret" in sys.argv
    if interpret:
        sys.argv.remove("--interpret")
    F = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    n, h, dh = 196, 12, 64
    s = F * n + 1
    b = 1
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (b, s, 3, h, dh), jnp.bfloat16)
    scale = dh ** -0.5

    def fwd(x):
        return divided.divided_attention(x, scale=scale, axis="time",
                                         num_frames=F)

    def loss(x):
        return jnp.sum(fwd(x).astype(jnp.float32))

    for name, fn, arg in (("fwd", fwd, qkv),
                          ("bwd", jax.grad(loss), qkv)):
        if which not in (name, "both"):
            continue
        t0 = time.time()
        ctx = (pltpu.force_tpu_interpret_mode() if interpret
               else contextlib.nullcontext())
        try:
            with ctx:
                lowered = jax.jit(fn).lower(arg)
                compiled = lowered.compile()
                out = compiled(arg)
                jax.block_until_ready(out)
            print(f"{name}: OK compile+run in {time.time() - t0:.1f}s "
                  f"(F={F}, S={s})")
        except Exception:
            print(f"{name}: FAILED after {time.time() - t0:.1f}s (F={F}, "
                  f"S={s})")
            traceback.print_exc()
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
