#!/usr/bin/env python
"""Compile-only pre-flight for every env-gated kernel variant (VERDICT r4
task 2).

Round 4 burned ~33 min of shared chip time discovering Mosaic compile
crashes at full-bench granularity (two HTTP-500s + a SIGABRT) that a
seconds-long `.lower().compile()` would have caught. This runs each gated
kernel config through an AOT compile on the chip (no execution, no bench),
one subprocess per variant (the gate flags are read at module import), and
appends one validated JSON row per check to the results file. Run it at the
top of every chip queue; exit code 1 if any check fails.

Usage: python scripts/chip_preflight.py [results.jsonl] [filter-substring]
"""
import json
import os
import subprocess
import sys
import time

# (tag, argv, extra_env) — each argv prints {"...", "ok": bool} JSON rows.
CHECKS = [
    ("timepm_f16", [sys.executable, "scripts/repro_timepm.py", "base",
                    "both", "--compile-only"], {}),
    ("timepm_f32", [sys.executable, "scripts/repro_timepm.py", "f32",
                    "both", "--compile-only"], {}),
    ("timepm_w224", [sys.executable, "scripts/repro_timepm.py", "win224",
                     "both", "--compile-only"], {}),
    ("timepm_w448", [sys.executable, "scripts/repro_timepm.py", "win448",
                     "both", "--compile-only"], {}),
    ("ln_pallas", [sys.executable, "scripts/chip_preflight.py",
                   "--worker-ln"], {"EGOVLP_LN_IMPL": "pallas"}),
    ("space_cls_allh", [sys.executable, "scripts/chip_preflight.py",
                        "--worker-allh"], {"EGOVLP_SPACE_CLS_ALLH": "1"}),
    ("timepm_cls_allh", [sys.executable, "scripts/chip_preflight.py",
                         "--worker-allh", "--pm"],
     {"EGOVLP_SPACE_CLS_ALLH": "1", "EGOVLP_TIME_PM": "1"}),
    ("pm_hoist", [sys.executable, "scripts/chip_preflight.py",
                  "--worker-hoist"], {"EGOVLP_PM_HOIST": "1"}),
    ("ln_mxu", [sys.executable, "scripts/chip_preflight.py",
                "--worker-ln", "--mxu"], {"EGOVLP_LN_STATS_MXU": "1"}),
    ("timepm_f32w224", [sys.executable, "scripts/repro_timepm.py",
                        "f32w224", "both", "--compile-only"], {}),
    ("timepm_f32w448", [sys.executable, "scripts/repro_timepm.py",
                        "f32w448", "both", "--compile-only"], {}),
]


def _worker_hoist():
    """Compile a SpaceTimeBlock fwd+bwd with the hoisted patch-major
    permutes (EGOVLP_PM_HOIST=1) at the 16f eval shape."""
    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp
    from egovlpv2_tpu.core.config import FusionConfig, VideoEncoderConfig
    from egovlpv2_tpu.models.video import SpaceTimeBlock

    f, d, heads = 16, 768, 12
    cfg = VideoEncoderConfig(img_size=224, patch_size=16, embed_dim=d,
                             depth=1, num_heads=heads, num_frames=f)
    fus = FusionConfig(num_fuse_block=1, dim_video=d, dim_text=d)
    s = 1 + f * 196
    x = jnp.zeros((4, s, d), jnp.bfloat16)
    blk = SpaceTimeBlock(cfg, fus, fused=False, attn_impl="pallas",
                         dtype=jnp.bfloat16)
    params = jax.eval_shape(lambda: blk.init(jax.random.PRNGKey(0), x, f))

    def loss(p, x):
        return jnp.sum(blk.apply(p, x, f).astype(jnp.float32))

    p0 = blk.init(jax.random.PRNGKey(0), x, f)
    del params
    for name, fn in (("fwd", lambda p, x: loss(p, x)),
                     ("bwd", jax.grad(loss, argnums=1))):
        t0 = time.time()
        jax.jit(fn).lower(p0, x).compile()
        print(json.dumps({"check": f"hoist_{name}", "ok": True,
                          "secs": round(time.time() - t0, 1)}), flush=True)


def _worker_allh():
    """Compile the packed frame-block kernels fwd+bwd with the all-heads
    CLS pass (EGOVLP_SPACE_CLS_ALLH=1 in env): space @ the pretrain shape,
    or (--pm) the patch-major TIME regime @ the 16f eval shape."""
    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp
    from egovlpv2_tpu.ops.divided import divided_attention

    pm = "--pm" in sys.argv
    axis, b, f = ("time", 4, 16) if pm else ("space", 16, 4)
    s = 1 + f * 196
    qkv = jnp.zeros((b, s, 3, 12, 64), jnp.bfloat16)

    def loss(x):
        out = divided_attention(x, scale=0.125, axis=axis, num_frames=f,
                                impl="pallas")
        return jnp.sum(out.astype(jnp.float32))

    for name, fn in (("fwd", loss), ("bwd", jax.grad(loss))):
        t0 = time.time()
        jax.jit(fn).lower(qkv).compile()
        print(json.dumps({"check": f"allh_{'pm_' if pm else ''}{name}",
                          "ok": True, "secs": round(time.time() - t0, 1)}),
              flush=True)


def _worker_ln():
    """Compile the Pallas LN (or, --mxu, the MXU-stats XLA LN routed by
    EGOVLP_LN_STATS_MXU=1) fwd+bwd at the 16f eval shape."""
    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp
    from egovlpv2_tpu.ops.layernorm import layernorm

    impl = "auto" if "--mxu" in sys.argv else "pallas"
    x = jnp.zeros((4, 3137, 768), jnp.bfloat16)
    sc = jnp.ones((768,), jnp.float32)
    bi = jnp.zeros((768,), jnp.float32)

    def fwd(x, sc, bi):
        return layernorm(x, sc, bi, impl=impl)

    def loss(x, sc, bi):
        return jnp.sum(fwd(x, sc, bi).astype(jnp.float32))

    pfx = "lnmxu" if impl == "auto" else "ln"
    for name, fn in (("fwd", fwd), ("bwd", jax.grad(loss, argnums=(0, 1, 2)))):
        t0 = time.time()
        jax.jit(fn).lower(x, sc, bi).compile()
        print(json.dumps({"check": f"{pfx}_{name}", "ok": True,
                          "secs": round(time.time() - t0, 1)}), flush=True)


def main():
    if "--worker-ln" in sys.argv:
        _worker_ln()
        return 0
    if "--worker-allh" in sys.argv:
        _worker_allh()
        return 0
    if "--worker-hoist" in sys.argv:
        _worker_hoist()
        return 0
    results = sys.argv[1] if len(sys.argv) > 1 else "/tmp/chip_preflight.jsonl"
    filt = sys.argv[2] if len(sys.argv) > 2 else ""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from queue_log import extract_objects

    failures = 0
    for tag, argv, env in CHECKS:
        if filt and filt not in tag:
            continue
        t0 = time.time()
        proc = subprocess.run(
            argv, capture_output=True, text=True, timeout=1200,
            env={**os.environ, **env},
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        rows = extract_objects(proc.stdout)
        ok = bool(rows) and all(r.get("ok", False) for r in rows
                                if "ok" in r) and proc.returncode == 0
        if not ok:
            failures += 1
            if not rows:
                rows = [{"no_json": True,
                         "tail": (proc.stdout + proc.stderr)[-400:]}]
        with open(results, "a") as f:
            for r in rows:
                f.write(json.dumps(
                    {"experiment": f"preflight:{tag}", "result": r}) + "\n")
        print(f"preflight {tag}: {'OK' if ok else 'FAIL'} "
              f"({time.time() - t0:.0f}s)", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
