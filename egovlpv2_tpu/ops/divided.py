"""Packed Pallas kernel for divided space-time attention (the hot op).

Replicates the reference semantics of `EgoVLPv2/model/video_transformer.py:117-153`
(VarAttention.attn with the CLS splice): the CLS query attends over the full
space-time sequence; patch queries attend within their frame (space axis) or
within their patch column (time axis), plus the broadcast CLS key/value.

Formulation (informed by the round-2 step profile): divided attention is
computed as ONE dense masked attention over the full [S, S] token grid per
(batch, head) program. The group structure is static, so the mask is
generated in-kernel from iota comparisons — row 0 (CLS query) sees all keys,
column 0 (CLS key) is visible to all queries, and patch pairs are allowed
when they share a frame (space) or a patch column (time):

    allowed(i, j) = (i == 0) | (j == 0) | (grp(i) == grp(j))
    grp(x) = (x-1) // N  for space,  (x-1) % N  for time

A masked softmax over the dense row equals the grouped softmax exactly
(masked logits vanish), so this is bit-equivalent math to the reference's
einops regroup — without the regroup. Compared to a per-group formulation,
the dense [S,64]x[64,S] dots trade ~4x (space) / ~150x (time) redundant
FLOPs for MXU-shaped work; measured on v5e this wins by a wide margin at the
4-frame pretrain shape because the grouped variant is launch- and VPU-bound.
Logits/probabilities never leave VMEM; the custom-VJP backward recomputes
them in VMEM (flash-style) and emits dqkv in one pass.

Three regimes, chosen by `divided_attention`:

  * **lane-packed dense** (production pretrain: S <= 1536 and 128-alignable
    head groups): the kernel reads the qkv projection output [B, S, 3*H*Dh]
    directly through lane-block specs — q/k/v are lane slices of the same
    array — and writes [B, S, H*Dh] for the output projection. Zero layout
    copies in or out (XLA cannot fuse a transpose into a custom-call
    operand, so any other layout costs two HBM copies per call). Several
    heads per program amortize the mask build; the backward emits dq/dk/dv
    as three lane-blocked outputs whose concat fuses into the qkv-Dense
    backward.
  * **per-head frame-block (windowed) space** (long sequences, 16/32-frame
    eval/fine-tune): query tiles are exactly one frame (N rows); each tile
    dots against its own N keys plus an 8-wide CLS key block, joint softmax
    across both logit blocks. The in-frame mask is identically ZERO (every
    key in a tile's window shares its frame), so the only mask constant is
    a [N, 8] CLS-column bias — FLOPs drop from S^2 to ~S*(N+8) per head
    (16x at 16 frames, 32x at 32) with bit-identical masked-softmax math,
    and the backward fits scoped VMEM at any S. The CLS row (full-sequence
    attention) runs as a separate 8-row dense pass. Frame-aligned tiles
    keep every mask a shared constant: Mosaic hoists per-tile constants and
    stack-allocates ALL of them, so tile-varying masks OOM scoped vmem at
    S=6273 (measured 17M/16M).
  * **per-head dense** ([3, B, H, S, Dh]; long-S time axis / odd head
    geometries): one program per (batch, head) DMAs contiguous [S, Dh]
    slabs after an explicit transpose. Beyond S=1536 the TIME backward
    routes through the XLA einsum recompute (the in-kernel dense recompute
    exceeds scoped VMEM); the windowed SPACE backward is in-kernel at any S.

Measured v5e step impact at batch 16: 697 ms (XLA path) -> 376 ms (packed
kernel); per-op: 2.0x XLA forward, 1.7-1.9x fwd+bwd at the pretrain shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _group_ids(idx: jax.Array, axis: str, n_patches: int) -> jax.Array:
    """Group id per token index; CLS (index 0) is handled by explicit
    row/col-0 clauses, so its (wrapped) group value is never consulted."""
    if axis == "space":
        return (idx - 1) // n_patches
    return (idx - 1) % n_patches


def _mask_bias(lo: int, bq: int, s: int, axis: str, n_patches: int):
    """Group-mask bias for query rows [lo, lo+bq) x key cols [0, s)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (bq, s), 0) + lo
    cols = jax.lax.broadcasted_iota(jnp.int32, (bq, s), 1)
    allowed = (rows == 0) | (cols == 0) | (
        _group_ids(rows, axis, n_patches) == _group_ids(cols, axis, n_patches)
    )
    return jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)


def _cls_col_bias(bq: int) -> jax.Array:
    """[bq, 8] bias for the standalone CLS key block of the frame-block
    kernels: only column 0 (the real CLS key) is live; columns 1..7 are
    frame-0 patch keys already covered by some frame window."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (bq, 8), 1)
    return jnp.where(cols == 0, 0.0, NEG_INF).astype(jnp.float32)


# Above this S the space axis switches to the frame-block (windowed) kernels
# on the per-head path (the pretrain shape S=785 keeps the measured-optimal
# lane-packed whole-row dense form). Env-overridable for experiments.
import os as _os

_SPACE_WINDOW_MIN_S = int(_os.environ.get("EGOVLP_SPACE_WINDOW_MIN", "1024"))


def _windowed(axis: str, s: int) -> bool:
    return axis == "space" and s > _SPACE_WINDOW_MIN_S


# The dense formulation wastes ~S/(F+1) of its key FLOPs on the time axis
# (~150x at 4 frames). Up to this frame count the packed kernels use the
# frame-pair formulation instead: logits via rowwise dots (VPU elementwise
# mul + lane reduce), which is bandwidth-bound rather than MXU-bound.
_TIME_FP_MAX_F = int(_os.environ.get("EGOVLP_TIME_FP_MAX_F", "8"))


def _time_fp(axis: str, num_frames: int) -> bool:
    return axis == "time" and num_frames <= _TIME_FP_MAX_F


# All-heads MXU segmented-reduce formulation of the frame-pair kernels
# (see _time_fp_attend_mxu). Microbenches 1.8x FASTER than the per-head
# lane-reduce loop ([16,785,12,64]: fwd 0.57 -> 0.44 ms, fwd+bwd 1.84 ->
# 1.02 ms) and wins the end-to-end pretrain step bench twice in a row
# (299.3 / 298.3 ms vs 327.8 default @ batch 16 -> 53.5 clips/s/chip,
# docs/ROUND4_NOTES.md). Round 3 measured it ~50 ms SLOWER end-to-end;
# that reading was a tunnel anomaly (same session produced a 19 ms
# microbench outlier on an env-independent XLA case). Default ON.
_TIME_FP_MXU = _os.environ.get("EGOVLP_TIME_FP_MXU", "1") == "1"


# Frame-block space tiles inside the PACKED kernels too (same ~N/S FLOP cut
# as the per-head windowed path, without its layout transposes). The
# per-head frame-block kernel measured FASTER than packed dense on an equal
# token count (1.26 vs 1.84 ms fwd+bwd), so this is on by default.
_SPACE_FB_PACKED = _os.environ.get("EGOVLP_SPACE_FB_PACKED", "1") == "1"


def _space_fb(axis: str, s: int) -> bool:
    return axis == "space" and s >= 16 and _SPACE_FB_PACKED


# All-heads CLS-row pass for the PACKED frame-block kernels (space and the
# patch-major TIME regime). The per-head CLS pass is dense [8, S] / [S, Dh]
# work with M=8 / K=8 matmuls (~6% MXU fill); expressing row 0's per-head
# logits as a segmented lane reduce of `kfull * q0` (one block-ones dot —
# the `_time_fp_attend_mxu` trick) runs the whole pass once at full lane
# width instead of per head. DEFAULT ON since round 5: kernel microbench
# 1.472 vs 1.529 ms fwd+bwd at the pretrain space shape, step bench
# 53.697/53.669 vs 53.544 clips/s/chip (rule of two, docs/CHIP_QUEUE_r05
# allh_bench rows) — small but consistent both levels.
_SPACE_CLS_ALLH = _os.environ.get("EGOVLP_SPACE_CLS_ALLH", "1") == "1"


# Long-sequence packed route (S > _PACKED_MAX_S, i.e. 16/32-frame shapes):
# keep the lane-packed layout (no [B,S,3,H,Dh] transposes) with fewer heads
# per program and the 64M vmem limit. The budget admits hp=4 at S=3137 and
# hp=2 at S=6273 (lane blocks must stay 128-aligned).
_PACKED_LONG = _os.environ.get("EGOVLP_PACKED_LONG", "1") == "1"
_LONG_BUDGET = 5_000_000

# The three O(F)-streaming long-S TIME formulations (fully-unrolled,
# flat-layout fori_loop, frame-major column-chunked) are DELETED: the
# first two crashed the Mosaic compiler and the frame-major one measured
# 1.6-2.1x SLOWER than the dense fallback on chip (r4f,
# docs/ROUND4_NOTES.md — tombstone with the full forensics). Long-S TIME
# is the patch-major window kernel below; shapes it cannot tile (no
# exact-divisor window) fall back to the XLA grouped vjp.

# Patch-major long-S TIME: permute rows ONCE in XLA (patch-major order
# r = 1 + n*F + f) so each patch's F frames become CONTIGUOUS — time
# attention then has exactly the space axis's frame-block structure with
# group size F, and runs the proven `_space_fb_*` windowed kernels with
# exact-divisor windows (<= _TIME_PM_WIN rows, whole F-sized groups, and
# dividing s-1 exactly — `_pm_window`; a partial last window SIGABRTs the
# Mosaic compiler, the round-4 r4h failure) and a static block-diagonal
# intra-window bias. vs the dense [block_q, S] tile loop this cuts the
# wasted key FLOPs from ~S/(F+1) (~180x at 16 frames) to win/F (7x at
# F=16, 4x at F=32) at full MXU tile fill, and the BACKWARD runs the
# pallas window kernel instead of the transpose-heavy XLA einsum vjp
# (~250 ms of copies in the 32f step profile, docs/ROUND3_NOTES.md). The
# three O(F)-streaming formulations all lost on chip (unrolled + flat:
# Mosaic crashes; frame-major col: 1.6-2.1x SLOWER, docs/ROUND4_NOTES.md)
# because VPU-bound rowwise dots can't beat the MXU even at 180x wasted
# FLOPs — this keeps the MXU but deletes most of the waste. Ref semantics:
# video_transformer.py:117-153 (reshape to patch-major, attend over time).
# DEFAULT ON since round 5: rule-of-two confirmed on chip at both
# production shapes (egomcq_16f 511.4/512.7 ms vs 590.8 dense;
# ft_charades_32f 632.2/621.2 ms vs 942.4/962.7 — docs/CHIP_QUEUE_r05).
_TIME_PM = _os.environ.get("EGOVLP_TIME_PM", "1") == "1"
# Window cap: 0 = auto (per-F). The on-chip sweep found the optimum is
# F-dependent: at F=16 the 224-row window beat 112 by ~26 ms/step
# (timepm_w224_16f 485.2 vs 511.4/512.7) while at F=32 the 224-row window
# LOST to 128 by ~25 ms (timepm_w224_ft32 604.2 vs 573.0/586.2, both with
# the permute hoist) — wider windows trade wasted key FLOPs (win/F) for
# fewer grid programs, and the trade flips with the group size.
_TIME_PM_WIN = int(_os.environ.get("EGOVLP_TIME_PM_WIN", "0"))


def _pm_win_cap(f: int) -> int:
    if _TIME_PM_WIN > 0:
        return _TIME_PM_WIN
    return 224 if f <= 16 else 128


def _pm_window(s: int, f: int):
    """Largest window <= the per-F cap covering whole F-sized groups AND
    dividing the s-1 patch rows EXACTLY, or None. A partial last window
    crashes the Mosaic compiler at these shapes (`Check failed:
    limits[i] <= dim(i) (8 vs. 1)`, array.h:480 SIGABRT — the round-4 r4h
    queue failure; bisected compile-only in round 5: every exact-window
    config compiles, every partial-window one aborts, bias content
    irrelevant). Exact divisors also delete the waste: win/F = 14x at F=16
    (win=224), 4x at F=32 (win=128) vs the dense path's ~S/(F+1) ~180x."""
    n = (s - 1) // f
    best = None
    for w in range(1, min(n, _pm_win_cap(f) // f) + 1):
        if n % w == 0:
            best = f * w
    return best


def _time_pm(axis: str, s: int, num_frames: int) -> bool:
    return (axis == "time" and s > _PACKED_MAX_S and _TIME_PM
            and num_frames > _TIME_FP_MAX_F
            and _pm_window(s, num_frames) is not None)


def _pm_win_bias(win: int, f: int) -> jax.Array:
    """Static [win, win] block-diagonal bias: rows/cols in the same F-sized
    group (same patch, patch-major layout) may attend each other."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (win, win), 0) // f
    cols = jax.lax.broadcasted_iota(jnp.int32, (win, win), 1) // f
    return jnp.where(rows == cols, 0.0, NEG_INF).astype(jnp.float32)


def _to_patch_major(x: jax.Array, f: int) -> jax.Array:
    """[B, 1+F*N, W] frame-major rows -> patch-major (CLS stays row 0)."""
    b, s, w = x.shape
    n = (s - 1) // f
    body = x[:, 1:].reshape(b, f, n, w).transpose(0, 2, 1, 3)
    return jnp.concatenate([x[:, :1], body.reshape(b, s - 1, w)], axis=1)


def _from_patch_major(x: jax.Array, f: int) -> jax.Array:
    """Inverse of `_to_patch_major` (works for any lane width W)."""
    b, s, w = x.shape
    n = (s - 1) // f
    body = x[:, 1:].reshape(b, n, f, w).transpose(0, 2, 1, 3)
    return jnp.concatenate([x[:, :1], body.reshape(b, s - 1, w)], axis=1)


# Hoist the patch-major permutes OUT of the attention call: row permutation
# commutes with every rowwise op (LN, qkv Dense, out proj), so the caller
# can permute the 768-wide activation once per time sublayer instead of the
# kernel permuting the 2304-wide qkv in and the output back — half the
# permuted bytes (the r5b PM profile shows ~50 ms/step of copy/slice/
# reshape growth vs the dense baseline at 16f). models/video.py applies it
# when this flag is on and `pm_rows=True` reaches `divided_attention`.
# DEFAULT ON since round 5 — rule of two at both production shapes:
# egomcq_16f 437.4/439.2 ms (vs 511.4/512.7 without), ft_charades_32f
# 573.0/586.2 ms (vs 621.2/632.2) — docs/CHIP_QUEUE_r05 hoist_* rows.
_PM_HOIST = _os.environ.get("EGOVLP_PM_HOIST", "1") == "1"


def _time_fp_attend(q_slabs, k_slabs, v_slabs, k0, v0, scale):
    """Frame-pair time attention for one head. q_slabs[f] = frame f's
    patch rows [N, Dh] (f32); k0/v0 = the CLS key/value row [1, Dh].
    Each patch query attends its own patch column across frames + CLS:
    logit(f->g) is a rowwise dot (same patch index n on both sides), an
    elementwise multiply + lane reduce — no [S, S] matrix ever exists.
    Softmax runs over F+1 per-column logit vectors without concatenation.
    (An MXU variant reducing via a block-ones matmul over lane-concatenated
    products measured SLOWER: 1.17/2.19 ms vs 0.92/1.75 at the pretrain
    shape — the concats cost more than the lane reduces.)
    Returns the per-frame output slabs (f32)."""
    F = len(q_slabs)
    outs = []
    for f in range(F):
        q = q_slabs[f]
        lall = [jnp.sum(q * k0, -1, keepdims=True) * scale]
        for g in range(F):
            lall.append(jnp.sum(q * k_slabs[g], -1, keepdims=True) * scale)
        m = lall[0]
        for x in lall[1:]:
            m = jnp.maximum(m, x)
        ps = [jnp.exp(x - m) for x in lall]
        denom = ps[0]
        for x in ps[1:]:
            denom = denom + x
        out = ps[0] * v0
        for g in range(F):
            out = out + ps[g + 1] * v_slabs[g]
        outs.append(out / denom)
    return outs


def _time_fp_backward(q_slabs, k_slabs, v_slabs, k0, v0, g_slabs, scale):
    """Backward of `_time_fp_attend`. Returns (dq_slabs, dk_slabs,
    dv_slabs, dk0, dv0); the CLS key/value grads reduce over rows."""
    F = len(q_slabs)
    dk_slabs = [None] * F
    dv_slabs = [None] * F
    dq_slabs = []
    dk0 = dv0 = None
    for f in range(F):
        q, gout = q_slabs[f], g_slabs[f]
        lall = [jnp.sum(q * k0, -1, keepdims=True) * scale]
        for g in range(F):
            lall.append(jnp.sum(q * k_slabs[g], -1, keepdims=True) * scale)
        m = lall[0]
        for x in lall[1:]:
            m = jnp.maximum(m, x)
        es = [jnp.exp(x - m) for x in lall]
        denom = es[0]
        for x in es[1:]:
            denom = denom + x
        ps = [x / denom for x in es]
        dp0 = jnp.sum(gout * v0, -1, keepdims=True)
        dps = [jnp.sum(gout * v_slabs[g], -1, keepdims=True)
               for g in range(F)]
        dot = dp0 * ps[0]
        for g in range(F):
            dot = dot + dps[g] * ps[g + 1]
        ds0 = (dp0 - dot) * ps[0]
        dss = [(dps[g] - dot) * ps[g + 1] for g in range(F)]
        dq = ds0 * k0
        for g in range(F):
            dq = dq + dss[g] * k_slabs[g]
        dq_slabs.append(dq * scale)
        for g in range(F):
            upd_k = dss[g] * q
            upd_v = ps[g + 1] * gout
            dk_slabs[g] = upd_k if dk_slabs[g] is None else dk_slabs[g] + upd_k
            dv_slabs[g] = upd_v if dv_slabs[g] is None else dv_slabs[g] + upd_v
        u0k = jnp.sum(ds0 * q, axis=0, keepdims=True)
        u0v = jnp.sum(ps[0] * gout, axis=0, keepdims=True)
        dk0 = u0k if dk0 is None else dk0 + u0k
        dv0 = u0v if dv0 is None else dv0 + u0v
    dk_slabs = [x * scale for x in dk_slabs]
    return dq_slabs, dk_slabs, dv_slabs, dk0 * scale, dv0


def _seg_ones(hp: int, dh: int):
    """Block-diagonal ones [hp*dh, hp] (f32): column j sums head j's dh
    lanes. Its transpose broadcasts a per-head scalar back across the
    head's lane block. Both are small compile-time constants (36 KB at
    hp=12, dh=64)."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, (hp * dh, hp), 0) // dh
    cols = jax.lax.broadcasted_iota(jnp.int32, (hp * dh, hp), 1)
    return (lanes == cols).astype(jnp.float32)


def _dot_f32(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _cls_row_fwd_allh(q_ref, k_ref, v_ref, o_ref, scale, hp, dh):
    """CLS-row forward for ALL hp heads at once: per-head logits of q0
    against every key via one segmented-reduce ones-dot, softmax over rows,
    column-reduce of the broadcast weights against V. Stores row 0 only
    (an unmasked full-sequence row — both divided axes let CLS attend
    everything, `_mask_bias` row 0)."""
    seg = _seg_ones(hp, dh)
    kfull = k_ref[0, :, :].astype(jnp.float32)
    vfull = v_ref[0, :, :].astype(jnp.float32)
    q0 = q_ref[0, 0:1, :].astype(jnp.float32)
    l0 = _dot_f32(kfull * q0, seg) * scale
    m0 = jnp.max(l0, axis=0, keepdims=True)
    e0 = jnp.exp(l0 - m0)
    p0 = e0 / jnp.sum(e0, axis=0, keepdims=True)
    out0 = jnp.sum(_dot_f32(p0, seg.T) * vfull, axis=0, keepdims=True)
    o_ref[0, 0:1, :] = out0.astype(o_ref.dtype)


def _cls_dense_bwd_allh(q_ref, k_ref, v_ref, g_ref, scale, hp, dh):
    """CLS-query backward for ALL hp heads at once (only row 0's cotangent
    participates): per-head logits via the segmented ones-dot, dk/dv seeds
    as broadcast-back products. Returns (dq0 [1, W], dkd [S, W], dvd [S, W])
    in f32, W = hp*dh — the dense contributions the window loops add
    slab-wise."""
    seg = _seg_ones(hp, dh)
    exp_ = seg.T
    kfull = k_ref[0, :, :].astype(jnp.float32)
    vfull = v_ref[0, :, :].astype(jnp.float32)
    q0 = q_ref[0, 0:1, :].astype(jnp.float32)
    g0 = g_ref[0, 0:1, :].astype(jnp.float32)
    l0 = _dot_f32(kfull * q0, seg) * scale            # [S, hp]
    m0 = jnp.max(l0, axis=0, keepdims=True)
    e0 = jnp.exp(l0 - m0)
    p0 = e0 / jnp.sum(e0, axis=0, keepdims=True)      # [S, hp]
    dvd = _dot_f32(p0, exp_) * g0                     # [S, W]
    dp0r = _dot_f32(vfull * g0, seg)                  # [S, hp]
    dot0 = jnp.sum(dp0r * p0, axis=0, keepdims=True)
    ds0r = (dp0r - dot0) * p0                         # [S, hp]
    ds0e = _dot_f32(ds0r, exp_)                       # [S, W]
    dq0 = scale * jnp.sum(ds0e * kfull, axis=0, keepdims=True)
    dkd = scale * (ds0e * q0)                         # [S, W]
    return dq0, dkd, dvd


def _time_fp_attend_mxu(qs, ks, vs, k0, v0, scale, hp, dh):
    """All-heads frame-pair time attention on full-width [N, hp*dh] f32
    slabs. The rowwise per-head dot is an elementwise product at full lane
    width followed by a segmented lane reduce expressed as one small MXU
    dot with a block-diagonal ones matrix ([N, W] @ [W, hp] -> per-head
    logits [N, hp]); softmax weights are broadcast back with the transposed
    ones ([N, hp] @ [hp, W]). No per-head python loop, no lane concats
    (the round-2 MXU variant's measured cost was the concat, not the
    reduction matmul)."""
    F = len(qs)
    seg = _seg_ones(hp, dh)
    exp_ = seg.T
    outs = []
    for f in range(F):
        q = qs[f]
        lall = [_dot_f32(q * k0, seg) * scale]
        for g in range(F):
            lall.append(_dot_f32(q * ks[g], seg) * scale)
        m = lall[0]
        for x in lall[1:]:
            m = jnp.maximum(m, x)
        ps = [jnp.exp(x - m) for x in lall]
        denom = ps[0]
        for x in ps[1:]:
            denom = denom + x
        ws = [x / denom for x in ps]
        out = _dot_f32(ws[0], exp_) * v0
        for g in range(F):
            out = out + _dot_f32(ws[g + 1], exp_) * vs[g]
        outs.append(out)
    return outs


def _time_fp_backward_mxu(qs, ks, vs, k0, v0, gs, scale, hp, dh):
    """Backward of `_time_fp_attend_mxu` on full-width slabs. Returns
    (dq_slabs, dk_slabs, dv_slabs, dk0, dv0); CLS grads reduce over rows."""
    F = len(qs)
    seg = _seg_ones(hp, dh)
    exp_ = seg.T
    dks = [None] * F
    dvs = [None] * F
    dqs = []
    dk0 = dv0 = None
    for f in range(F):
        q, gout = qs[f], gs[f]
        lall = [_dot_f32(q * k0, seg) * scale]
        for g in range(F):
            lall.append(_dot_f32(q * ks[g], seg) * scale)
        m = lall[0]
        for x in lall[1:]:
            m = jnp.maximum(m, x)
        es = [jnp.exp(x - m) for x in lall]
        denom = es[0]
        for x in es[1:]:
            denom = denom + x
        ps = [x / denom for x in es]
        dp0 = _dot_f32(gout * v0, seg)
        dps = [_dot_f32(gout * vs[g], seg) for g in range(F)]
        dot = dp0 * ps[0]
        for g in range(F):
            dot = dot + dps[g] * ps[g + 1]
        ds0e = _dot_f32((dp0 - dot) * ps[0], exp_)
        dq = ds0e * k0
        u0k = jnp.sum(ds0e * q, axis=0, keepdims=True)
        u0v = jnp.sum(_dot_f32(ps[0], exp_) * gout, axis=0, keepdims=True)
        dk0 = u0k if dk0 is None else dk0 + u0k
        dv0 = u0v if dv0 is None else dv0 + u0v
        for g in range(F):
            dse = _dot_f32((dps[g] - dot) * ps[g + 1], exp_)
            dq = dq + dse * ks[g]
            upd_k = dse * q
            upd_v = _dot_f32(ps[g + 1], exp_) * gout
            dks[g] = upd_k if dks[g] is None else dks[g] + upd_k
            dvs[g] = upd_v if dvs[g] is None else dvs[g] + upd_v
        dqs.append(dq * scale)
    dks = [x * scale for x in dks]
    return dqs, dks, dvs, dk0 * scale, dv0


def _tile_attend(q, k, v, bias, scale, kc=None, vc=None, cls_bias=None):
    """Masked-softmax attention of one query tile against a key window,
    optionally joined with a separate 8-wide CLS key block (one softmax
    across both logit blocks — no lane concat). bias=None means the window
    is fully allowed (frame-block tiles)."""
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias
    if kc is None:
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        return jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    lc = jax.lax.dot_general(
        q, kc, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale + cls_bias
    m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True),
                    jnp.max(lc, axis=-1, keepdims=True))
    p = jnp.exp(logits - m)
    pc = jnp.exp(lc - m)
    denom = jnp.sum(p, axis=-1, keepdims=True) + jnp.sum(pc, axis=-1,
                                                         keepdims=True)
    out = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    out = out + jnp.dot(pc, vc.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    return out / denom


def _space_fb_fwd(load_q, k, v, store_o, s, n, scale, axis,
                  win=None, win_bias=None, skip_cls=False):
    """Frame-block space forward over generic load/store accessors: one
    frame of queries vs its own keys + an 8-wide CLS block (joint softmax);
    the CLS row runs a full-sequence 8-row pass afterwards (rows 1..7
    recompute their identical in-frame result so the store stays aligned).
    All masks are tile-independent constants (see module docstring).
    `k`/`v` are the full [S, Dh] slabs; load_q(lo, sz) / store_o(lo, val)
    bind the layout (per-head 5-d refs or packed lane slices).

    `win`/`win_bias` generalize the tile to a window of `win` rows covering
    win/n whole groups with a static intra-window group bias (the
    patch-major TIME path: n = F, win = 128); default is the space axis's
    one-frame window (win = n, no intra-window mask)."""
    kc, vc = k[0:8], v[0:8]
    win = n if win is None else win
    clsb = _cls_col_bias(win)
    for lo in range(1, s, win):
        sz = min(win, s - lo)
        wb = None if win_bias is None else win_bias[:sz, :sz]
        out = _tile_attend(load_q(lo, sz), k[lo:lo + sz], v[lo:lo + sz], wb,
                           scale, kc, vc, clsb[:sz])
        store_o(lo, out)
    if skip_cls:
        # caller stores row 0 via the all-heads pass; rows 1..7 were
        # written by the first window (their window result equals the
        # 8-row pass's bias8 rows — same key set, same joint softmax)
        return
    bias8 = _mask_bias(0, 8, s, axis, n)
    store_o(0, _tile_attend(load_q(0, 8), k, v, bias8, scale))


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, axis, num_frames,
                n_patches, block_q):
    del num_frames
    s = q_ref.shape[3]
    k = k_ref[0, 0, 0]  # [S, Dh]; dots take the input dtype (bf16 MXU rate)
    v = v_ref[0, 0, 0]
    if _windowed(axis, s):
        def store_o(lo, val):
            o_ref[0, 0, lo:lo + val.shape[0], :] = val.astype(o_ref.dtype)

        _space_fb_fwd(lambda lo, sz: q_ref[0, 0, 0, lo:lo + sz, :], k, v,
                      store_o, s, n_patches, scale, axis)
        return
    for lo in range(0, s, block_q):
        bq = min(block_q, s - lo)
        bias = _mask_bias(lo, bq, s, axis, n_patches)
        q = q_ref[0, 0, 0, lo:lo + bq, :]
        out = _tile_attend(q, k, v, bias, scale)
        o_ref[0, 0, lo:lo + bq, :] = out.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dqkv_ref, *, scale, axis,
                num_frames, n_patches, block_q):
    del num_frames
    s, dh = q_ref.shape[3], q_ref.shape[4]
    k = k_ref[0, 0, 0]
    v = v_ref[0, 0, 0]
    if _windowed(axis, s):
        def mk_store(c):
            def store(lo, val):
                dqkv_ref[c, 0, 0, lo:lo + val.shape[0], :] = (
                    val.astype(dqkv_ref.dtype))
            return store

        def mk_read8(c):
            return lambda: dqkv_ref[c, 0, 0, 0:8, :].astype(jnp.float32)

        _space_fb_bwd(
            lambda lo, sz: q_ref[0, 0, 0, lo:lo + sz, :],
            lambda lo, sz: g_ref[0, 0, lo:lo + sz, :],
            k, v,
            (mk_store(0), mk_store(1), mk_store(2)),
            (mk_read8(0), mk_read8(1), mk_read8(2)),
            s, dh, n_patches, scale, axis)
        return
    dk = jnp.zeros((s, dh), jnp.float32)
    dv = jnp.zeros((s, dh), jnp.float32)
    for lo in range(0, s, block_q):
        bq = min(block_q, s - lo)
        bias = _mask_bias(lo, bq, s, axis, n_patches)
        qraw = q_ref[0, 0, 0, lo:lo + bq, :]
        g = g_ref[0, 0, lo:lo + bq, :]
        logits = jax.lax.dot_general(
            qraw, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + bias
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)  # [bq, s]
        p_c = p.astype(g.dtype)
        dv = dv + jax.lax.dot_general(  # p^T @ g
            p_c, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(  # g @ v^T
            g, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dot_term = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = (dp - dot_term) * p
        ds_c = ds.astype(k.dtype)
        dq = scale * jax.lax.dot_general(
            ds_c, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dqkv_ref[0, 0, 0, lo:lo + bq, :] = dq.astype(dqkv_ref.dtype)
        dk = dk + scale * jax.lax.dot_general(  # ds^T @ qraw
            ds_c, qraw, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    dqkv_ref[1, 0, 0] = dk.astype(dqkv_ref.dtype)
    dqkv_ref[2, 0, 0] = dv.astype(dqkv_ref.dtype)


def _space_fb_bwd(load_q, load_g, k, v, stores, reads, s, dh, n, scale,
                  axis, win=None, win_bias=None, cls_pre=None):
    """Frame-block space backward over generic accessors: tiles have
    DISJOINT key windows, so each tile's dk/dv slab is stored directly (no
    [S, Dh] accumulator — measured: concat-based accumulation at S=6273
    blows the 16M scoped-vmem stack). Only the CLS key/value column needs
    cross-tile accumulation (an [8, Dh] buffer); the CLS-query full-row
    pass runs first and its dense dk/dv contribution is added slab-wise.
    stores = (store_dq, store_dk, store_dv) with store(lo, val);
    reads = (read8_dq, read8_dk, read8_dv) returning rows 0..7 as f32.
    `win`/`win_bias` as in `_space_fb_fwd` (masked entries get p = 0, so
    every downstream grad term is exact with no extra masking). `cls_pre`
    (dq0 [1, dh] f32, dkd_at(lo, sz), dvd_at(lo, sz)) supplies this head's
    CLS-query pass precomputed by the all-heads segmented-reduce
    (`_cls_dense_bwd_allh`); None runs the per-head pass here."""
    store_dq, store_dk, store_dv = stores
    kc, vc = k[0:8], v[0:8]
    win = n if win is None else win
    clsb = _cls_col_bias(win)
    if cls_pre is not None:
        dq0_pre, dkd_at, dvd_at = cls_pre
    else:
        # ---- CLS-row pass (only row 0's cotangent participates) ----
        q8 = load_q(0, 8)
        rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, dh), 0)
        g8raw = load_g(0, 8)
        g8 = g8raw * (rows8 == 0).astype(g8raw.dtype)
        bias8 = _mask_bias(0, 8, s, axis, n)
        logits8 = jax.lax.dot_general(
            q8, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + bias8
        m8 = jnp.max(logits8, -1, keepdims=True)
        p8 = jnp.exp(logits8 - m8)
        p8 = p8 / jnp.sum(p8, -1, keepdims=True)
        dvd = jax.lax.dot_general(  # [S, Dh] f32: CLS query touches all rows
            p8.astype(g8.dtype), g8, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp8 = jax.lax.dot_general(
            g8, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds8 = (dp8 - jnp.sum(dp8 * p8, -1, keepdims=True)) * p8
        ds8_c = ds8.astype(k.dtype)
        dq8 = scale * jax.lax.dot_general(
            ds8_c, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dkd = scale * jax.lax.dot_general(
            ds8_c, q8, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq0_pre = dq8[0:1]
        dkd_at = lambda lo, sz: dkd[lo:lo + sz]  # noqa: E731
        dvd_at = lambda lo, sz: dvd[lo:lo + sz]  # noqa: E731
    dk8 = jnp.zeros((8, dh), jnp.float32)  # CLS-column accumulators
    dv8 = jnp.zeros((8, dh), jnp.float32)
    for lo in range(1, s, win):
        sz = min(win, s - lo)
        kwin, vwin = k[lo:lo + sz], v[lo:lo + sz]
        qraw = load_q(lo, sz)
        g = load_g(lo, sz)
        logits = jax.lax.dot_general(
            qraw, kwin, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if win_bias is not None:
            logits = logits + win_bias[:sz, :sz]
        lc = jax.lax.dot_general(
            qraw, kc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + clsb[:sz]
        m = jnp.maximum(jnp.max(logits, -1, keepdims=True),
                        jnp.max(lc, -1, keepdims=True))
        p = jnp.exp(logits - m)
        pc = jnp.exp(lc - m)
        denom = jnp.sum(p, -1, keepdims=True) + jnp.sum(pc, -1, keepdims=True)
        p = p / denom
        pc = pc / denom
        p_c = p.astype(g.dtype)
        dv_win = jax.lax.dot_general(
            p_c, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            g, vwin, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dpc = jax.lax.dot_general(
            g.astype(jnp.float32), vc.astype(jnp.float32),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        dot_term = (jnp.sum(dp * p, axis=-1, keepdims=True)
                    + jnp.sum(dpc * pc, axis=-1, keepdims=True))
        ds = (dp - dot_term) * p
        dsc = (dpc - dot_term) * pc  # [n, 8] f32
        ds_c = ds.astype(k.dtype)
        dq = scale * jax.lax.dot_general(
            ds_c, kwin, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq = dq + scale * jnp.dot(dsc, kc.astype(jnp.float32),
                                  preferred_element_type=jnp.float32)
        store_dq(lo, dq)
        dk_win = scale * jax.lax.dot_general(
            ds_c, qraw, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        store_dk(lo, dk_win + dkd_at(lo, sz))
        store_dv(lo, dv_win + dvd_at(lo, sz))
        dk8 = dk8 + scale * jax.lax.dot_general(
            dsc, qraw.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dv8 = dv8 + jax.lax.dot_general(
            pc, g.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    # rows 1..7 of dq/dk/dv were written by tile 0 (offset 1); row 0 gets
    # the CLS-row / CLS-column results. dk8/dv8 rows 1..7 are zero (masked
    # CLS-block columns), so a where-merge on row 0 completes all three
    # components (dq0_pre broadcasts over the 8 rows; only row 0 selected).
    rows8d = jax.lax.broadcasted_iota(jnp.int32, (8, dh), 0)
    is_cls = rows8d == 0  # where-select: row 0 may hold NaN garbage before
    store_dq(0, jnp.where(is_cls, jnp.broadcast_to(dq0_pre, (8, dh)),
                          reads[0]()))
    store_dk(0, jnp.where(is_cls, dk8 + dkd_at(0, 8), reads[1]()))
    store_dv(0, jnp.where(is_cls, dv8 + dvd_at(0, 8), reads[2]()))


# ---------------------------------------------------------------------------
# lane-packed kernels: consume the qkv projection output [B, S, 3*H*Dh]
# DIRECTLY via lane-block specs (no transposes anywhere — XLA cannot fuse a
# transpose into a custom-call operand, so the [3,B,H,S,Dh] layout costs two
# HBM copies per call). Several heads per program amortize the mask build
# and per-program overhead. Used when the lane blocks can be expressed
# (hp*Dh multiple of 128, or hp == H so the block spans the full component)
# and S is small enough for whole-sequence VMEM blocks.
# ---------------------------------------------------------------------------

_PACKED_MAX_S = 1536  # beyond this (16/32-frame eval) use the per-head path


def _packed_heads(h: int, dh: int, s: int, itemsize: int,
                  budget: int = 2_500_000):
    """Heads per program for the packed layout, or None if inexpressible
    (lane blocks must be 128-aligned slices of the 3*H*Dh projection row).
    `budget` caps the q+k+v input-block bytes so the [block_q, S] f32
    softmax workspace fits VMEM; the backward pass carries 4 extra dense
    [block_q, S] intermediates + dk/dv accumulators, so it uses a smaller
    budget than the forward."""
    best = None
    for d in range(1, h + 1):
        if h % d or (d * dh) % 128:
            continue
        if 3 * s * d * dh * itemsize > budget:
            continue
        best = d
    return best


def _packed_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, axis, n_patches,
                       num_frames, hp, dh, block_q):
    s = q_ref.shape[1]
    if _space_fb(axis, s):
        for j in range(hp):
            sl = slice(j * dh, (j + 1) * dh)

            def store_o(lo, val, sl=sl):
                o_ref[0, lo:lo + val.shape[0], sl] = val.astype(o_ref.dtype)

            _space_fb_fwd(
                lambda lo, sz, sl=sl: q_ref[0, lo:lo + sz, sl],
                k_ref[0, :, sl], v_ref[0, :, sl],
                store_o, s, n_patches, scale, axis,
                skip_cls=_SPACE_CLS_ALLH)
        if _SPACE_CLS_ALLH:
            _cls_row_fwd_allh(q_ref, k_ref, v_ref, o_ref, scale, hp, dh)
        return
    if _time_pm(axis, s, num_frames):
        # rows arrive PATCH-MAJOR (divided_attention permuted them): the
        # time groups are contiguous F-row blocks, so this is the space
        # frame-block kernel with group size F, exact-divisor windows
        # (see _pm_window — partial windows crash Mosaic) and a static
        # block-diagonal intra-window bias.
        win = _pm_window(s, num_frames)
        wb = _pm_win_bias(win, num_frames)
        for j in range(hp):
            sl = slice(j * dh, (j + 1) * dh)

            def store_o(lo, val, sl=sl):
                o_ref[0, lo:lo + val.shape[0], sl] = val.astype(o_ref.dtype)

            _space_fb_fwd(
                lambda lo, sz, sl=sl: q_ref[0, lo:lo + sz, sl],
                k_ref[0, :, sl], v_ref[0, :, sl],
                store_o, s, num_frames, scale, "space",
                win=win, win_bias=wb, skip_cls=_SPACE_CLS_ALLH)
        if _SPACE_CLS_ALLH:
            _cls_row_fwd_allh(q_ref, k_ref, v_ref, o_ref, scale, hp, dh)
        return
    if _time_fp(axis, num_frames):
        n, F = n_patches, num_frames
        if _TIME_FP_MXU:
            k0 = k_ref[0, 0:1, :].astype(jnp.float32)
            v0 = v_ref[0, 0:1, :].astype(jnp.float32)
            qs = [q_ref[0, 1 + f * n:1 + (f + 1) * n, :].astype(jnp.float32)
                  for f in range(F)]
            ks = [k_ref[0, 1 + g * n:1 + (g + 1) * n, :].astype(jnp.float32)
                  for g in range(F)]
            vs = [v_ref[0, 1 + g * n:1 + (g + 1) * n, :].astype(jnp.float32)
                  for g in range(F)]
            outs = _time_fp_attend_mxu(qs, ks, vs, k0, v0, scale, hp, dh)
            for f in range(F):
                o_ref[0, 1 + f * n:1 + (f + 1) * n, :] = (
                    outs[f].astype(o_ref.dtype))
            # CLS row attends the full sequence — same segmented-reduce
            # trick. Rows 1..7 were already stored by frame 0's main-pass
            # slab.
            _cls_row_fwd_allh(q_ref, k_ref, v_ref, o_ref, scale, hp, dh)
            return
        else:
            for j in range(hp):
                sl = slice(j * dh, (j + 1) * dh)
                k0 = k_ref[0, 0:1, sl].astype(jnp.float32)
                v0 = v_ref[0, 0:1, sl].astype(jnp.float32)
                qs = [q_ref[0, 1 + f * n:1 + (f + 1) * n, sl].astype(
                    jnp.float32) for f in range(F)]
                ks = [k_ref[0, 1 + g * n:1 + (g + 1) * n, sl].astype(
                    jnp.float32) for g in range(F)]
                vs = [v_ref[0, 1 + g * n:1 + (g + 1) * n, sl].astype(
                    jnp.float32) for g in range(F)]
                outs = _time_fp_attend(qs, ks, vs, k0, v0, scale)
                for f in range(F):
                    o_ref[0, 1 + f * n:1 + (f + 1) * n, sl] = (
                        outs[f].astype(o_ref.dtype))
        # CLS row attends the full sequence; rows 1..7 recompute their
        # (identical) grouped result so the 8-row store stays aligned.
        bias8 = _mask_bias(0, 8, s, axis, n_patches)
        for j in range(hp):
            sl = slice(j * dh, (j + 1) * dh)
            out8 = _tile_attend(q_ref[0, 0:8, sl], k_ref[0, :, sl],
                                v_ref[0, :, sl], bias8, scale)
            o_ref[0, 0:8, sl] = out8.astype(o_ref.dtype)
        return
    for lo in range(0, s, block_q):
        bq = min(block_q, s - lo)
        # masks are shared by all heads in the program
        bias = _mask_bias(lo, bq, s, axis, n_patches)
        for j in range(hp):
            sl = slice(j * dh, (j + 1) * dh)
            # dots take the input dtype directly (bf16 runs the MXU at
            # double the f32 rate and halves VMEM); accumulate + softmax
            # in f32 with the scale folded into the f32 logits
            q = q_ref[0, lo:lo + bq, sl]
            k = k_ref[0, :, sl]
            v = v_ref[0, :, sl]
            out = _tile_attend(q, k, v, bias, scale)
            o_ref[0, lo:lo + bq, sl] = out.astype(o_ref.dtype)


def _packed_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *,
                       scale, axis, n_patches, num_frames, hp, dh, block_q):
    s = q_ref.shape[1]
    if _space_fb(axis, s) or _time_pm(axis, s, num_frames):
        if _space_fb(axis, s):
            n_grp, ax, win, wb = n_patches, axis, None, None
        else:
            win = _pm_window(s, num_frames)
            n_grp, ax, wb = num_frames, "space", _pm_win_bias(win, num_frames)
        cls_all = (_cls_dense_bwd_allh(q_ref, k_ref, v_ref, g_ref, scale,
                                       hp, dh)
                   if _SPACE_CLS_ALLH else None)
        for j in range(hp):
            sl = slice(j * dh, (j + 1) * dh)

            def mk_store(ref, sl=sl):
                def store(lo, val):
                    ref[0, lo:lo + val.shape[0], sl] = val.astype(ref.dtype)
                return store

            def mk_read8(ref, sl=sl):
                return lambda: ref[0, 0:8, sl].astype(jnp.float32)

            cls_pre = None
            if cls_all is not None:
                dq0_w, dkd_w, dvd_w = cls_all
                cls_pre = (dq0_w[:, sl],
                           lambda lo, sz, sl=sl: dkd_w[lo:lo + sz, sl],
                           lambda lo, sz, sl=sl: dvd_w[lo:lo + sz, sl])
            _space_fb_bwd(
                lambda lo, sz, sl=sl: q_ref[0, lo:lo + sz, sl],
                lambda lo, sz, sl=sl: g_ref[0, lo:lo + sz, sl],
                k_ref[0, :, sl], v_ref[0, :, sl],
                (mk_store(dq_ref), mk_store(dk_ref), mk_store(dv_ref)),
                (mk_read8(dq_ref), mk_read8(dk_ref), mk_read8(dv_ref)),
                s, dh, n_grp, scale, ax, win=win, win_bias=wb,
                cls_pre=cls_pre)
        return
    if _time_fp(axis, num_frames):
        _packed_bwd_time_fp(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref,
                            dv_ref, scale=scale, axis=axis,
                            n_patches=n_patches, num_frames=num_frames,
                            hp=hp, dh=dh)
        return
    # tile-outer / head-inner: the mask is built once per query tile and
    # shared by all heads; dk/dv accumulate per head across tiles
    dks = [jnp.zeros((s, dh), jnp.float32) for _ in range(hp)]
    dvs = [jnp.zeros((s, dh), jnp.float32) for _ in range(hp)]
    for lo in range(0, s, block_q):
        bq = min(block_q, s - lo)
        bias = _mask_bias(lo, bq, s, axis, n_patches)
        for j in range(hp):
            sl = slice(j * dh, (j + 1) * dh)
            k = k_ref[0, :, sl]
            v = v_ref[0, :, sl]
            qraw = q_ref[0, lo:lo + bq, sl]
            g = g_ref[0, lo:lo + bq, sl]
            logits = jax.lax.dot_general(
                qraw, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale + bias
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            p_c = p.astype(g.dtype)
            dvs[j] = dvs[j] + jax.lax.dot_general(
                p_c, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                g, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dot_term = jnp.sum(dp * p, axis=-1, keepdims=True)
            ds = (dp - dot_term) * p
            ds_c = ds.astype(k.dtype)
            dq = scale * jax.lax.dot_general(
                ds_c, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dq_ref[0, lo:lo + bq, sl] = dq.astype(dq_ref.dtype)
            dks[j] = dks[j] + scale * jax.lax.dot_general(
                ds_c, qraw, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    for j in range(hp):
        sl = slice(j * dh, (j + 1) * dh)
        dk_ref[0, :, sl] = dks[j].astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dvs[j].astype(dv_ref.dtype)


def _packed_bwd_time_fp_mxu(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref,
                            dv_ref, *, scale, n_patches, num_frames, hp, dh):
    """All-heads frame-pair time backward. The CLS-query dense pass is
    also expressed full-width: only row 0's cotangent participates, so its
    per-head logits are a segmented reduce of `kfull * q0` (one ones-dot)
    and its dk/dv seeds are broadcast-back products — no per-head loop
    anywhere."""
    n, F = n_patches, num_frames
    # ---- CLS-row dense pass (full-width) ----
    dq0, dkd, dvd = _cls_dense_bwd_allh(q_ref, k_ref, v_ref, g_ref, scale,
                                        hp, dh)
    # ---- frame-pair main pass (full-width) ----
    kfull = k_ref[0, :, :].astype(jnp.float32)
    vfull = v_ref[0, :, :].astype(jnp.float32)
    k0 = kfull[0:1]
    v0 = vfull[0:1]
    qs = [q_ref[0, 1 + f * n:1 + (f + 1) * n, :].astype(jnp.float32)
          for f in range(F)]
    ks = [kfull[1 + g_ * n:1 + (g_ + 1) * n] for g_ in range(F)]
    vs = [vfull[1 + g_ * n:1 + (g_ + 1) * n] for g_ in range(F)]
    gs = [g_ref[0, 1 + f * n:1 + (f + 1) * n, :].astype(jnp.float32)
          for f in range(F)]
    dqs, dks, dvs, dk0, dv0 = _time_fp_backward_mxu(
        qs, ks, vs, k0, v0, gs, scale, hp, dh)
    for f in range(F):
        rows = slice(1 + f * n, 1 + (f + 1) * n)
        dq_ref[0, rows, :] = dqs[f].astype(dq_ref.dtype)
        dk_ref[0, rows, :] = (
            dks[f] + dkd[1 + f * n:1 + (f + 1) * n]).astype(dk_ref.dtype)
        dv_ref[0, rows, :] = (
            dvs[f] + dvd[1 + f * n:1 + (f + 1) * n]).astype(dv_ref.dtype)
    # rows 1..7 of the 8-row head block belong to frame 0's patch columns
    # handled above; row 0 combines both passes
    dq_ref[0, 0:1, :] = dq0.astype(dq_ref.dtype)
    dk_ref[0, 0:1, :] = (dk0 + dkd[0:1]).astype(dk_ref.dtype)
    dv_ref[0, 0:1, :] = (dv0 + dvd[0:1]).astype(dv_ref.dtype)


def _packed_bwd_time_fp(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                        *, scale, axis, n_patches, num_frames, hp, dh):
    """Frame-pair time backward: per head, a full-row CLS-query pass seeds
    dense dk/dv (the CLS query attends everything), then the frame-pair
    main pass adds the per-column contributions slab by slab."""
    if _TIME_FP_MXU:
        _packed_bwd_time_fp_mxu(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref,
                                dv_ref, scale=scale, n_patches=n_patches,
                                num_frames=num_frames, hp=hp, dh=dh)
        return
    s = q_ref.shape[1]
    n, F = n_patches, num_frames
    bias8 = _mask_bias(0, 8, s, axis, n)
    for j in range(hp):
        sl = slice(j * dh, (j + 1) * dh)
        kfull = k_ref[0, :, sl]
        vfull = v_ref[0, :, sl]
        # ---- CLS-row dense pass (only row 0's cotangent participates) ----
        q8 = q_ref[0, 0:8, sl]
        rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, dh), 0)
        g8 = g_ref[0, 0:8, sl] * (rows8 == 0).astype(g_ref.dtype)
        logits8 = jax.lax.dot_general(
            q8, kfull, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + bias8
        m8 = jnp.max(logits8, -1, keepdims=True)
        p8 = jnp.exp(logits8 - m8)
        p8 = p8 / jnp.sum(p8, -1, keepdims=True)
        dvd = jax.lax.dot_general(  # [S, Dh] f32, all rows
            p8.astype(g8.dtype), g8, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp8 = jax.lax.dot_general(
            g8, vfull, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds8 = (dp8 - jnp.sum(dp8 * p8, -1, keepdims=True)) * p8
        ds8_c = ds8.astype(kfull.dtype)
        dq8 = scale * jax.lax.dot_general(
            ds8_c, kfull, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dkd = scale * jax.lax.dot_general(
            ds8_c, q8, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # ---- frame-pair main pass ----
        k0 = k_ref[0, 0:1, sl].astype(jnp.float32)
        v0 = v_ref[0, 0:1, sl].astype(jnp.float32)
        qs = [q_ref[0, 1 + f * n:1 + (f + 1) * n, sl].astype(jnp.float32)
              for f in range(F)]
        ks = [k_ref[0, g_ * n + 1:1 + (g_ + 1) * n, sl].astype(jnp.float32)
              for g_ in range(F)]
        vs = [v_ref[0, g_ * n + 1:1 + (g_ + 1) * n, sl].astype(jnp.float32)
              for g_ in range(F)]
        gs = [g_ref[0, 1 + f * n:1 + (f + 1) * n, sl].astype(jnp.float32)
              for f in range(F)]
        dqs, dks, dvs, dk0, dv0 = _time_fp_backward(
            qs, ks, vs, k0, v0, gs, scale)
        for f in range(F):
            rows = slice(1 + f * n, 1 + (f + 1) * n)
            dq_ref[0, rows, sl] = dqs[f].astype(dq_ref.dtype)
            dk_ref[0, rows, sl] = (
                dks[f] + dkd[1 + f * n:1 + (f + 1) * n]).astype(dk_ref.dtype)
            dv_ref[0, rows, sl] = (
                dvs[f] + dvd[1 + f * n:1 + (f + 1) * n]).astype(dv_ref.dtype)
        # row 0: CLS query grad (dq8 rows 1..7 are zero) + CLS key/value
        # grads from both passes
        dq_ref[0, 0:1, sl] = dq8[0:1].astype(dq_ref.dtype)
        dk_ref[0, 0:1, sl] = (dk0 + dkd[0:1]).astype(dk_ref.dtype)
        dv_ref[0, 0:1, sl] = (dv0 + dvd[0:1]).astype(dv_ref.dtype)


def _packed_specs(s: int, h: int, dh: int, hp: int):
    """q/k/v lane-block views into the [B, S, 3*H*Dh] projection output."""
    groups = h // hp
    return [
        pl.BlockSpec((1, s, hp * dh), lambda b, g, c=c: (b, 0, g + c * groups),
                     memory_space=pltpu.VMEM)
        for c in range(3)
    ]


def _long_s_params(s: int):
    """Raise the scoped-vmem (stack) budget for long sequences: the
    frame-block backward's temporaries exceed Mosaic's default 16M stack
    at S=6273 with the full (b, h) grid (measured 18.5M). v5e has 128M of
    VMEM; the per-head blocks here total well under half of it."""
    if s <= _PACKED_MAX_S:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _packed_fwd_pallas(qkv_flat, scale, axis, num_frames, h, dh, hp):
    b, s, _ = qkv_flat.shape
    kernel = functools.partial(
        _packed_fwd_kernel, scale=scale, axis=axis,
        n_patches=(s - 1) // num_frames, num_frames=num_frames, hp=hp, dh=dh,
        block_q=min(s, 1024 if s <= _PACKED_MAX_S else
                    (256 if s <= 4096 else 128)),
    )
    return pl.pallas_call(
        kernel,
        grid=(b, h // hp),
        in_specs=_packed_specs(s, h, dh, hp),
        out_specs=pl.BlockSpec((1, s, hp * dh), lambda b_, g: (b_, 0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, h * dh), qkv_flat.dtype),
        cost_estimate=_cost(b, h, s, dh, axis=axis),
        compiler_params=_long_s_params(s),
    )(qkv_flat, qkv_flat, qkv_flat)


def _packed_bwd_pallas(qkv_flat, g, scale, axis, num_frames, h, dh, hp):
    b, s, _ = qkv_flat.shape
    kernel = functools.partial(
        _packed_bwd_kernel, scale=scale, axis=axis,
        n_patches=(s - 1) // num_frames, num_frames=num_frames, hp=hp, dh=dh,
        block_q=min(s, 512 if s <= _PACKED_MAX_S else 128),
    )
    spec = pl.BlockSpec((1, s, hp * dh), lambda b_, g_: (b_, 0, g_),
                        memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((b, s, h * dh), qkv_flat.dtype)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b, h // hp),
        in_specs=_packed_specs(s, h, dh, hp) + [spec],
        out_specs=(spec, spec, spec),
        out_shape=(shp, shp, shp),
        cost_estimate=_cost(b, h, s, dh, bwd=True, axis=axis),
        compiler_params=_long_s_params(s),
    )(qkv_flat, qkv_flat, qkv_flat, g)
    # XLA fuses this concat into the qkv-Dense backward dots
    return jnp.concatenate([dq, dk, dv], axis=-1)


# backward budget: 4 dense [block_q, S] f32 intermediates + per-head
# accumulators live alongside the blocks (measured: hp=6 OOMs scoped vmem
# on the dense path; env override for experiments with the frame-block /
# frame-pair kernels whose workspaces are far smaller)
_BWD_BUDGET = int(_os.environ.get("EGOVLP_BWD_BUDGET", "900000"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6, 7))
def _packed_pallas(qkv_flat, scale, axis, num_frames, h, dh, hp, hp_bwd):
    return _packed_fwd_pallas(qkv_flat, scale, axis, num_frames, h, dh, hp)


def _packed_fwd(qkv_flat, scale, axis, num_frames, h, dh, hp, hp_bwd):
    return (_packed_fwd_pallas(qkv_flat, scale, axis, num_frames, h, dh, hp),
            qkv_flat)


def _packed_bwd(scale, axis, num_frames, h, dh, hp, hp_bwd, qkv_flat, g):
    b, s, _ = qkv_flat.shape
    if (s > _PACKED_MAX_S and axis == "time"
            and not _time_fp(axis, num_frames)
            and not _time_pm(axis, s, num_frames)):
        # long-sequence TIME backward: the in-kernel dense recompute
        # measured SLOWER than XLA's grouped vjp (5.14 vs ~3.8 ms fwd+bwd
        # at [4,3137,12,64]) — the [block_q, S] f32 intermediates defeat
        # the win. Differentiate the einsum path instead (same math).
        qkv5 = qkv_flat.reshape(b, s, 3, h, dh)
        _, vjp = jax.vjp(
            lambda x: _divided_xla(x, scale, axis, num_frames), qkv5)
        (dqkv,) = vjp(g.reshape(b, s, h, dh))
        return (dqkv.reshape(b, s, 3 * h * dh),)
    return (_packed_bwd_pallas(qkv_flat, g, scale, axis, num_frames, h, dh,
                               hp_bwd),)


_packed_pallas.defvjp(_packed_fwd, _packed_bwd)


# ---------------------------------------------------------------------------
# per-head kernels on [3, B, H, S, Dh] (long sequences: frame-block space,
# dense time)
# ---------------------------------------------------------------------------


def _qkv_specs(s: int, dh: int):
    """Three per-component views into the same [3, B, H, S, Dh] array."""
    return [
        pl.BlockSpec((1, 1, 1, s, dh), lambda b, h, c=c: (c, b, h, 0, 0),
                     memory_space=pltpu.VMEM)
        for c in range(3)
    ]


def _keys_per_row(axis, s, num_frames):
    """Keys each query row actually dots against in the selected kernel
    regime, for the scheduler cost hint (the dense `s` fallback was a
    ~180x overestimate for the streaming/windowed time paths)."""
    if axis == "space" and (_space_fb(axis, s) or _windowed(axis, s)):
        return (s - 1) // num_frames + 8  # frame window + CLS block
    if axis == "time":
        if _time_pm(axis, s, num_frames):
            return _pm_window(s, num_frames) + 8
        if _time_fp(axis, num_frames):
            return num_frames + 1  # frame column + CLS key
    return s


def _cost(b, h, s, dh, bwd=False, axis="space", num_frames=1):
    # QK^T + PV per live key (+3 more dots in bwd); the CLS row's dense
    # full-row pass is amortized away at real S
    kpr = _keys_per_row(axis, s, num_frames)
    return pl.CostEstimate(
        flops=(5 if bwd else 2) * 2 * b * h * s * kpr * dh,
        bytes_accessed=(5 if bwd else 4) * b * h * s * dh * 4,
        transcendentals=b * h * s * kpr,
    )


def _fwd_pallas(qkv3: jax.Array, scale: float, axis: str, num_frames: int):
    _, b, h, s, dh = qkv3.shape
    # dense path: the [block_q, S] f32 softmax workspace must fit VMEM at
    # long S. The windowed path ignores block_q (tiles are one frame).
    block_q = min(s, 1024 if s <= 1536 else (256 if s <= 4096 else 128))
    kernel = functools.partial(
        _fwd_kernel, scale=scale, axis=axis, num_frames=num_frames,
        n_patches=(s - 1) // num_frames,
        block_q=block_q,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=_qkv_specs(s, dh),
        out_specs=pl.BlockSpec((1, 1, s, dh), lambda b_, h_: (b_, h_, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, s, dh), qkv3.dtype),
        cost_estimate=_cost(b, h, s, dh, axis=axis),
        compiler_params=_long_s_params(s),
    )(qkv3, qkv3, qkv3)


def _bwd_pallas(qkv3: jax.Array, g: jax.Array, scale: float, axis: str,
                num_frames: int):
    _, b, h, s, dh = qkv3.shape
    # dense backward holds ~4 [block_q, S] f32 intermediates + the f32
    # dk/dv accumulators at once
    block_q = min(s, 512 if s <= 1536 else 128)
    kernel = functools.partial(
        _bwd_kernel, scale=scale, axis=axis, num_frames=num_frames,
        n_patches=(s - 1) // num_frames,
        block_q=block_q,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=_qkv_specs(s, dh) + [
            pl.BlockSpec((1, 1, s, dh), lambda b_, h_: (b_, h_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, 1, 1, s, dh),
                               lambda b_, h_: (0, b_, h_, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(qkv3.shape, qkv3.dtype),
        cost_estimate=_cost(b, h, s, dh, bwd=True, axis=axis),
        compiler_params=_long_s_params(s),
    )(qkv3, qkv3, qkv3, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _divided_pallas(qkv3, scale, axis, num_frames):
    return _fwd_pallas(qkv3, scale, axis, num_frames)


def _divided_fwd(qkv3, scale, axis, num_frames):
    return _fwd_pallas(qkv3, scale, axis, num_frames), qkv3


def _divided_bwd(scale, axis, num_frames, qkv3, g):
    s = qkv3.shape[3]
    if s > _PACKED_MAX_S and not _windowed(axis, s):
        # long-sequence TIME axis: the dense in-kernel recompute exceeds
        # VMEM (measured: 22.5M scoped vmem at S=3137); differentiate the
        # XLA einsum path instead — same math, grouped recompute in HBM.
        # (The frame-block SPACE backward fits VMEM at any S.)
        qkv = qkv3.transpose(1, 3, 0, 2, 4)  # [B, S, 3, H, Dh]
        _, vjp = jax.vjp(
            lambda x: _divided_xla(x, scale, axis, num_frames), qkv)
        (dqkv,) = vjp(g.transpose(0, 2, 1, 3))  # g [B,H,S,Dh]->[B,S,H,Dh]
        return (dqkv.transpose(2, 0, 3, 1, 4),)
    return (_bwd_pallas(qkv3, g, scale, axis, num_frames),)


_divided_pallas.defvjp(_divided_fwd, _divided_bwd)


# ---------------------------------------------------------------------------
# XLA reference path (parity + CPU fallback): same math, einsum formulation
# ---------------------------------------------------------------------------


def _divided_xla(qkv: jax.Array, scale: float, axis: str, num_frames: int):
    from egovlpv2_tpu.ops.attention import attend

    b, s, _, h, dh = qkv.shape
    f = num_frames
    n = (s - 1) // f
    qkv_t = qkv.transpose(2, 0, 3, 1, 4)  # [3, B, H, S, Dh]
    q, k, v = qkv_t[0], qkv_t[1], qkv_t[2]
    cls_out = attend(q[:, :, :1], k, v, scale=scale, impl="xla")

    def grouped(t):
        t = t[:, :, 1:].reshape(b, h, f, n, dh)
        if axis == "time":
            t = t.transpose(0, 1, 3, 2, 4)
        return t

    qg, kg, vg = grouped(q), grouped(k), grouped(v)
    g_ = qg.shape[2]
    cls_k = jnp.broadcast_to(k[:, :, None, :1], (b, h, g_, 1, dh))
    cls_v = jnp.broadcast_to(v[:, :, None, :1], (b, h, g_, 1, dh))
    kg = jnp.concatenate([cls_k, kg], axis=3)
    vg = jnp.concatenate([cls_v, vg], axis=3)
    out = attend(qg, kg, vg, scale=scale, impl="xla")
    if axis == "time":
        out = out.transpose(0, 1, 3, 2, 4)
    out = out.reshape(b, h, f * n, dh)
    out = jnp.concatenate([cls_out, out], axis=2)  # [B, H, S, Dh]
    return out.transpose(0, 2, 1, 3)  # [B, S, H, Dh]


def divided_attention(
    qkv: jax.Array,
    *,
    scale: float,
    axis: str,
    num_frames: int,
    impl: str = "pallas",
    pm_rows: bool = False,
) -> jax.Array:
    """Divided space/time self-attention with CLS splice.

    Args:
      qkv: [B, S, 3, H, Dh] (S = 1 + num_frames * n_patches), the natural
        reshape of the fused qkv projection output.
      axis: 'space' | 'time'.
      impl: 'pallas' (TPU kernel), 'xla' (einsum reference path), or 'auto'
        (pallas on TPU backends, xla elsewhere).
      pm_rows: the caller already permuted rows to PATCH-MAJOR order
        (time axis only — the EGOVLP_PM_HOIST optimization: hoisting the
        permute above the qkv projection halves the permuted bytes). The
        output is returned in the same patch-major row order. Paths that
        cannot consume patch-major rows round-trip through frame-major,
        so the semantics hold on every backend.

    Returns [B, S, H, Dh] in qkv.dtype (rows ordered as the input's).
    """
    assert axis in ("space", "time"), axis
    if impl == "auto":
        impl = "pallas" if jax.default_backend() in ("tpu", "axon") else "xla"
    if pm_rows:
        assert axis == "time", "pm_rows is a time-axis layout contract"
        b, s, _, h, dh = qkv.shape
        fast = (impl == "pallas" and s >= 16
                and _time_pm(axis, s, num_frames)
                and _packed_heads(h, dh, s, qkv.dtype.itemsize,
                                  budget=_LONG_BUDGET) is not None
                and _PACKED_LONG)
        if not fast:
            # fallback: restore frame-major, compute, re-permute the output
            # so the caller's layout contract holds (tests / CPU / shapes
            # the PM kernel cannot tile)
            fm = _from_patch_major(qkv.reshape(b, s, -1), num_frames)
            out = divided_attention(
                fm.reshape(b, s, 3, h, dh), scale=scale, axis=axis,
                num_frames=num_frames, impl=impl)
            return _to_patch_major(out.reshape(b, s, h * dh),
                                   num_frames).reshape(b, s, h, dh)
    if impl != "pallas":
        return _divided_xla(qkv, scale, axis, num_frames)
    b, s, _, h, dh = qkv.shape
    if s < 16:
        # degenerate tiny sequences (e.g. 2x2-patch unit-test shapes): the
        # kernels' 8-row CLS block and tile minima assume S >= 16; every
        # real workload has S >= 197 (one 14x14 frame + CLS)
        return _divided_xla(qkv, scale, axis, num_frames)
    long_s = s > _PACKED_MAX_S
    budget_fwd = _LONG_BUDGET if long_s else 2_500_000
    budget_bwd = _LONG_BUDGET if long_s else _BWD_BUDGET
    hp = _packed_heads(h, dh, s, qkv.dtype.itemsize, budget=budget_fwd)
    hp_bwd = _packed_heads(h, dh, s, qkv.dtype.itemsize, budget=budget_bwd)
    # short S: packed unless the per-head windowed-space band applies.
    # long S (16/32-frame eval & fine-tune): packed too — the frame-block
    # space and dense time kernels both run inside the packed layout with
    # the raised vmem limit, and skipping the [B,S,3,H,Dh] transposes
    # removes the copy/reshape share that dominated the 32f profile
    # (~250 ms of a 950 ms step).
    use_packed = hp is not None and hp_bwd is not None and (
        (not long_s and not _windowed(axis, s))
        or (long_s and _PACKED_LONG))
    if use_packed:
        # zero-copy path: the reshape below undoes the caller's reshape of
        # the qkv Dense output, so the kernel reads the matmul result as-is
        flat = qkv.reshape(b, s, 3 * h * dh)
        if _time_pm(axis, s, num_frames):
            # patch-major long-S TIME: one XLA row permute each way turns
            # the time groups contiguous; the kernels run the space
            # frame-block machinery with a block-diagonal window bias (and
            # the backward stays in pallas — JAX differentiates the outer
            # permutes, so the custom VJP sees patch-major rows throughout).
            # pm_rows: the caller already permuted (and un-permutes).
            if pm_rows:
                out = _packed_pallas(flat, scale, axis, num_frames, h, dh,
                                     hp, hp_bwd)
            else:
                out = _from_patch_major(
                    _packed_pallas(_to_patch_major(flat, num_frames), scale,
                                   axis, num_frames, h, dh, hp, hp_bwd),
                    num_frames)
        else:
            out = _packed_pallas(flat, scale, axis,
                                 num_frames, h, dh, hp, hp_bwd)  # [B,S,H*Dh]
        return out.reshape(b, s, h, dh)
    qkv3 = qkv.transpose(2, 0, 3, 1, 4)
    out = _divided_pallas(qkv3, scale, axis, num_frames)  # [B, H, S, Dh]
    return out.transpose(0, 2, 1, 3)
