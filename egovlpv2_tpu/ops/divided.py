"""Packed Pallas kernel for divided space-time attention (the hot op).

Replicates the reference semantics of `EgoVLPv2/model/video_transformer.py:117-153`
(VarAttention.attn with the CLS splice): the CLS query attends over the full
space-time sequence; patch queries attend within their frame (space axis) or
within their patch column plus the broadcast CLS key/value (time axis).

Why a dedicated kernel (round-1 profile evidence): the XLA path spends its
time in layout copies and logits round-trips, not FLOPs — the frame/column
regrouping transposes, the CLS broadcast+concat, and the HBM materialization
of [.., Sq, Sk] logits + probabilities. This kernel:

  * computes the CLS splice as separate small dots folded into the group
    softmax (zero concats, zero regrouping transposes);
  * keeps logits/probabilities entirely in VMEM;
  * has a custom-VJP backward as a second Pallas kernel that recomputes the
    probabilities in VMEM (flash-style) and emits dqkv in one pass — the
    XLA backward re-creates the same copy soup, so fusing it matters as much
    as the forward.

Layout: the kernel consumes qkv as [3, B, H, S, Dh] so each (batch, head)
program DMAs contiguous [S, Dh] slabs (S and Dh are the tiled dims). The
transpose from the projection's natural [B, S, 3*H*Dh] is the same one the
XLA path already performs, and XLA routinely fuses it into the producing
matmul. Grid: one program per (batch, head); a full [S, Dh] q/k/v slice is
<= 0.8 MB f32 even at 16 frames. The time axis uses VPU broadcast math over
[F, N, Dh] (5-17 keys per query is far below MXU tile size); the space axis
uses per-frame [N, N] MXU dots.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _cls_row_fwd(q0, k, v):
    """CLS query attends over the full sequence. q0 [1, Dh] (pre-scaled)."""
    logits = jax.lax.dot_general(
        q0, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [1, S]
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    return jnp.dot(e / jnp.sum(e, axis=-1, keepdims=True), v,
                   preferred_element_type=jnp.float32)  # [1, Dh]


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, axis, num_frames,
                n_patches):
    f_, n_ = num_frames, n_patches
    q = q_ref[0, 0, 0].astype(jnp.float32) * scale  # [S, Dh]
    k = k_ref[0, 0, 0].astype(jnp.float32)
    v = v_ref[0, 0, 0].astype(jnp.float32)
    dh = q.shape[-1]

    o_ref[0, 0, 0:1, :] = _cls_row_fwd(q[0:1], k, v).astype(o_ref.dtype)
    k0, v0 = k[0:1], v[0:1]  # [1, Dh]

    if axis == "space":
        # per-frame dense attention over N patches + the CLS key
        for f in range(f_):
            lo = 1 + f * n_
            qf, kf, vf = q[lo:lo + n_], k[lo:lo + n_], v[lo:lo + n_]
            l_p = jax.lax.dot_general(
                qf, kf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [n, n]
            l_c = jax.lax.dot_general(
                qf, k0, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [n, 1]
            m = jnp.maximum(jnp.max(l_p, axis=-1, keepdims=True), l_c)
            e_p = jnp.exp(l_p - m)
            e_c = jnp.exp(l_c - m)
            z = jnp.sum(e_p, axis=-1, keepdims=True) + e_c
            out = (jnp.dot(e_p, vf, preferred_element_type=jnp.float32)
                   + e_c * v0) / z
            o_ref[0, 0, lo:lo + n_, :] = out.astype(o_ref.dtype)
    else:  # time: each patch column attends over its F frames + CLS
        qp = q[1:].reshape(f_, n_, dh)
        kp = k[1:].reshape(f_, n_, dh)
        vp = v[1:].reshape(f_, n_, dh)
        k0b = k0.reshape(1, 1, dh)
        v0b = v0.reshape(1, 1, dh)
        # logit planes, one per key frame g: l_g[f, n] = <q[f,n,:], k[g,n,:]>
        ls = [jnp.sum(qp * kp[g][None], axis=-1) for g in range(f_)]
        l_c = jnp.sum(qp * k0b, axis=-1)  # [F, N]
        m = l_c
        for l in ls:
            m = jnp.maximum(m, l)
        es = [jnp.exp(l - m) for l in ls]
        e_c = jnp.exp(l_c - m)
        z = e_c
        for e in es:
            z = z + e
        out = e_c[..., None] * v0b
        for g in range(f_):
            out = out + es[g][..., None] * vp[g][None]
        out = out / z[..., None]
        o_ref[0, 0, 1:, :] = out.reshape(f_ * n_, dh).astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# backward kernel (flash-style in-kernel recompute, exact softmax grads)
# ---------------------------------------------------------------------------


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dqkv_ref, *, scale, axis,
                num_frames, n_patches):
    f_, n_ = num_frames, n_patches
    qraw = q_ref[0, 0, 0].astype(jnp.float32)  # [S, Dh]
    q = qraw * scale
    k = k_ref[0, 0, 0].astype(jnp.float32)
    v = v_ref[0, 0, 0].astype(jnp.float32)
    g = g_ref[0, 0].astype(jnp.float32)  # g block is [1, 1, S, Dh]
    dh = q.shape[-1]
    k0, v0 = k[0:1], v[0:1]

    # --- CLS row (recompute p over the full sequence); contributes dense
    # dk/dv over all rows and dq for row 0.
    logits = jax.lax.dot_general(
        q[0:1], k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [1, S]
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p_cls = e / jnp.sum(e, axis=-1, keepdims=True)  # [1, S]
    g0 = g[0:1]  # [1, Dh]
    dv_dense = jax.lax.dot_general(  # outer(p_cls^T, g0) -> [S, Dh]
        p_cls, g0, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(  # [1, S]
        g0, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = (dp - jnp.sum(dp * p_cls, axis=-1, keepdims=True)) * p_cls
    dq_cls = scale * jnp.dot(ds, k, preferred_element_type=jnp.float32)
    dk_dense = scale * jax.lax.dot_general(  # outer(ds^T, q0raw) -> [S, Dh]
        ds, qraw[0:1], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    if axis == "space":
        dq_rows = [dq_cls]
        dk_rows, dv_rows = [], []
        dk0_sum = jnp.zeros((1, dh), jnp.float32)
        dv0_sum = jnp.zeros((1, dh), jnp.float32)
        for f in range(f_):
            lo = 1 + f * n_
            qf_raw = qraw[lo:lo + n_]
            qf = q[lo:lo + n_]
            kf, vf, gf = k[lo:lo + n_], v[lo:lo + n_], g[lo:lo + n_]
            l_p = jax.lax.dot_general(
                qf, kf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            l_c = jax.lax.dot_general(
                qf, k0, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            mm = jnp.maximum(jnp.max(l_p, axis=-1, keepdims=True), l_c)
            e_p, e_c = jnp.exp(l_p - mm), jnp.exp(l_c - mm)
            z = jnp.sum(e_p, axis=-1, keepdims=True) + e_c
            p_p, p_c = e_p / z, e_c / z  # [n, n], [n, 1]

            dv_rows.append(jax.lax.dot_general(  # p_p^T @ gf -> [n, Dh]
                p_p, gf, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            dv0_sum = dv0_sum + jax.lax.dot_general(  # [1, Dh]
                p_c, gf, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp_p = jax.lax.dot_general(
                gf, vf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp_c = jax.lax.dot_general(
                gf, v0, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            r = jnp.sum(dp_p * p_p, axis=-1, keepdims=True) + dp_c * p_c
            ds_p = (dp_p - r) * p_p
            ds_c = (dp_c - r) * p_c
            dq_rows.append(scale * (
                jnp.dot(ds_p, kf, preferred_element_type=jnp.float32)
                + ds_c * k0))
            dk_rows.append(scale * jax.lax.dot_general(
                ds_p, qf_raw, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            dk0_sum = dk0_sum + scale * jax.lax.dot_general(
                ds_c, qf_raw, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        # frame groups tile rows 1..S contiguously, so concat reassembles
        dq = jnp.concatenate(dq_rows, axis=0)
        dk = dk_dense + jnp.concatenate([dk0_sum] + dk_rows, axis=0)
        dv = dv_dense + jnp.concatenate([dv0_sum] + dv_rows, axis=0)
    else:  # time
        qp_raw = qraw[1:].reshape(f_, n_, dh)
        qp = q[1:].reshape(f_, n_, dh)
        kp = k[1:].reshape(f_, n_, dh)
        vp = v[1:].reshape(f_, n_, dh)
        gp = g[1:].reshape(f_, n_, dh)
        k0b = k0.reshape(1, 1, dh)
        v0b = v0.reshape(1, 1, dh)
        ls = [jnp.sum(qp * kp[gi][None], axis=-1) for gi in range(f_)]
        l_c = jnp.sum(qp * k0b, axis=-1)
        mm = l_c
        for l in ls:
            mm = jnp.maximum(mm, l)
        es = [jnp.exp(l - mm) for l in ls]
        e_c = jnp.exp(l_c - mm)
        z = e_c
        for e2 in es:
            z = z + e2
        ps = [e2 / z for e2 in es]  # each [F, N]
        p_c = e_c / z

        dps = [jnp.sum(gp * vp[gi][None], axis=-1) for gi in range(f_)]
        dp_c = jnp.sum(gp * v0b, axis=-1)
        r = dp_c * p_c
        for gi in range(f_):
            r = r + dps[gi] * ps[gi]
        dss = [(dps[gi] - r) * ps[gi] for gi in range(f_)]
        ds_c = (dp_c - r) * p_c

        dq_p = ds_c[..., None] * k0b
        for gi in range(f_):
            dq_p = dq_p + dss[gi][..., None] * kp[gi][None]
        dq_p = scale * dq_p  # [F, N, Dh]

        dk_groups = [scale * jnp.sum(dss[gi][..., None] * qp_raw, axis=0)
                     for gi in range(f_)]  # each [N, Dh] (key frame gi)
        dv_groups = [jnp.sum(ps[gi][..., None] * gp, axis=0)
                     for gi in range(f_)]
        dk0 = scale * jnp.sum(
            (ds_c[..., None] * qp_raw).reshape(f_ * n_, dh), axis=0,
            keepdims=True)
        dv0 = jnp.sum(
            (p_c[..., None] * gp).reshape(f_ * n_, dh), axis=0, keepdims=True)

        dq = jnp.concatenate([dq_cls, dq_p.reshape(f_ * n_, dh)], axis=0)
        dk = dk_dense + jnp.concatenate([dk0] + dk_groups, axis=0)
        dv = dv_dense + jnp.concatenate([dv0] + dv_groups, axis=0)

    dqkv_ref[0, 0, 0] = dq.astype(dqkv_ref.dtype)
    dqkv_ref[1, 0, 0] = dk.astype(dqkv_ref.dtype)
    dqkv_ref[2, 0, 0] = dv.astype(dqkv_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP (operate on [3, B, H, S, Dh])
# ---------------------------------------------------------------------------


def _qkv_specs(s: int, dh: int):
    """Three per-component views into the same [3, B, H, S, Dh] array."""
    return [
        pl.BlockSpec((1, 1, 1, s, dh), lambda b, h, c=c: (c, b, h, 0, 0),
                     memory_space=pltpu.VMEM)
        for c in range(3)
    ]


def _cost(b, h, s, dh, axis, num_frames, n_patches, bwd=False):
    keys = n_patches if axis == "space" else num_frames
    flops = b * h * (4 * (s - 1) * keys * dh + 8 * s * dh)
    return pl.CostEstimate(
        flops=flops * (3 if bwd else 1),
        bytes_accessed=(4 if bwd else 4) * b * h * s * dh * 4,
        transcendentals=b * h * s * keys,
    )


def _fwd_pallas(qkv3: jax.Array, scale: float, axis: str, num_frames: int):
    _, b, h, s, dh = qkv3.shape
    n_patches = (s - 1) // num_frames
    kernel = functools.partial(
        _fwd_kernel, scale=scale, axis=axis, num_frames=num_frames,
        n_patches=n_patches,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=_qkv_specs(s, dh),
        out_specs=pl.BlockSpec((1, 1, s, dh), lambda b_, h_: (b_, h_, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, s, dh), qkv3.dtype),
        cost_estimate=_cost(b, h, s, dh, axis, num_frames, n_patches),
    )(qkv3, qkv3, qkv3)


def _bwd_pallas(qkv3: jax.Array, g: jax.Array, scale: float, axis: str,
                num_frames: int):
    _, b, h, s, dh = qkv3.shape
    n_patches = (s - 1) // num_frames
    kernel = functools.partial(
        _bwd_kernel, scale=scale, axis=axis, num_frames=num_frames,
        n_patches=n_patches,
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
        cost_estimate=_cost(b, h, s, dh, axis, num_frames, n_patches,
                            bwd=True),
    )(qkv3, qkv3, qkv3, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _divided_pallas(qkv3, scale, axis, num_frames):
    return _fwd_pallas(qkv3, scale, axis, num_frames)


def _divided_fwd(qkv3, scale, axis, num_frames):
    return _fwd_pallas(qkv3, scale, axis, num_frames), qkv3


def _divided_bwd(scale, axis, num_frames, qkv3, g):
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
) -> jax.Array:
    """Divided space/time self-attention with CLS splice.

    Args:
      qkv: [B, S, 3, H, Dh] (S = 1 + num_frames * n_patches), the natural
        reshape of the fused qkv projection output.
      axis: 'space' | 'time'.
      impl: 'pallas' (TPU kernel) or 'xla' (einsum reference path).

    Returns [B, S, H, Dh] in qkv.dtype.
    """
    assert axis in ("space", "time"), axis
    if impl != "pallas":
        return _divided_xla(qkv, scale, axis, num_frames)
    qkv3 = qkv.transpose(2, 0, 3, 1, 4)  # fused into the qkv matmul by XLA
    out = _divided_pallas(qkv3, scale, axis, num_frames)  # [B, H, S, Dh]
    return out.transpose(0, 2, 1, 3)
