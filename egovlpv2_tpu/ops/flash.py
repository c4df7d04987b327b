"""Pallas TPU fused attention kernel.

The hot attention shapes in this framework are short-sequence, huge-batch:
space attention runs at [B*H*F, N+1=197, 64], time attention at
[B*H*N, F+1, 64], i2t cross-attention at [B*H, S_video, 64] x S_text<=30.
At these lengths a streaming (online-softmax) flash kernel is unnecessary —
the whole K/V block fits in VMEM — but fusing QK^T + bias + softmax + PV into
one kernel keeps the [Sq, Sk] logits out of HBM entirely, which is where the
XLA path spends its bandwidth.

Forward runs in Pallas (grid over (batch-group, q-tile)); backward is a
custom VJP that recomputes probabilities with XLA einsums (flash-style
recompute — the same work a remat policy would do, with exact gradients).

Layout notes (pallas_guide.md): last dim padded to 128 lanes, q tiled at 128
sublanes, f32 accumulation via preferred_element_type, softmax in f32.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attention_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)  # [bq, dhp]
    k = k_ref[0].astype(jnp.float32)  # [skp, dhp]
    v = v_ref[0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q * scale, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bq, skp]
    logits = logits + bias_ref[0]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p / s, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _flash_fwd_3d(q, k, v, bias_rows, scale):
    """q [G, Sq, Dh], k/v [G, Sk, Dh], bias_rows [G, Sk] additive f32."""
    g, sq, dh = q.shape
    sk = k.shape[1]
    bq = min(_ceil_to(sq, 8), 128)
    sqp = _ceil_to(sq, bq)
    skp = _ceil_to(sk, 128)
    dhp = _ceil_to(dh, 128)

    qp = jnp.pad(q, ((0, 0), (0, sqp - sq), (0, dhp - dh)))
    kp = jnp.pad(k, ((0, 0), (0, skp - sk), (0, dhp - dh)))
    vp = jnp.pad(v, ((0, 0), (0, skp - sk), (0, dhp - dh)))
    # fold kv-length padding into the additive bias so padded keys vanish
    bias_p = jnp.pad(
        bias_rows.astype(jnp.float32), ((0, 0), (0, skp - sk)),
        constant_values=NEG_INF,
    )[:, None, :]  # [G, 1, skp]

    grid = (g, sqp // bq)
    out = pl.pallas_call(
        functools.partial(_attention_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dhp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skp, dhp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skp, dhp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, skp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dhp), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, sqp, dhp), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * g * sqp * skp * dhp,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=g * sqp * skp,
        ),
    )(qp, kp, vp, bias_p)
    return out[:, :sq, :dh]


def _xla_attention(q, k, v, bias_rows, scale):
    logits = jnp.einsum(
        "gqd,gkd->gqk", q * jnp.asarray(scale, q.dtype), k,
        preferred_element_type=jnp.float32,
    )
    logits = logits + bias_rows[:, None, :].astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("gqk,gkd->gqd", probs.astype(q.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype), probs


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_3d(q, k, v, bias_rows, scale):
    return _flash_fwd_3d(q, k, v, bias_rows, scale)


def _flash_3d_fwd(q, k, v, bias_rows, scale):
    return _flash_fwd_3d(q, k, v, bias_rows, scale), (q, k, v, bias_rows)


def _flash_3d_bwd(scale, res, g_out):
    q, k, v, bias_rows = res
    # flash-style recompute of probabilities, exact softmax gradients
    _, probs = _xla_attention(q, k, v, bias_rows, scale)
    g32 = g_out.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum("gqk,gqd->gkd", probs, g32)
    dp = jnp.einsum("gqd,gkd->gqk", g32, v32)
    tmp = (dp - jnp.sum(dp * probs, axis=-1, keepdims=True)) * probs
    dq = jnp.einsum("gqk,gkd->gqd", tmp, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("gqk,gqd->gkd", tmp, q.astype(jnp.float32)) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None


_flash_3d.defvjp(_flash_3d_fwd, _flash_3d_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Drop-in for ops.attention.attend's XLA path (no prob-dropout).

    q: [..., Sq, Dh]; k/v: [..., Sk, Dh]; bias broadcastable to
    [..., Sq, Sk] but constant over Sq (padding masks), which covers every
    use in this framework.
    """
    lead = q.shape[:-2]
    sq, dh = q.shape[-2:]
    sk = k.shape[-2]
    g = int(np.prod(lead)) if lead else 1
    if sq < 32 or sk < 32:
        # tiny-sequence attention (e.g. time attention at 4 frames: 5 keys)
        # is launch-bound as one kernel per group — the fused XLA path wins
        from egovlpv2_tpu.ops.attention import attend

        return attend(q, k, v, scale=scale, bias=bias, impl="xla")
    q3 = q.reshape(g, sq, dh)
    k3 = k.reshape(g, sk, dh)
    v3 = v.reshape(g, sk, dh)
    if bias is None:
        bias_rows = jnp.zeros((g, sk), jnp.float32)
    else:
        # broadcast [..., Sq_or_1, Sk] -> per-G row (constant over Sq)
        b = jnp.broadcast_to(bias[..., :1, :], lead + (1, sk))
        bias_rows = b.reshape(g, sk).astype(jnp.float32)
    out = _flash_3d(q3, k3, v3, bias_rows, scale)
    return out.reshape(*lead, sq, dh)
