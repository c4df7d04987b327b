"""Fused LayerNorm Pallas kernel (forward + backward).

Motivation (round-3 step profile, docs/ROUND3_NOTES.md): the flagship
pretrain step spends ~30.7 ms/step in "LN convert+reduce" fusions plus a
share of 32.1 ms "other converts" — XLA lowers flax's LayerNorm (bf16
activations, float32 statistics per `flax.linen.normalization
._compute_stats`) into separate convert→reduce, convert→reduce and
normalize fusions, materializing float32 intermediates in HBM between
them. The model applies ~90 LayerNorms per fwd+bwd at [16, 785, 768]
(ViT-B blocks x2, RoBERTa x2, fusion gates), so every extra HBM pass is
~2 ms.

This kernel does the whole thing in one VMEM pass per direction:

  forward : read x (bf16) -> f32 rowwise mean / fast-variance
            (E[x^2]-E[x]^2, clipped at 0, matching flax) -> scale/bias ->
            write y (bf16). 1 read + 1 write of the activation, period.
  backward: read x, g -> recompute the (cheap, rowwise) stats rather than
            storing them -> dx in-register; per-row-tile partial
            dscale/dbias accumulate across the sequential TPU grid into a
            single [1, D] f32 block. 2 reads + 1 write.

Semantics match `nn.LayerNorm(epsilon=eps, dtype=dtype)` with float32
params (flax promotes stats to f32; scale/bias multiply in f32; result
cast to dtype). Reference capability: the torch model's nn.LayerNorm
uses (`video_transformer.py:262-268`, `roberta.py` post-LN blocks);
cuDNN/apex fuse it on GPU — this is the TPU-native equivalent.

`layernorm(x, scale, bias)` is shape-polymorphic over leading dims; the
`LayerNorm` flax module is a drop-in for `nn.LayerNorm` (same param
names/shapes, so checkpoints and the torch importer are unaffected).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per grid step: [BR, D] bf16 tiles; at D=768 the bwd working set is
# x + g + dx ~= 3 * BR*768*2B (+f32 registers) — BR=256 stays well inside
# scoped VMEM while amortizing grid overhead over big tiles
_BLOCK_ROWS = 256


def _fwd_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    d = x.shape[-1]
    inv_d = jnp.float32(1.0 / d)
    mean = jnp.sum(x, axis=-1, keepdims=True) * inv_d
    var = jnp.maximum(
        jnp.sum(x * x, axis=-1, keepdims=True) * inv_d - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    y = (x - mean) * rstd * scale_ref[...].astype(jnp.float32) \
        + bias_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def _bwd_kernel(x_ref, scale_ref, g_ref, dx_ref, dsc_ref, dbi_ref, *,
                eps, n_rows):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    br, d = x.shape
    inv_d = jnp.float32(1.0 / d)
    mean = jnp.sum(x, axis=-1, keepdims=True) * inv_d
    var = jnp.maximum(
        jnp.sum(x * x, axis=-1, keepdims=True) * inv_d - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x - mean) * rstd
    gs = g * scale_ref[...].astype(jnp.float32)
    m1 = jnp.sum(gs, axis=-1, keepdims=True) * inv_d
    m2 = jnp.sum(gs * xhat, axis=-1, keepdims=True) * inv_d
    dx_ref[...] = (rstd * (gs - m1 - xhat * m2)).astype(dx_ref.dtype)

    # boundary tiles read rows past n_rows as padding garbage: rowwise dx
    # stores are dropped by pallas, but the dscale/dbias SUMS would absorb
    # them — select by global row index. Must be a where(), NOT a *0.0
    # multiply: padding rows can hold inf/NaN bit patterns and NaN*0=NaN
    # (measured on-chip: the multiply variant NaN'd the train loss).
    row = i * br + jax.lax.broadcasted_iota(jnp.int32, (br, d), 0)
    valid = row < n_rows

    @pl.when(i == 0)
    def _init():
        dsc_ref[...] = jnp.zeros(dsc_ref.shape, dsc_ref.dtype)
        dbi_ref[...] = jnp.zeros(dbi_ref.shape, dbi_ref.dtype)

    zero = jnp.zeros((), jnp.float32)
    dsc_ref[...] += jnp.sum(jnp.where(valid, g * xhat, zero), axis=0,
                            keepdims=True)
    dbi_ref[...] += jnp.sum(jnp.where(valid, g, zero), axis=0, keepdims=True)


def _rows_spec(br, d):
    return pl.BlockSpec((br, d), lambda i: (i, 0))


def _param_spec(d):
    return pl.BlockSpec((1, d), lambda i: (0, 0))


def _ln_fwd_pallas(x2, scale, bias, eps):
    r, d = x2.shape
    br = min(_BLOCK_ROWS, max(8, r))
    grid = (pl.cdiv(r, br),)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[_rows_spec(br, d), _param_spec(d), _param_spec(d)],
        out_specs=_rows_spec(br, d),
        out_shape=jax.ShapeDtypeStruct((r, d), x2.dtype),
    )(x2, scale.reshape(1, d), bias.reshape(1, d))


def _ln_bwd_pallas(x2, scale, g2, eps):
    r, d = x2.shape
    br = min(_BLOCK_ROWS, max(8, r))
    grid = (pl.cdiv(r, br),)
    dx, dsc, dbi = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, n_rows=r),
        grid=grid,
        in_specs=[_rows_spec(br, d), _param_spec(d), _rows_spec(br, d)],
        out_specs=[_rows_spec(br, d), _param_spec(d), _param_spec(d)],
        out_shape=[
            jax.ShapeDtypeStruct((r, d), x2.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
    )(x2, scale.reshape(1, d), g2)
    return dx, dsc.reshape(d), dbi.reshape(d)


def _ln_xla(x, scale, bias, eps):
    """Reference path (flax numerics): f32 fast-variance stats."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True)
                      - mean * mean, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _ln_mxu(x, scale, bias, eps):
    """LN with the lane-dimension stat reduces expressed as MXU ones-dots.

    The r5b 16f-eval profile puts `convert_reduce_fusion` at 134.8 ms/step
    — XLA lowers flax's f32 mean/E[x^2] lane reduces as VPU shuffle trees,
    ~15x off the traffic floor at [4, 3137, 768]. The same reduction as a
    [rows, D] x [D, 8] ones-matmul rides the MXU at memory bandwidth:
    `scripts/microbench_lnstats.py` measured ln_mxu at noise level vs
    0.046 ms/call for `_ln_xla` at that shape (chained-loop timing,
    docs/CHIP_QUEUE_r05 lnstats_probes rows). Numerics: s1 accumulates the
    raw bf16 x exactly in f32 (MXU-native f32 accumulation); s2 is the f32
    xf*xf dotted with f32 ones — both differ from the lane reduce only in
    association order. Env-gated off until the end-to-end step bench
    confirms twice (the round-2..4 fused-LN rule: microbench wins have
    twice died to fusion-barrier effects at step level).
    """
    d = x.shape[-1]
    nd = x.ndim
    # column 0 carries the sum; 8 lanes is the minimal MXU-aligned width
    ones = jnp.zeros((d, 8), x.dtype).at[:, 0].set(1)
    xf = x.astype(jnp.float32)
    s1 = jax.lax.dot_general(
        x, ones, (((nd - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[..., :1]
    s2 = jax.lax.dot_general(
        xf * xf, ones.astype(jnp.float32), (((nd - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[..., :1]
    inv_d = jnp.float32(1.0 / d)
    mean = s1 * inv_d
    var = jnp.maximum(s2 * inv_d - mean * mean, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ln_pallas(x, scale, bias, eps):
    r = int(np.prod(x.shape[:-1]))
    d = x.shape[-1]
    return _ln_fwd_pallas(x.reshape(r, d), scale, bias, eps).reshape(x.shape)


def _ln_pallas_fwd(x, scale, bias, eps):
    return _ln_pallas(x, scale, bias, eps), (x, scale)


def _ln_pallas_bwd(eps, res, g):
    x, scale = res
    r = int(np.prod(x.shape[:-1]))
    d = x.shape[-1]
    dx, dsc, dbi = _ln_bwd_pallas(x.reshape(r, d), scale,
                                  g.reshape(r, d), eps)
    return (dx.reshape(x.shape), dsc.astype(scale.dtype),
            dbi.astype(scale.dtype))


_ln_pallas.defvjp(_ln_pallas_fwd, _ln_pallas_bwd)

_LN_IMPL = _os.environ.get("EGOVLP_LN_IMPL", "auto")
_LN_STATS_MXU = _os.environ.get("EGOVLP_LN_STATS_MXU", "0") == "1"


def _use_pallas(d: int, impl: str) -> bool:
    impl = _LN_IMPL if impl == "auto" and _LN_IMPL != "auto" else impl
    if impl == "pallas":
        return d % 128 == 0
    # auto currently means XLA: a round-2 fused-LN pallas attempt REGRESSED
    # the step by +65 ms (custom calls are fusion barriers — XLA could no
    # longer fuse LN into adjacent producers/consumers). This kernel is a
    # different design (single-pass fwd, recompute-stats bwd, grid-
    # accumulated param grads) but per the round-2/3 rule the END-TO-END
    # STEP BENCH is the only arbiter: flip via EGOVLP_LN_IMPL=pallas, keep
    # whatever the chip measurement says (docs/ROUND4_NOTES.md).
    return False


def layernorm(x, scale, bias, *, eps: float = 1e-5, impl: str = "auto"):
    """LayerNorm over the last axis; flax-equivalent numerics."""
    if _use_pallas(x.shape[-1], impl):
        return _ln_pallas(x, scale, bias, eps)
    if _LN_STATS_MXU and x.shape[-1] % 128 == 0:
        return _ln_mxu(x, scale, bias, eps)
    return _ln_xla(x, scale, bias, eps)


class LayerNorm(nn.Module):
    """Drop-in for `nn.LayerNorm(epsilon=..., dtype=...)` routing through
    the fused kernel on TPU (param names/shapes identical: scale, bias)."""

    epsilon: float = 1e-5
    dtype: object = None
    impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        if self.dtype is not None:
            x = x.astype(self.dtype)
        return layernorm(x, scale, bias, eps=self.epsilon, impl=self.impl)
