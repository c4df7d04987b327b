"""Attention primitives shared by all encoders.

One implementation surface for: divided space attention, divided time
attention (both with the CLS splice of reference
`EgoVLPv2/model/video_transformer.py:117-153`), text self-attention with
additive padding masks, and both gated cross-attentions (i2t / t2i).

`attend` is the single hot op: softmax(scale * q @ k^T + bias) @ v with the
softmax accumulated in float32 regardless of the bf16 compute dtype. The
`impl` switch selects the XLA einsum path (always available, used for parity
tests) or the Pallas TPU flash kernel (`egovlpv2_tpu.ops.flash`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# Additive mask value. Large enough to zero out after softmax in f32, small
# enough to stay finite in bf16 (reference uses -10000.0-style HF extended
# masks, `model/roberta.py:826` via get_extended_attention_mask).
NEG_INF = -1e9


def make_additive_mask(attention_mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """[B, S] {0,1} padding mask -> [B, 1, 1, S] additive bias (0 keep / NEG_INF drop)."""
    bias = (1.0 - attention_mask.astype(dtype)) * NEG_INF
    return bias[:, None, None, :]


def attend(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float,
    bias: Optional[jax.Array] = None,
    impl: str = "xla",
    prob_dropout: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Scaled dot-product attention over the last two axes.

    Args:
      q: [..., Sq, Dh]
      k: [..., Sk, Dh]
      v: [..., Sk, Dh]
      scale: multiplied into q (reference multiplies q by head_dim**-0.5
        before the matmul, `video_transformer.py:123`).
      bias: additive attention bias broadcastable to [..., Sq, Sk].
      impl: 'xla' or 'pallas'.
      prob_dropout: dropout on the attention probabilities (the reference
        trains text attention with p=0.1, `roberta.py:244,313`). Only the
        XLA path supports it; pass 0 at eval.

    Returns [..., Sq, Dh] in q.dtype.
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() in ("tpu", "axon") else "xla"
    if impl == "pallas" and prob_dropout == 0.0:
        from egovlpv2_tpu.ops import flash

        return flash.flash_attention(q, k, v, scale=scale, bias=bias)

    # NOTE: keep the N-D einsum. Folding batch dims to a 3-D batched dot was
    # measured 30% SLOWER end-to-end on v5e (1.14 s/step vs 0.87 s/step):
    # the explicit reshapes/broadcasts materialize copies XLA otherwise
    # fuses into the dot.
    acc_t = jnp.float32
    logits = jnp.einsum(
        "...qd,...kd->...qk", q * jnp.asarray(scale, q.dtype), k,
        preferred_element_type=acc_t,
    )
    if bias is not None:
        logits = logits + bias.astype(acc_t)
    probs = jax.nn.softmax(logits, axis=-1)
    if prob_dropout > 0.0:
        if dropout_rng is None:
            raise ValueError("prob_dropout requires dropout_rng")
        keep = jax.random.bernoulli(dropout_rng, 1.0 - prob_dropout, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - prob_dropout), 0.0)
    # PV output stored directly in the compute dtype: the MXU accumulates in
    # f32 internally either way, so this equals the f32-output + cast but
    # skips the conversion kernels.
    out = jnp.einsum(
        "...qk,...kd->...qd", probs.astype(q.dtype), v,
        preferred_element_type=q.dtype,
    )
    return out


def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """[B, S, H*Dh] -> [B, H, S, Dh]."""
    b, s, d = x.shape
    return x.reshape(b, s, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    """[B, H, S, Dh] -> [B, S, H*Dh]."""
    b, h, s, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * dh)
