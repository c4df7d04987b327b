"""Task heads: Pooler, ITM, MLM (reference `EgoVLPv2/model/heads.py`)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from egovlpv2_tpu.ops.layernorm import LayerNorm as FusedLayerNorm


class Pooler(nn.Module):
    """dense + tanh over an already-pooled feature (heads.py:15-25; note the
    reference applies it to the transformed CLS feature, not [:, 0])."""

    hidden_size: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return jnp.tanh(nn.Dense(self.hidden_size, dtype=self.dtype, name="dense")(x))


class ITMHead(nn.Module):
    """Linear -> 2 logits over concat(text_pool, video_pool) (heads.py:28-35)."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Dense(2, dtype=self.dtype, name="fc")(x)


class MLMHead(nn.Module):
    """BertPredictionHeadTransform (dense+gelu+LN eps 1e-12) + vocab decoder
    with a separate bias (heads.py:38-50)."""

    hidden_size: int
    vocab_size: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="transform_dense")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = FusedLayerNorm(epsilon=1e-12, dtype=self.dtype, name="transform_LayerNorm")(x)
        logits = nn.Dense(
            self.vocab_size, use_bias=False, dtype=self.dtype, name="decoder"
        )(x)
        bias = self.param("bias", nn.initializers.zeros, (self.vocab_size,), jnp.float32)
        return logits + bias.astype(logits.dtype)
