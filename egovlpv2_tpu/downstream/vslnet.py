"""VSLNet temporal-grounding head for EgoNLQ (JAX/flax).

Capability-parity target: `EgoNLQ/model/VSLNet.py:59-145` +
`EgoNLQ/model/layers.py`: VisualProjection -> shared FeatureEncoder
(positional embedding + 4x depthwise-separable conv + multi-head attention)
-> CQAttention (trilinear context/query attention) -> CQConcatenate
(weighted-pooled query) -> HighLightLayer (weighted BCE) -> Conditioned
start/end predictor ('EgoVLP' predictor variant: encoder reused twice +
layer norms). All sequence ops are masked to static max lengths for XLA.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

MASK_NEG = -1e30


def mask_logits(x: jax.Array, mask: jax.Array) -> jax.Array:
    return x + (1.0 - mask.astype(x.dtype)) * MASK_NEG


class DepthwiseSeparableConvBlock(nn.Module):
    dim: int
    kernel_size: int = 7
    num_layers: int = 4
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        for i in range(self.num_layers):
            residual = x
            out = nn.LayerNorm(epsilon=1e-6, name=f"ln_{i}")(x)
            out = nn.Conv(
                self.dim, (self.kernel_size,), feature_group_count=self.dim,
                padding="SAME", use_bias=False, name=f"depthwise_{i}",
            )(out)
            out = nn.Conv(self.dim, (1,), use_bias=True, name=f"pointwise_{i}")(out)
            out = nn.relu(out)
            out = nn.Dropout(self.drop_rate)(out, deterministic=deterministic)
            x = out + residual
        return x


class MultiHeadAttentionBlock(nn.Module):
    dim: int
    num_heads: int
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        h = self.num_heads
        dh = self.dim // h
        drop = lambda t: nn.Dropout(self.drop_rate)(t, deterministic=deterministic)
        out = drop(nn.LayerNorm(epsilon=1e-6, name="ln1")(x))
        q = nn.Dense(self.dim, name="query")(out)
        k = nn.Dense(self.dim, name="key")(out)
        v = nn.Dense(self.dim, name="value")(out)

        def heads(t):
            b, s, _ = t.shape
            return t.reshape(b, s, h, dh).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhqd,bhkd->bhqk", heads(q), heads(k)) / jnp.sqrt(dh)
        if mask is not None:
            scores = mask_logits(scores, mask[:, None, None, :])
        probs = drop(jax.nn.softmax(scores, axis=-1))
        val = jnp.einsum("bhqk,bhkd->bhqd", probs, heads(v))
        b, _, s, _ = val.shape
        val = val.transpose(0, 2, 1, 3).reshape(b, s, self.dim)
        residual = drop(val) + x
        out = drop(nn.LayerNorm(epsilon=1e-6, name="ln2")(residual))
        out = nn.Dense(self.dim, name="out_layer")(out)
        return nn.Dropout(self.drop_rate)(out, deterministic=deterministic) + residual


class FeatureEncoder(nn.Module):
    dim: int
    num_heads: int
    max_pos_len: int
    kernel_size: int = 7
    num_layers: int = 4
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        seq = x.shape[1]
        pos = nn.Embed(self.max_pos_len, self.dim, name="pos_embedding")(
            jnp.arange(seq)[None]
        )
        x = x + pos
        x = DepthwiseSeparableConvBlock(
            self.dim, self.kernel_size, self.num_layers, self.drop_rate,
            name="conv_block",
        )(x, deterministic)
        return MultiHeadAttentionBlock(
            self.dim, self.num_heads, self.drop_rate, name="attention_block"
        )(x, mask, deterministic)


class CQAttention(nn.Module):
    dim: int
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, context, query, c_mask, q_mask, deterministic=True):
        init = nn.initializers.xavier_uniform()
        w4c = self.param("w4C", init, (self.dim, 1))
        w4q = self.param("w4Q", init, (self.dim, 1))
        w4mlu = self.param("w4mlu", init, (1, 1, self.dim))
        drop = lambda t: nn.Dropout(self.drop_rate)(t, deterministic=deterministic)
        c, q = drop(context), drop(query)
        s0 = c @ w4c  # [B, Sc, 1]
        s1 = (q @ w4q).transpose(0, 2, 1)  # [B, 1, Sq]
        s2 = jnp.einsum("bcd,bqd->bcq", c * w4mlu, q)
        score = s0 + s1 + s2  # [B, Sc, Sq]
        score_ = jax.nn.softmax(mask_logits(score, q_mask[:, None, :]), axis=2)
        score_t = jax.nn.softmax(mask_logits(score, c_mask[:, :, None]), axis=1)
        score_t = score_t.transpose(0, 2, 1)
        c2q = score_ @ query
        q2c = (score_ @ score_t) @ context
        out = jnp.concatenate([context, c2q, context * c2q, context * q2c], axis=2)
        return nn.Dense(self.dim, name="cqa_linear")(out)


class CQConcatenate(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, context, query, q_mask):
        w = self.param("pool_weight", nn.initializers.xavier_uniform(), (self.dim, 1))
        alpha = jax.nn.softmax(mask_logits(query @ w, q_mask[:, :, None]), axis=1)
        pooled = jnp.einsum("bqd,bqo->bod", query, alpha)[:, 0]  # [B, dim]
        pooled = jnp.broadcast_to(pooled[:, None, :],
                                  (context.shape[0], context.shape[1], self.dim))
        out = jnp.concatenate([context, pooled], axis=2)
        return nn.Dense(self.dim, name="conv1d")(out)


class HighLightLayer(nn.Module):
    @nn.compact
    def __call__(self, x, mask):
        logits = nn.Dense(1, name="conv1d")(x)[:, :, 0]
        return jax.nn.sigmoid(mask_logits(logits, mask))

    @staticmethod
    def loss(scores, labels, mask, eps=1e-12):
        labels = labels.astype(jnp.float32)
        weights = jnp.where(labels == 0.0, 1.0, 2.0 * labels)
        s = jnp.clip(scores, eps, 1.0 - eps)
        bce = -(labels * jnp.log(s) + (1 - labels) * jnp.log(1 - s))
        mask = mask.astype(jnp.float32)
        return jnp.sum(bce * weights * mask) / (jnp.sum(mask) + eps)


class VSLNet(nn.Module):
    dim: int = 128
    num_heads: int = 8
    max_pos_len: int = 256
    video_feature_dim: int = 768
    query_feature_dim: int = 768
    drop_rate: float = 0.2

    @nn.compact
    def __call__(self, video_features, v_mask, query_features, q_mask,
                 deterministic=True):
        drop = lambda t: nn.Dropout(self.drop_rate)(t, deterministic=deterministic)
        v = nn.Dense(self.dim, name="video_affine")(drop(video_features))
        q = nn.Dense(self.dim, name="query_affine")(query_features)
        encoder = FeatureEncoder(
            self.dim, self.num_heads, self.max_pos_len, name="feature_encoder"
        )
        q = encoder(q, q_mask, deterministic)
        v = encoder(v, v_mask, deterministic)
        feats = CQAttention(self.dim, self.drop_rate, name="cq_attention")(
            v, q, v_mask, q_mask, deterministic
        )
        feats = CQConcatenate(self.dim, name="cq_concat")(feats, q, q_mask)
        h_score = HighLightLayer(name="highlight_layer")(feats, v_mask)
        feats = feats * h_score[:, :, None]

        pred_encoder = FeatureEncoder(
            self.dim, self.num_heads, self.max_pos_len, name="predictor_encoder"
        )
        start_f = pred_encoder(feats, v_mask, deterministic)
        end_f = pred_encoder(start_f, v_mask, deterministic)
        start_f = nn.LayerNorm(epsilon=1e-6, name="start_layer_norm")(start_f)
        end_f = nn.LayerNorm(epsilon=1e-6, name="end_layer_norm")(end_f)

        def block(name, feat):
            x = jnp.concatenate([feat, feats], axis=2)
            x = nn.Dense(self.dim, name=f"{name}_fc0")(x)
            x = nn.relu(x)
            return nn.Dense(1, name=f"{name}_fc1")(x)[:, :, 0]

        start_logits = mask_logits(block("start", start_f), v_mask)
        end_logits = mask_logits(block("end", end_f), v_mask)
        return h_score, start_logits, end_logits


def span_loss(start_logits, end_logits, start_labels, end_labels):
    def ce(logits, labels):
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))

    return ce(start_logits, start_labels) + ce(end_logits, end_labels)


def extract_top_spans(start_logits: jax.Array, end_logits: jax.Array,
                      k: int = 5) -> Tuple[jax.Array, jax.Array]:
    """Top-k (start, end) with end >= start via upper-triangular outer product
    (VSLNet.py:555-571)."""
    sp = jax.nn.softmax(start_logits, axis=1)
    ep = jax.nn.softmax(end_logits, axis=1)
    outer = sp[:, :, None] * ep[:, None, :]
    outer = jnp.triu(outer)
    b, h, w = outer.shape
    flat = outer.reshape(b, -1)
    _, idx = jax.lax.top_k(flat, k)
    return idx // w, idx % w
