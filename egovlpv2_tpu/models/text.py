"""RoBERTa-base text encoder with gated t2i cross-modal fusion.

Capability-parity target: the reference's vendored+modified HF copy
`EgoVLPv2/model/roberta.py` (RobertaModel:712, RobertaLayer:430,
RobertaSelfAttention:223, RobertaEmbeddings:147). Differences from stock HF
RoBERTa that are replicated here:

  * fused layers (index >= num_layers - num_fuse_block) carry a second
    attention whose K/V are projected from the *video* width
    (roberta.py:241-242) and whose output module has no LayerNorm
    (roberta.py:335-336);
  * the layer is restructured post-LN: LN(self_out + alpha_t2i * cross_out +
    hidden) — mathematically identical to HF when alpha-gated cross-attn is
    absent (roberta.py:486-488);
  * cross-attention over video tokens is UNmasked (encoder_attention_mask is
    None at every fused call site, model/model.py:270);
  * `last_norm` flag can skip the final FFN LayerNorm (roberta.py:420-426);
  * padding-aware position ids: cumsum(mask)*mask + pad_idx
    (roberta.py:881-892).

The unfused path is verified against `transformers.RobertaModel` in
tests/test_text_model.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from egovlpv2_tpu.core.config import FusionConfig, TextEncoderConfig
from egovlpv2_tpu.ops.attention import attend, make_additive_mask, split_heads, merge_heads
from egovlpv2_tpu.ops.layernorm import LayerNorm as FusedLayerNorm


def create_position_ids(input_ids: jax.Array, padding_idx: int) -> jax.Array:
    mask = (input_ids != padding_idx).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + padding_idx


class TextEmbeddings(nn.Module):
    cfg: TextEncoderConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, input_ids: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.cfg
        init = nn.initializers.normal(stddev=0.02)
        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, embedding_init=init,
                        name="word_embeddings")(input_ids)
        pos_ids = create_position_ids(input_ids, cfg.pad_token_id)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       embedding_init=init, name="position_embeddings")(pos_ids)
        ttype = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, embedding_init=init,
                         name="token_type_embeddings")(jnp.zeros_like(input_ids))
        x = word + ttype + pos
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = FusedLayerNorm(epsilon=cfg.ln_eps, dtype=self.dtype, name="LayerNorm")(x)
        return nn.Dropout(cfg.hidden_dropout)(x, deterministic=deterministic)


class TextSelfAttention(nn.Module):
    """Q from text; K/V from text (self) or from video tokens (cross, kv_dim set)."""

    cfg: TextEncoderConfig
    kv_dim: Optional[int] = None  # set for t2i cross-attention (video width)
    dtype: Optional[jnp.dtype] = None
    attn_impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        hidden: jax.Array,
        kv_source: jax.Array,
        bias: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg
        d, h = cfg.hidden_size, cfg.num_heads
        q = nn.Dense(d, dtype=self.dtype, name="query")(hidden)
        k = nn.Dense(d, dtype=self.dtype, name="key")(kv_source)
        v = nn.Dense(d, dtype=self.dtype, name="value")(kv_source)
        q, k, v = split_heads(q, h), split_heads(k, h), split_heads(v, h)
        use_prob_drop = cfg.attn_dropout > 0.0 and not deterministic
        out = attend(
            q, k, v,
            scale=cfg.head_dim**-0.5,
            bias=bias,
            impl=self.attn_impl,
            prob_dropout=cfg.attn_dropout if use_prob_drop else 0.0,
            dropout_rng=self.make_rng("dropout") if use_prob_drop else None,
        )
        out = merge_heads(out)
        out = nn.Dense(d, dtype=self.dtype, name="out_dense")(out)
        return nn.Dropout(cfg.hidden_dropout)(out, deterministic=deterministic)


class TextLayer(nn.Module):
    cfg: TextEncoderConfig
    fusion: FusionConfig
    fused: bool
    dtype: Optional[jnp.dtype] = None
    attn_impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        hidden: jax.Array,
        bias: Optional[jax.Array] = None,
        video: Optional[jax.Array] = None,
        last_norm: bool = True,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg
        attn_out = TextSelfAttention(
            cfg, dtype=self.dtype, attn_impl=self.attn_impl, name="attention"
        )(hidden, hidden, bias=bias, deterministic=deterministic)

        if self.fused and video is not None:
            cross = TextSelfAttention(
                cfg, kv_dim=self.fusion.dim_video, dtype=self.dtype,
                attn_impl=self.attn_impl, name="crossattention_t2i",
            )(attn_out, video, bias=None, deterministic=deterministic)
            alpha = self.param("alpha_t2i", nn.initializers.zeros, (1,), jnp.float32)
            attn_out = alpha.astype(attn_out.dtype) * cross + attn_out

        # Post-LN over (self + gated cross + residual), roberta.py:488.
        attn_out = FusedLayerNorm(
            epsilon=cfg.ln_eps, dtype=self.dtype, name="attention_LayerNorm"
        )(attn_out + hidden)

        inter = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="intermediate")(
            attn_out
        )
        inter = jax.nn.gelu(inter, approximate=False)
        out = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="output")(inter)
        out = nn.Dropout(cfg.hidden_dropout)(out, deterministic=deterministic)
        out = out + attn_out
        if last_norm:
            out = FusedLayerNorm(
                epsilon=cfg.ln_eps, dtype=self.dtype, name="output_LayerNorm"
            )(out)
        else:
            # Params must exist regardless of the flag so checkpoints are
            # structure-stable; evaluate lazily only for the flag branch.
            FusedLayerNorm(epsilon=cfg.ln_eps, dtype=self.dtype, name="output_LayerNorm")(
                jax.lax.stop_gradient(out[:1, :1])
            )
        return out


class TextEncoder(nn.Module):
    """The full text tower with staged execution for the fused paths."""

    cfg: TextEncoderConfig
    fusion: FusionConfig
    dtype: Optional[jnp.dtype] = None
    attn_impl: str = "xla"
    remat: bool = False

    def setup(self):
        self.embeddings = TextEmbeddings(self.cfg, dtype=self.dtype)
        num_unfused = self.cfg.num_layers - self.fusion.num_fuse_block
        layer = TextLayer
        if self.remat:
            layer = nn.remat(TextLayer, static_argnums=(4, 5))
        self.layers = [
            layer(
                self.cfg,
                self.fusion,
                fused=(i >= num_unfused),
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                name=f"layer_{i}",
            )
            for i in range(self.cfg.num_layers)
        ]

    def embed(self, input_ids: jax.Array, deterministic: bool = True) -> jax.Array:
        return self.embeddings(input_ids, deterministic=deterministic)

    def run_layers(
        self,
        hidden: jax.Array,
        bias: Optional[jax.Array],
        start: int = 0,
        end: Optional[int] = None,
        video: Optional[jax.Array] = None,
        last_norm: bool = True,
        deterministic: bool = True,
    ) -> jax.Array:
        end = self.cfg.num_layers if end is None else end
        for i in range(start, end):
            ln = last_norm if i == end - 1 else True
            hidden = self.layers[i](hidden, bias, video, ln, deterministic)
        return hidden

    def run_layer(self, hidden, i, bias=None, video=None, last_norm=True,
                  deterministic=True):
        return self.layers[i](hidden, bias, video, last_norm, deterministic)

    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        """Dual-tower forward over all layers -> last hidden state [B, S, D]."""
        bias = make_additive_mask(attention_mask)
        x = self.embed(input_ids, deterministic=deterministic)
        return self.run_layers(x, bias, deterministic=deterministic)
