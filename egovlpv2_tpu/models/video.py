"""Divided space-time video transformer (TimeSformer-B/16 family).

Capability-parity target: reference `EgoVLPv2/model/video_transformer.py`
(SpaceTimeTransformer:231, VarAttention:86, SpaceTimeBlock:190). The design
here is TPU-first: instead of einops string rearranges over a '(b h) n d'
merged layout, tokens live in a static [B, H, F, N, Dh] layout so both
divided-attention axes are plain batched attends that XLA tiles onto the MXU,
and the CLS splice is a broadcast+concat with static shapes.

Semantics replicated exactly (verified by parity tests):
  * CLS query attends over the full space-time sequence; patch queries attend
    within their frame (space) or within their patch column (time), plus the
    broadcast CLS key/value (video_transformer.py:126-141).
  * time attention is applied to norm3(x), its output feeds the *input* of
    space attention, but the persistent residual stream skips it:
    x_out = x + space_out(norm1(x + time_out)) + mlp(...)
    (video_transformer.py:214-228, 'frozen-in-time' style).
  * gated i2t cross-attention after the space-attn projection in fused
    blocks: x += alpha_i2t * proj(attn(q(norm(x)), kv(text)))
    (video_transformer.py:155-185), alpha zero-initialised.
  * time-attention qkv zero-init + all-ones proj weight ('zeros' init,
    video_transformer.py:96-102).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from egovlpv2_tpu.core.config import (NORM_STATS, FusionConfig,
                                      VideoEncoderConfig)
from egovlpv2_tpu.ops.attention import attend
from egovlpv2_tpu.ops.divided import divided_attention
from egovlpv2_tpu.ops.layernorm import LayerNorm as FusedLayerNorm

# on-device normalization regimes for uint8 video input (see patchify)
_UINT8_NORM = NORM_STATS


def _trunc_normal(std: float):
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath equivalent)."""

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool) -> jax.Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: int
    drop: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class DividedAttention(nn.Module):
    """Space or time divided attention with CLS splice + optional gated i2t fusion."""

    cfg: VideoEncoderConfig
    fusion: FusionConfig
    axis: str  # 'space' | 'time'
    fused: bool = False  # build i2t cross-attn params (space axis only)
    zero_init: bool = False  # 'zeros' time-attn init
    dtype: Optional[jnp.dtype] = None
    attn_impl: str = "xla"
    pm_rows: bool = False  # rows arrive patch-major (EGOVLP_PM_HOIST)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, 1 + F*N, D]
        num_frames: int,
        text: Optional[jax.Array] = None,  # [B, St, Dt]
        text_bias: Optional[jax.Array] = None,  # additive [B, 1, 1, St]
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg
        b, s, d = x.shape
        h, dh = cfg.num_heads, cfg.head_dim
        f = num_frames
        n = (s - 1) // f
        scale = dh**-0.5

        if self.zero_init:
            kinit = binit = nn.initializers.zeros
            pinit = nn.initializers.ones
        else:
            kinit, binit, pinit = None, None, None

        qkv = nn.Dense(
            3 * d,
            use_bias=cfg.qkv_bias,
            dtype=self.dtype,
            name="qkv",
            **({"kernel_init": kinit, "bias_init": binit} if kinit else {}),
        )(x)
        # Divided attention with CLS splice: 'pallas' = the packed TPU kernel
        # (ops/divided.py), 'xla' = the einsum reference path (same math).
        out = divided_attention(
            qkv.reshape(b, s, 3, h, dh), scale=scale, axis=self.axis,
            num_frames=f, impl=self.attn_impl, pm_rows=self.pm_rows,
        ).reshape(b, s, d)

        x = nn.Dense(
            d,
            dtype=self.dtype,
            name="proj",
            **({"kernel_init": pinit, "bias_init": nn.initializers.zeros} if pinit else {}),
        )(out)
        x = nn.Dropout(cfg.drop_rate)(x, deterministic=deterministic)

        if self.fused and text is not None:
            # Gated image->text cross attention (video_transformer.py:155-185).
            kv_t = nn.Dense(
                2 * d, use_bias=cfg.qkv_bias, dtype=self.dtype, name="qkv_text_i2t"
            )(text)
            st = text.shape[1]
            kv_t = kv_t.reshape(b, st, 2, h, dh).transpose(2, 0, 3, 1, 4)
            k_t, v_t = kv_t[0], kv_t[1]
            xq = FusedLayerNorm(epsilon=cfg.ln_eps, dtype=self.dtype, name="norm_i2t_i")(x)
            q_t = nn.Dense(d, use_bias=cfg.qkv_bias, dtype=self.dtype, name="qkv_i2t")(xq)
            q_t = q_t.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
            y = attend(q_t, k_t, v_t, scale=scale, bias=text_bias, impl=self.attn_impl)
            y = y.transpose(0, 2, 1, 3).reshape(b, s, d)
            y = nn.Dense(d, dtype=self.dtype, name="proj_i2t")(y)
            y = nn.Dropout(cfg.drop_rate)(y, deterministic=deterministic)
            alpha = self.param("alpha_i2t", nn.initializers.zeros, (1,), jnp.float32)
            x = x + alpha.astype(x.dtype) * y
        return x


class SpaceTimeBlock(nn.Module):
    cfg: VideoEncoderConfig
    fusion: FusionConfig
    fused: bool
    drop_path: float = 0.0
    dtype: Optional[jnp.dtype] = None
    attn_impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        num_frames: int,
        text: Optional[jax.Array] = None,
        text_bias: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg
        ln = lambda name: FusedLayerNorm(epsilon=cfg.ln_eps, dtype=self.dtype, name=name)
        # EGOVLP_PM_HOIST: permute the D-wide activation to patch-major
        # BEFORE the time sublayer's qkv projection (rowwise ops commute
        # with row permutation) instead of the kernel permuting the 3D-wide
        # qkv — half the permuted bytes per block. Training-mode dropout
        # draws per-position bits in permuted order (same distribution).
        from egovlpv2_tpu.ops import divided as _divided
        hoist = (_divided._PM_HOIST and self.attn_impl != "xla"
                 and _divided._time_pm("time", x.shape[1], num_frames))
        xt = ln("norm3")(x)
        if hoist:
            xt = _divided._to_patch_major(xt, num_frames)
        time_out = DividedAttention(
            cfg, self.fusion, axis="time", fused=False, zero_init=True,
            dtype=self.dtype, attn_impl=self.attn_impl, pm_rows=hoist,
            name="timeattn",
        )(xt, num_frames, deterministic=deterministic)
        if hoist:
            time_out = _divided._from_patch_major(time_out, num_frames)
        time_residual = x + time_out
        space_out = DividedAttention(
            cfg, self.fusion, axis="space", fused=self.fused,
            dtype=self.dtype, attn_impl=self.attn_impl, name="attn",
        )(
            ln("norm1")(time_residual), num_frames,
            text=text, text_bias=text_bias, deterministic=deterministic,
        )
        dp = DropPath(self.drop_path)
        # 'frozen-in-time' residual: the persistent stream skips time-attn.
        space_residual = x + dp(space_out, deterministic)
        mlp_out = Mlp(
            int(cfg.embed_dim * cfg.mlp_ratio), cfg.embed_dim,
            drop=cfg.drop_rate, dtype=self.dtype, name="mlp",
        )(ln("norm2")(space_residual), deterministic=deterministic)
        return space_residual + dp(mlp_out, deterministic)


class PatchEmbed(nn.Module):
    """Patchify as space-to-depth + one MXU matmul.

    Mathematically identical to the reference's stride-p Conv2d patchify
    (`video_transformer.py:61` VideoPatchEmbed) but lowered explicitly to a
    single [B*F*N, p*p*C] x [p*p*C, D] matmul: XLA maps this straight onto
    the MXU, where the convolution formulation showed up as ~10% of the
    round-1 step profile. The param layout matches flax nn.Conv (HWIO kernel
    + bias) so checkpoints and the torch importer are unchanged.
    """

    embed_dim: int
    patch_size: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """[BF, H, W, C] -> [BF, N, D] (row-major patches)."""
        p = self.patch_size
        bf, h, w, c = x.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (p, p, c, self.embed_dim), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros,
                          (self.embed_dim,), jnp.float32)
        x = x.reshape(bf, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)  # [BF, Hp, Wp, p, p, C]
        x = x.reshape(bf, (h // p) * (w // p), p * p * c)
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype)
        return x @ kernel.reshape(p * p * c, self.embed_dim) + bias


class SpaceTimeViT(nn.Module):
    """The full video tower. Exposes staged execution for the fused paths."""

    cfg: VideoEncoderConfig
    fusion: FusionConfig
    dtype: Optional[jnp.dtype] = None
    attn_impl: str = "xla"
    remat: bool = False

    def setup(self):
        cfg = self.cfg
        self.patch_proj = PatchEmbed(
            cfg.embed_dim, cfg.patch_size, dtype=self.dtype,
            name="patch_embed",
        )
        self.cls_token = self.param(
            "cls_token", _trunc_normal(0.02), (1, 1, cfg.embed_dim), jnp.float32
        )
        self.pos_embed = self.param(
            "pos_embed",
            _trunc_normal(0.02),
            (1, cfg.patches_per_frame + 1, cfg.embed_dim),
            jnp.float32,
        )
        self.temporal_embed = self.param(
            "temporal_embed",
            nn.initializers.zeros,
            (1, cfg.num_frames, cfg.embed_dim),
            jnp.float32,
        )
        num_unfused = cfg.depth - self.fusion.num_fuse_block
        # numpy, not jnp: setup() may run under jit tracing where float() on
        # a traced array is a ConcretizationTypeError.
        dpr = [float(r) for r in np.linspace(0.0, cfg.drop_path_rate, cfg.depth)]
        block = SpaceTimeBlock
        if self.remat:
            block = nn.remat(SpaceTimeBlock, static_argnums=(2, 5))
        self.blocks = [
            block(
                cfg,
                self.fusion,
                fused=(i >= num_unfused),
                drop_path=dpr[i],
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                name=f"blocks_{i}",
            )
            for i in range(cfg.depth)
        ]
        self.norm = FusedLayerNorm(epsilon=cfg.ln_eps, dtype=self.dtype, name="norm")
        self.pos_drop = nn.Dropout(cfg.drop_rate)

    def patchify(self, video: jax.Array) -> jax.Array:
        """[B, F, H, W, C] -> [B, F*N, D] (frame-major, row-major patches).

        uint8 input means the host shipped un-normalized frames (dataset
        `device_norm=True`): apply the `cfg.uint8_norm` regime here so the
        normalize rides the same fused pass as the patch projection."""
        if video.dtype == jnp.uint8:
            mean, std, scale = _UINT8_NORM[self.cfg.uint8_norm]
            video = (video.astype(jnp.float32) * scale
                     - jnp.asarray(mean, jnp.float32)) / jnp.asarray(
                         std, jnp.float32)
        b, f, hh, ww, c = video.shape
        x = video.reshape(b * f, hh, ww, c)
        x = self.patch_proj(x)  # [B*F, N, D]
        return x.reshape(b, f * self.cfg.patches_per_frame, self.cfg.embed_dim)

    def total_pos_embed(self, num_frames: int, seq_len: int) -> jax.Array:
        """Tiled positional + repeated temporal embedding, CLS first.

        pos tiling [1,2,3]->[1,2,3,1,2,3]; temporal repeat [1,2]->[1,1,1,2,2,2]
        (video_transformer.py:362-368).
        """
        n = self.cfg.patches_per_frame
        cls_embed = self.pos_embed[:, :1]
        tile_pos = jnp.tile(self.pos_embed[:, 1:], (1, self.cfg.num_frames, 1))
        tile_temporal = jnp.repeat(self.temporal_embed, n, axis=1)
        total = jnp.concatenate([cls_embed, tile_pos + tile_temporal], axis=1)
        return total[:, :seq_len]

    def embed(
        self,
        video: jax.Array,
        cls_token: Optional[jax.Array] = None,
        tokens: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        """Patchify (or reuse `tokens`), prepend CLS, add pos/temporal embeds."""
        if tokens is None:
            tokens = self.patchify(video)
        b = tokens.shape[0]
        f = tokens.shape[1] // self.cfg.patches_per_frame
        cls = self.cls_token if cls_token is None else cls_token
        cls = jnp.broadcast_to(cls.astype(tokens.dtype), (b, 1, self.cfg.embed_dim))
        x = jnp.concatenate([cls, tokens], axis=1)
        x = x + self.total_pos_embed(f, x.shape[1]).astype(x.dtype)
        return self.pos_drop(x, deterministic=deterministic)

    def run_blocks(
        self,
        x: jax.Array,
        num_frames: int,
        start: int = 0,
        end: Optional[int] = None,
        text: Optional[jax.Array] = None,
        text_bias: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        end = self.cfg.depth if end is None else end
        for blk in self.blocks[start:end]:
            x = blk(x, num_frames, text, text_bias, deterministic)
        return x

    def run_block(self, x, i, num_frames, text=None, text_bias=None, deterministic=True):
        return self.blocks[i](x, num_frames, text, text_bias, deterministic)

    def finalize(self, x: jax.Array) -> jax.Array:
        """Final LN -> CLS feature."""
        return self.norm(x)[:, 0]

    def __call__(self, video: jax.Array, deterministic: bool = True) -> jax.Array:
        """Dual-tower forward: [B, F, H, W, C] -> [B, D] CLS feature."""
        f = video.shape[1]
        x = self.embed(video, deterministic=deterministic)
        x = self.run_blocks(x, f, deterministic=deterministic)
        return self.finalize(x)
