"""EgoVLPv2 flagship model: dual encoders + fusion-in-the-backbone stack.

Capability-parity target: `EgoVLPv2/model/model.py` (FrozenInTime:46,
infer:189, compute_text:491, compute_video:524) and the fused forward
documented in SURVEY.md §3.3. TPU-first notes:

  * the fused ITM/MLM paths share one `fused_encode` implementation; the
    reference duplicates ~80 lines per task (model.py:209-365);
  * patchify (the conv) can be computed once per step and reused across the
    EgoNCE / ITM / MLM passes via the `video_tokens` argument — identical
    math, one less conv;
  * the fused video path uses a model-level CLS token and final LayerNorm
    (eps 1e-6) distinct from the dual tower's own (model.py:150-156);
  * static task selection: tasks are Python constants at trace time so each
    jitted step compiles exactly the graph it needs.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from egovlpv2_tpu.core.config import ModelConfig
from egovlpv2_tpu.models.heads import ITMHead, MLMHead, Pooler
from egovlpv2_tpu.models.text import TextEncoder
from egovlpv2_tpu.models.video import SpaceTimeViT, _trunc_normal
from egovlpv2_tpu.ops.layernorm import LayerNorm as FusedLayerNorm
from egovlpv2_tpu.ops.attention import make_additive_mask


def _proj_mlp(dim: int, dtype, name: str):
    """'minimal' projection: Linear(no bias) -> ReLU -> Linear -> ReLU -> Linear
    (model/model.py:105-115)."""

    class ProjMLP(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(dim, use_bias=False, dtype=dtype, name="fc0")(x)
            x = nn.relu(x)
            x = nn.Dense(dim, dtype=dtype, name="fc1")(x)
            x = nn.relu(x)
            x = nn.Dense(dim, dtype=dtype, name="fc2")(x)
            return x

    return ProjMLP(name=name)


def _proj_small(dim: int, dtype, name: str, relu_first: bool):
    """fine-tune projection (model_epic_charades.py:118-119)."""

    class ProjSmall(nn.Module):
        @nn.compact
        def __call__(self, x):
            if relu_first:
                x = nn.relu(x)
            x = nn.Dense(dim, dtype=dtype, name="fc0")(x)
            return x

    return ProjSmall(name=name)


class EgoVLPv2(nn.Module):
    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        dtype = None if cfg.compute_dtype == "float32" else jnp.dtype(cfg.compute_dtype)
        self._dtype = dtype
        self.video_model = SpaceTimeViT(
            cfg.video, cfg.fusion, dtype=dtype, attn_impl=cfg.attn_impl,
            remat=cfg.remat, name="video_model",
        )
        self.text_model = TextEncoder(
            cfg.text, cfg.fusion, dtype=dtype, attn_impl=cfg.attn_impl,
            remat=cfg.remat, name="text_model",
        )
        if cfg.projection == "minimal":
            self.txt_proj = _proj_mlp(cfg.projection_dim, dtype, "txt_proj")
            self.vid_proj = _proj_mlp(cfg.projection_dim, dtype, "vid_proj")
        elif cfg.projection == "small":
            self.txt_proj = _proj_small(cfg.projection_dim, dtype, "txt_proj", True)
            self.vid_proj = _proj_small(cfg.projection_dim, dtype, "vid_proj", False)
        else:
            self.txt_proj = None
            self.vid_proj = None

        if cfg.with_itm_head or cfg.with_mlm_head:
            hs = cfg.fusion.hidden_size
            init = nn.initializers.normal(stddev=0.02)
            self.fused_cls_token = self.param(
                "cls_token", nn.initializers.zeros, (1, 1, cfg.video.embed_dim),
                jnp.float32,
            )
            self.fused_norm = FusedLayerNorm(
                epsilon=cfg.fusion.ln_eps, dtype=dtype, name="norm"
            )
            self.cross_modal_text_transform = nn.Dense(
                hs, kernel_init=init, dtype=dtype, name="cross_modal_text_transform"
            )
            self.cross_modal_video_transform = nn.Dense(
                hs, kernel_init=init, dtype=dtype, name="cross_modal_video_transform"
            )
            self.cross_modal_text_pooler = Pooler(
                hs, dtype=dtype, name="cross_modal_text_pooler"
            )
            self.cross_modal_video_pooler = Pooler(
                hs, dtype=dtype, name="cross_modal_video_pooler"
            )
        if cfg.with_itm_head:
            self.itm_score = ITMHead(dtype=dtype, name="itm_score")
        if cfg.with_mlm_head:
            self.mlm_score = MLMHead(
                cfg.fusion.hidden_size, cfg.text.vocab_size, dtype=dtype,
                name="mlm_score",
            )

    # ---------------- dual towers ----------------

    def patchify(self, video: jax.Array) -> jax.Array:
        """Patch-embed once for reuse across the EgoNCE/ITM/MLM passes."""
        return self.video_model.patchify(video)

    def _num_frames(self, video, video_tokens, num_frames):
        if video is not None:
            return video.shape[1]
        if num_frames is not None:
            return num_frames
        return video_tokens.shape[1] // self.cfg.video.patches_per_frame

    def compute_video(
        self,
        video: Optional[jax.Array],
        video_tokens: Optional[jax.Array] = None,
        num_frames: Optional[int] = None,
        deterministic: bool = True,
        project: bool = True,
    ) -> jax.Array:
        f = self._num_frames(video, video_tokens, num_frames)
        x = self.video_model.embed(video, tokens=video_tokens,
                                   deterministic=deterministic)
        x = self.video_model.run_blocks(x, f, deterministic=deterministic)
        x = self.video_model.finalize(x)
        if project and self.vid_proj is not None:
            x = self.vid_proj(x)
        return x

    def compute_text(
        self,
        input_ids: jax.Array,
        attention_mask: jax.Array,
        deterministic: bool = True,
        project: bool = True,
    ) -> jax.Array:
        x = self.text_model(input_ids, attention_mask, deterministic=deterministic)[:, 0]
        if project and self.txt_proj is not None:
            x = self.txt_proj(x)
        return x

    def compute_text_tokens(
        self,
        input_ids: jax.Array,
        attention_mask: jax.Array,
        deterministic: bool = True,
        project: bool = True,
    ) -> jax.Array:
        x = self.text_model(input_ids, attention_mask, deterministic=deterministic)
        if project and self.txt_proj is not None:
            x = self.txt_proj(x)
        return x

    # ---------------- fused stack ----------------

    def video_unfused(
        self,
        video: Optional[jax.Array],
        video_tokens: Optional[jax.Array] = None,
        num_frames: Optional[int] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        """Embed (fused-path CLS) + first `num_unfused` video blocks.

        This is the QFVS stage-1 'model_video_unfused' surface
        (QFVS/model/model_video_unfused.py:168-206)."""
        f = self._num_frames(video, video_tokens, num_frames)
        v = self.video_model.embed(
            video, cls_token=self.fused_cls_token, tokens=video_tokens,
            deterministic=deterministic,
        )
        return self.video_model.run_blocks(v, f, start=0, end=self.cfg.num_unfused,
                                           deterministic=deterministic)

    def text_unfused(
        self, input_ids: jax.Array, attention_mask: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        """Embeddings + first `num_unfused` text layers (QFVS
        'model_text_unfused', QFVS/model/model_text_unfused.py:167-186)."""
        bias = make_additive_mask(attention_mask)
        t = self.text_model.embed(input_ids, deterministic=deterministic)
        return self.text_model.run_layers(t, bias, start=0,
                                          end=self.cfg.num_unfused,
                                          deterministic=deterministic)

    def fuse_from_unfused(
        self,
        v: jax.Array,
        t: jax.Array,
        attention_mask: jax.Array,
        num_frames: int,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        """Lockstep fused blocks from precomputed unfused intermediates;
        the QFVS 'model_fused' stage (QFVS/model/model_fused.py:172-198).

        Text attends to the PRE-update video tokens, then video advances
        (model.py:259-271). Returns (video_cls, text_tokens)."""
        cfg = self.cfg
        bias = make_additive_mask(attention_mask)
        for i in range(cfg.num_unfused, cfg.text.num_layers):
            v_new = self.video_model.run_block(
                v, i, num_frames, text=t, text_bias=bias,
                deterministic=deterministic,
            )
            t = self.text_model.run_layer(
                t, i, bias=bias, video=v, last_norm=True,
                deterministic=deterministic,
            )
            v = v_new
        return self.fused_norm(v)[:, 0], t

    def fused_encode(
        self,
        video: Optional[jax.Array],
        input_ids: jax.Array,
        attention_mask: jax.Array,
        video_tokens: Optional[jax.Array] = None,
        num_frames: Optional[int] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        """Run the 6-unfused + 6-fused lockstep stack (SURVEY.md §3.3).

        Returns (video_cls [B, Dv], text_tokens [B, St, Dt]).
        """
        f = self._num_frames(video, video_tokens, num_frames)
        v = self.video_unfused(video, video_tokens, f, deterministic)
        t = self.text_unfused(input_ids, attention_mask, deterministic)
        return self.fuse_from_unfused(v, t, attention_mask, f, deterministic)

    def _itm_head_from(self, v_cls, t):
        t_cls = self.cross_modal_text_transform(t[:, 0])
        v_emb = self.cross_modal_video_transform(v_cls)
        cls_feats = jnp.concatenate(
            [self.cross_modal_text_pooler(t_cls), self.cross_modal_video_pooler(v_emb)],
            axis=-1,
        )
        return self.itm_score(cls_feats)

    def itm_forward(
        self,
        video: Optional[jax.Array],
        input_ids: jax.Array,
        attention_mask: jax.Array,
        video_tokens: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        """ITM logits [B, 2] (model.py:209-290)."""
        v_cls, t = self.fused_encode(
            video, input_ids, attention_mask, video_tokens=video_tokens,
            deterministic=deterministic,
        )
        return self._itm_head_from(v_cls, t)

    def mlm_forward(
        self,
        video: Optional[jax.Array],
        mlm_input_ids: jax.Array,
        attention_mask: jax.Array,
        video_tokens: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        """MLM logits [B, St, vocab] (model.py:293-365)."""
        _, t = self.fused_encode(
            video, mlm_input_ids, attention_mask, video_tokens=video_tokens,
            deterministic=deterministic,
        )
        t = self.cross_modal_text_transform(t)
        return self.mlm_score(t)

    def _frames_from_unfused(self, v_un: jax.Array) -> int:
        return (v_un.shape[1] - 1) // self.cfg.video.patches_per_frame

    def mlm_forward_from_video(
        self, v_un: jax.Array, mlm_input_ids: jax.Array,
        attention_mask: jax.Array, deterministic: bool = True,
    ) -> jax.Array:
        """MLM logits from precomputed unfused video tokens. The video side
        of the fused paths is dropout-free and text-independent through the
        unfused blocks, so MLM/ITM can share one unfused-video pass —
        identical math to the reference's two passes (model.py:238-244 vs
        325-331)."""
        f = self._frames_from_unfused(v_un)
        t = self.text_unfused(mlm_input_ids, attention_mask, deterministic)
        _, t = self.fuse_from_unfused(v_un, t, attention_mask, f, deterministic)
        return self.mlm_score(self.cross_modal_text_transform(t))

    def itm_forward_from_video(
        self, v_un: jax.Array, input_ids: jax.Array,
        attention_mask: jax.Array, deterministic: bool = True,
    ) -> jax.Array:
        """ITM logits from (already gathered) unfused video tokens."""
        f = self._frames_from_unfused(v_un)
        t = self.text_unfused(input_ids, attention_mask, deterministic)
        v_cls, t = self.fuse_from_unfused(v_un, t, attention_mask, f,
                                          deterministic)
        return self._itm_head_from(v_cls, t)

    def mlm_itm_forward_from_video(
        self,
        v_un_mlm: jax.Array,
        mlm_input_ids: jax.Array,
        mlm_attention_mask: jax.Array,
        v_un_itm: jax.Array,
        itm_input_ids: jax.Array,
        itm_attention_mask: jax.Array,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        """MLM + ITM fused stacks batched into ONE 2B-wide pass.

        Examples are independent along batch, so concatenating the MLM and
        mined-ITM halves before text_unfused/fuse_from_unfused is exactly
        the two separate passes — but with half the kernel launches and
        larger matmuls. Returns (mlm_logits, itm_logits)."""
        b = v_un_mlm.shape[0]
        f = self._frames_from_unfused(v_un_mlm)
        v_un = jnp.concatenate([v_un_mlm, v_un_itm], axis=0)
        ids = jnp.concatenate([mlm_input_ids, itm_input_ids], axis=0)
        mask = jnp.concatenate([mlm_attention_mask, itm_attention_mask], axis=0)
        t = self.text_unfused(ids, mask, deterministic)
        v_cls, t = self.fuse_from_unfused(v_un, t, mask, f, deterministic)
        mlm_logits = self.mlm_score(self.cross_modal_text_transform(t[:b]))
        itm_logits = self._itm_head_from(v_cls[b:], t[b:])
        return mlm_logits, itm_logits

    def __call__(
        self,
        video: jax.Array,
        input_ids: jax.Array,
        attention_mask: jax.Array,
        deterministic: bool = True,
    ):
        """Dual-encoder forward -> (text_embeds, video_embeds). Kept as the
        default entry so `init` touches the dual towers + projections."""
        t = self.compute_text(input_ids, attention_mask, deterministic=deterministic)
        v = self.compute_video(video, deterministic=deterministic)
        return t, v

    def init_all(self, video, input_ids, attention_mask):
        """Touch every parameter (dual + fused + heads) for a single init."""
        out = self(video, input_ids, attention_mask)
        if self.cfg.with_itm_head:
            out = out + (self.itm_forward(video, input_ids, attention_mask),)
        if self.cfg.with_mlm_head:
            out = out + (self.mlm_forward(video, input_ids, attention_mask),)
        if not (self.cfg.with_itm_head or self.cfg.with_mlm_head):
            # The reference towers carry the gated-fusion parameters even in
            # the Dual fine-tune model (model_epic_charades.py builds the
            # same SpaceTimeTransformer / RobertaModel tree); touch them so
            # published fine-tune checkpoints strict-import.
            bias = make_additive_mask(attention_mask)
            t0 = self.text_model.embed(input_ids)
            v0 = self.video_model.embed(video)
            self.video_model.run_blocks(
                v0, video.shape[1], text=t0, text_bias=bias)
            self.text_model.run_layers(t0, bias, video=v0)
        return out


def sim_matrix(a: jax.Array, b: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Cosine-similarity matrix (model.py:576-584)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a_n = jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), eps)
    b_n = jnp.maximum(jnp.linalg.norm(b, axis=1, keepdims=True), eps)
    return (a / a_n) @ (b / b_n).T


def sim_matrix_batch(a: jax.Array, b: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Batched cosine similarity [B, Na, D] x [B, Nb, D] -> [B, Na, Nb]
    (model.py:587-595)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a_n = jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), eps)
    b_n = jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), eps)
    return jnp.einsum("bnd,bmd->bnm", a / a_n, b / b_n)
