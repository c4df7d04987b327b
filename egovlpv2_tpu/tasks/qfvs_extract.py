"""QFVS staged feature extraction: unfused tokens -> KTS -> fused shot feats.

Capability-parity targets:
  * `QFVS/extract_features.py:65-146` — stage 1: every 5 consecutive frames
    form one clip; the unfused video tower (fused-path CLS + first 6 blocks)
    produces per-clip tokens; the CLS-feature kernel K = F F^T drives
    cpd_auto segmentation into <= max_segments segments, each clip becoming
    a "shot";
  * `QFVS/extract_multimodal_features.py:67-150` — stage 2: concept prompts
    "There is a X" go through the unfused text tower once; each shot's
    tokens run the fused lockstep blocks -> video CLS ->
    cross_modal_video_transform -> the per-(shot, prompt) features consumed
    by the summary scorer.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from egovlpv2_tpu.downstream.qfvs import cpd_auto
from egovlpv2_tpu.models.egovlp import EgoVLPv2

FRAMES_PER_CLIP = 5


class QFVSExtractor:
    def __init__(self, model: EgoVLPv2, params, inner_batch: int = 16):
        if model.cfg.video.num_frames < FRAMES_PER_CLIP:
            # the reference QFVS pipeline treats 5 frames as one "clip"
            # (extract_features.py:65-146); the temporal embedding must
            # cover them (load 4-frame checkpoints with temporal inflation)
            raise ValueError(
                f"QFVS extraction needs video.num_frames >= {FRAMES_PER_CLIP} "
                f"(got {model.cfg.video.num_frames}); import the checkpoint "
                "with num_frames=5 temporal inflation")
        self.model = model
        self.params = params
        self.inner_batch = inner_batch

        @jax.jit
        def _video_unfused(params, clips):
            return model.apply({"params": params}, clips,
                               method=model.video_unfused)

        @jax.jit
        def _text_unfused(params, ids, mask):
            return model.apply({"params": params}, ids, mask,
                               method=model.text_unfused)

        @functools.partial(jax.jit, static_argnums=(4,))
        def _fuse(params, v_tokens, t_tokens, mask, num_frames):
            v_cls, _ = model.apply(
                {"params": params}, v_tokens, t_tokens, mask,
                num_frames, method=model.fuse_from_unfused,
            )
            return model.apply(
                {"params": params}, v_cls,
                method=lambda m, x: m.cross_modal_video_transform(x),
            )

        self._video_unfused = _video_unfused
        self._text_unfused = _text_unfused
        self._fuse = _fuse

    def unfused_clip_tokens(self, frames: np.ndarray) -> np.ndarray:
        """[T, H, W, C] -> per-clip unfused tokens [N_clips, S, D]
        (5 frames = 1 clip; tail padded by repeating the last frame)."""
        t = frames.shape[0]
        n_clips = -(-t // FRAMES_PER_CLIP)
        pad = n_clips * FRAMES_PER_CLIP - t
        if pad:
            frames = np.concatenate([frames, np.repeat(frames[-1:], pad, 0)])
        clips = frames.reshape(n_clips, FRAMES_PER_CLIP, *frames.shape[1:])
        outs = []
        ib = self.inner_batch
        n_pad = -(-n_clips // ib) * ib - n_clips
        if n_pad:
            clips = np.concatenate([clips, np.repeat(clips[-1:], n_pad, 0)])
        for i in range(0, clips.shape[0], ib):
            outs.append(np.asarray(
                self._video_unfused(self.params, jnp.asarray(clips[i:i+ib]))
            ))
        return np.concatenate(outs)[:n_clips]

    def segment_shots(
        self, clip_tokens: np.ndarray, max_segments: int = 20, vmax: float = 1.0,
    ) -> np.ndarray:
        """KTS over the CLS kernel -> segment boundaries (extract_features.py:
        65-146). Returns change points in clip units."""
        cls_feats = clip_tokens[:, 0].astype(np.float64)  # [N_clips, D]
        K = cls_feats @ cls_feats.T
        ncp = min(max_segments - 1, max(cls_feats.shape[0] - 1, 1))
        cps, _ = cpd_auto(K, ncp, vmax)
        return np.asarray(cps, int)

    def concept_text_tokens(self, tokenizer, concepts: Sequence[str]):
        """'There is a X' prompts -> unfused text tokens
        (dataset_prompt.py:70-76)."""
        prompts = [f"There is a {c}" for c in concepts]
        tok = tokenizer(prompts)
        t = np.asarray(self._text_unfused(self.params,
                                          jnp.asarray(tok["text_ids"]),
                                          jnp.asarray(tok["text_mask"])))
        return t, tok["text_mask"]

    def fused_shot_features(
        self,
        clip_tokens: np.ndarray,  # [N_clips, S, D] unfused video tokens
        text_tokens: np.ndarray,  # [1, St, D] one prompt's unfused tokens
        text_mask: np.ndarray,  # [1, St]
    ) -> np.ndarray:
        """Per-shot fused CLS -> cross_modal_video_transform [N_clips, hs]."""
        n = clip_tokens.shape[0]
        ib = self.inner_batch
        n_pad = -(-n // ib) * ib - n
        ct = clip_tokens
        if n_pad:
            ct = np.concatenate([ct, np.repeat(ct[-1:], n_pad, 0)])
        outs = []
        for i in range(0, ct.shape[0], ib):
            chunk = jnp.asarray(ct[i : i + ib])
            t_rep = jnp.broadcast_to(jnp.asarray(text_tokens),
                                     (ib,) + text_tokens.shape[1:])
            m_rep = jnp.broadcast_to(jnp.asarray(text_mask),
                                     (ib,) + text_mask.shape[1:])
            outs.append(np.asarray(
                self._fuse(self.params, chunk, t_rep, m_rep, FRAMES_PER_CLIP)
            ))
        return np.concatenate(outs)[:n]

    def extract_video(
        self,
        frames: np.ndarray,
        tokenizer,
        concepts: Sequence[str],
        oracle_prompt: Optional[str] = None,
        max_segments: int = 20,
    ) -> Dict[str, np.ndarray]:
        """Full per-video pipeline: stage 1 + KTS + stage 2 for each prompt."""
        clip_tokens = self.unfused_clip_tokens(frames)
        cps = self.segment_shots(clip_tokens, max_segments)
        prompts = list(concepts) + ([oracle_prompt] if oracle_prompt else [])
        t_all, m_all = self.concept_text_tokens(tokenizer, prompts)
        feats = {}
        for pi, name in enumerate(prompts):
            feats[name] = self.fused_shot_features(
                clip_tokens, t_all[pi : pi + 1], np.asarray(m_all)[pi : pi + 1]
            )
        return {"features": feats, "change_points": cps,
                "num_shots": clip_tokens.shape[0]}
