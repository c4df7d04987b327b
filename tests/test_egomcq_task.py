"""EgoMCQ evaluation loop end-to-end on a tiny model (synthetic data)."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from egovlpv2_tpu.core.config import (
    FusionConfig, ModelConfig, TextEncoderConfig, VideoEncoderConfig,
)
from egovlpv2_tpu.models.egovlp import EgoVLPv2
from egovlpv2_tpu.tasks.egomcq import evaluate_egomcq, make_egomcq_eval_step

CFG = ModelConfig(
    video=VideoEncoderConfig(img_size=32, patch_size=16, embed_dim=32, depth=4,
                             num_heads=2, num_frames=2),
    text=TextEncoderConfig(vocab_size=120, hidden_size=32, num_layers=4,
                           num_heads=2, intermediate_size=64,
                           max_position_embeddings=40),
    fusion=FusionConfig(num_fuse_block=2, dim_video=32, dim_text=32,
                        hidden_size=32),
    projection_dim=16,
    remat=False,
)


def test_egomcq_eval_loop():
    model = EgoVLPv2(CFG)
    rs = np.random.RandomState(0)
    video = jnp.asarray(rs.randn(1, 2, 32, 32, 3), jnp.float32)
    ids = jnp.asarray([[0, 5, 2, 1]], jnp.int32)
    mask = (ids != 1).astype(jnp.int32)
    params = model.init(jax.random.PRNGKey(0), video, ids, mask,
                        method=model.init_all)["params"]

    step = make_egomcq_eval_step(model, with_vtm=True)
    batches = []
    for b in range(2):
        rsb = np.random.RandomState(b)
        batches.append({
            "video5": rsb.randn(2, 5, 2, 32, 32, 3).astype(np.float32),
            "ids": np.array([[0, 5, 6, 2], [0, 7, 8, 2]], np.int32),
            "mask": np.ones((2, 4), np.int32),
            "answer": np.array([1, 3]),
            "type": np.array([1, 2]),
        })
    metrics = evaluate_egomcq(step, params, batches)
    for key in ("vtc/Inter-video", "vtc/Intra-video",
                "vtm/Inter-video", "ensemble/Inter-video"):
        assert key in metrics
        assert 0.0 <= metrics[key] <= 100.0


def test_egomcq_eval_uint8_matches_f32():
    """MCQ eval over uint8 video5 (device-norm feed) matches the host
    imagenet-normalized f32 feed built from the same uint8 values."""
    model = EgoVLPv2(CFG)
    rs = np.random.RandomState(0)
    video = jnp.asarray(rs.randn(1, 2, 32, 32, 3), jnp.float32)
    ids = jnp.asarray([[0, 5, 2, 1]], jnp.int32)
    mask = (ids != 1).astype(jnp.int32)
    params = model.init(jax.random.PRNGKey(0), video, ids, mask,
                        method=model.init_all)["params"]
    step = make_egomcq_eval_step(model, with_vtm=True)

    u8 = rs.randint(0, 256, (2, 5, 2, 32, 32, 3)).astype(np.uint8)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    f32 = (u8.astype(np.float32) / 255.0 - mean) / std
    bids = np.array([[0, 5, 6, 2], [0, 7, 8, 2]], np.int32)
    bmask = np.ones((2, 4), np.int32)

    out_u8 = step(params, jnp.asarray(u8), jnp.asarray(bids),
                  jnp.asarray(bmask))
    out_f32 = step(params, jnp.asarray(f32), jnp.asarray(bids),
                   jnp.asarray(bmask))
    np.testing.assert_allclose(np.asarray(out_u8["vtc"]),
                               np.asarray(out_f32["vtc"]),
                               rtol=2e-4, atol=2e-4)
