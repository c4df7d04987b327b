"""Parity of the divided space-time attention against a naive loop reference.

The naive implementation below follows the reference semantics
(`EgoVLPv2/model/video_transformer.py:117-153`) literally — per-head, per
group loops in numpy — and is deliberately written with a different structure
from the vectorized [B, H, F, N, Dh] production path so that layout bugs
can't cancel out.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from egovlpv2_tpu.core.config import FusionConfig, VideoEncoderConfig
from egovlpv2_tpu.models.video import DividedAttention, SpaceTimeViT


CFG = VideoEncoderConfig(
    img_size=32, patch_size=16, embed_dim=24, depth=2, num_heads=3, num_frames=2
)
FUS = FusionConfig(num_fuse_block=1, dim_video=24, dim_text=24, hidden_size=24)
B, F, N, D, H = 2, 2, 4, 24, 3
DH = D // H
S = 1 + F * N


def softmax(x):
    x = x - x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


def naive_divided_attention(x, w_qkv, b_qkv, w_proj, b_proj, axis):
    """Literal reimplementation of VarAttention.forward (self-attn part)."""
    b, s, d = x.shape
    qkv = x @ w_qkv + b_qkv  # [B,S,3D]
    q_all, k_all, v_all = np.split(qkv, 3, axis=-1)
    scale = DH**-0.5
    out = np.zeros((b, s, d))
    for bi in range(b):
        for h in range(H):
            sl = slice(h * DH, (h + 1) * DH)
            q = q_all[bi][:, sl] * scale
            k = k_all[bi][:, sl]
            v = v_all[bi][:, sl]
            # CLS attends over everything
            out[bi, 0, sl] = softmax(q[0] @ k.T) @ v
            patches_q = q[1:].reshape(F, N, DH)
            patches_k = k[1:].reshape(F, N, DH)
            patches_v = v[1:].reshape(F, N, DH)
            if axis == "space":
                for f in range(F):
                    kk = np.concatenate([k[:1], patches_k[f]], axis=0)
                    vv = np.concatenate([v[:1], patches_v[f]], axis=0)
                    o = softmax(patches_q[f] @ kk.T) @ vv
                    out[bi, 1 + f * N : 1 + (f + 1) * N, sl] = o
            else:
                for n in range(N):
                    kk = np.concatenate([k[:1], patches_k[:, n]], axis=0)
                    vv = np.concatenate([v[:1], patches_v[:, n]], axis=0)
                    o = softmax(patches_q[:, n] @ kk.T) @ vv
                    for f in range(F):
                        out[bi, 1 + f * N + n, sl] = o[f]
    return out @ w_proj + b_proj


@pytest.mark.parametrize("axis", ["space", "time"])
def test_divided_attention_matches_naive(axis):
    mod = DividedAttention(CFG, FUS, axis=axis, fused=False, zero_init=False)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, S, D), jnp.float32)
    params = mod.init(jax.random.PRNGKey(1), x, F)
    got = np.asarray(mod.apply(params, x, F))

    p = params["params"]
    ref = naive_divided_attention(
        np.asarray(x, np.float64),
        np.asarray(p["qkv"]["kernel"], np.float64),
        np.asarray(p["qkv"]["bias"], np.float64),
        np.asarray(p["proj"]["kernel"], np.float64),
        np.asarray(p["proj"]["bias"], np.float64),
        axis,
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_i2t_fusion_gate():
    """alpha_i2t=0 => fused == unfused output; nonzero changes it."""
    mod = DividedAttention(CFG, FUS, axis="space", fused=True)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, S, D), jnp.float32)
    text = jnp.asarray(rs.randn(B, 5, D), jnp.float32)
    bias = jnp.zeros((B, 1, 1, 5))
    params = mod.init(jax.random.PRNGKey(1), x, F, text, bias)
    with_text = np.asarray(mod.apply(params, x, F, text, bias))
    without = np.asarray(mod.apply(params, x, F))
    np.testing.assert_allclose(with_text, without, atol=1e-6)

    params2 = jax.tree_util.tree_map(lambda v: v, params)
    params2["params"]["alpha_i2t"] = jnp.ones((1,))
    with_gate = np.asarray(mod.apply(params2, x, F, text, bias))
    assert np.abs(with_gate - without).max() > 1e-3


def test_pos_embed_tiling():
    """Tiled pos + repeated temporal embedding (video_transformer.py:362-368)."""
    vit = SpaceTimeViT(CFG, FUS)
    video = jnp.zeros((1, F, 32, 32, 3))
    params = vit.init(jax.random.PRNGKey(0), video)
    pos = np.asarray(params["params"]["pos_embed"])  # [1, N+1, D]
    tem = np.asarray(params["params"]["temporal_embed"])  # [1, F, D]
    got = np.asarray(vit.apply(params, F, S, method=lambda m, f, s: m.total_pos_embed(f, s)))
    ref = np.zeros((1, S, D))
    ref[0, 0] = pos[0, 0]
    for f in range(F):
        for n in range(N):
            ref[0, 1 + f * N + n] = pos[0, 1 + n] + tem[0, f]
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_zero_init_time_attention_is_noop_at_init():
    """'zeros' time-attn init: qkv=0 => softmax(0)@v with v=0 => output 0,
    so at init the time path contributes nothing (video_transformer.py:96-102)."""
    mod = DividedAttention(CFG, FUS, axis="time", zero_init=True)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, S, D), jnp.float32)
    params = mod.init(jax.random.PRNGKey(1), x, F)
    out = np.asarray(mod.apply(params, x, F))
    np.testing.assert_allclose(out, 0.0, atol=1e-7)
    # and the proj kernel is all-ones (training-dynamics trick)
    assert np.all(np.asarray(params["params"]["proj"]["kernel"]) == 1.0)


def test_dual_tower_shapes():
    vit = SpaceTimeViT(CFG, FUS)
    video = jnp.asarray(np.random.RandomState(0).randn(B, F, 32, 32, 3), jnp.float32)
    params = vit.init(jax.random.PRNGKey(0), video)
    out = vit.apply(params, video)
    assert out.shape == (B, D)


def test_patchify_uint8_device_norm_parity():
    """uint8 input + on-device imagenet normalize (patchify) must match
    host-normalized f32 input built from the same uint8 values (dataset
    device_norm=True ships 4x fewer bytes)."""
    vit = SpaceTimeViT(CFG, FUS)
    video = jnp.zeros((1, F, 32, 32, 3))
    params = vit.init(jax.random.PRNGKey(0), video)

    rs = np.random.RandomState(7)
    u8 = rs.randint(0, 256, (2, F, 32, 32, 3), np.uint8)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    f32 = (u8.astype(np.float32) / 255.0 - mean) / std

    pf = lambda m, v: m.patchify(v)
    got = np.asarray(vit.apply(params, jnp.asarray(u8), method=pf))
    ref = np.asarray(vit.apply(params, jnp.asarray(f32), method=pf))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_patchify_uint8_epic_regime_parity():
    """uint8 + uint8_norm='epic' matches the host 0-255 EPIC normalize."""
    import dataclasses

    cfg = dataclasses.replace(CFG, uint8_norm="epic")
    vit = SpaceTimeViT(cfg, FUS)
    video = jnp.zeros((1, F, 32, 32, 3))
    params = vit.init(jax.random.PRNGKey(0), video)

    rs = np.random.RandomState(11)
    u8 = rs.randint(0, 256, (2, F, 32, 32, 3), np.uint8)
    mean = np.array([123.675, 116.28, 103.53], np.float32)
    std = np.array([58.395, 57.12, 57.375], np.float32)
    f32 = (u8.astype(np.float32) - mean) / std

    pf = lambda m, v: m.patchify(v)
    got = np.asarray(vit.apply(params, jnp.asarray(u8), method=pf))
    ref = np.asarray(vit.apply(params, jnp.asarray(f32), method=pf))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
