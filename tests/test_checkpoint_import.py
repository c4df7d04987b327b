"""Torch->flax checkpoint import: name mapping, transposes, temporal inflation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from egovlpv2_tpu.core.config import (
    FusionConfig,
    ModelConfig,
    TextEncoderConfig,
    VideoEncoderConfig,
)
from egovlpv2_tpu.models.egovlp import EgoVLPv2
from egovlpv2_tpu.train.checkpoint_import import (
    import_reference_checkpoint,
    inflate_temporal_embed,
    strip_module_prefix,
)

D = 32
CFG = ModelConfig(
    video=VideoEncoderConfig(img_size=32, patch_size=16, embed_dim=D, depth=4,
                             num_heads=2, num_frames=2),
    text=TextEncoderConfig(vocab_size=100, hidden_size=D, num_layers=4, num_heads=2,
                           intermediate_size=64, max_position_embeddings=40),
    fusion=FusionConfig(num_fuse_block=2, dim_video=D, dim_text=D, hidden_size=D),
    projection_dim=16,
    remat=False,
)


def fake_reference_state_dict(rs):
    """Torch-layout EgoVLPv2 state_dict names for the tiny config."""
    sd = {}

    def lin(prefix, din, dout, bias=True):
        sd[prefix + ".weight"] = rs.randn(dout, din).astype(np.float32)
        if bias:
            sd[prefix + ".bias"] = rs.randn(dout).astype(np.float32)

    def ln(prefix, d):
        sd[prefix + ".weight"] = rs.randn(d).astype(np.float32)
        sd[prefix + ".bias"] = rs.randn(d).astype(np.float32)

    # video model
    sd["video_model.patch_embed.proj.weight"] = rs.randn(D, 3, 16, 16).astype(np.float32)
    sd["video_model.patch_embed.proj.bias"] = rs.randn(D).astype(np.float32)
    sd["video_model.cls_token"] = rs.randn(1, 1, D).astype(np.float32)
    sd["video_model.pos_embed"] = rs.randn(1, 5, D).astype(np.float32)
    sd["video_model.temporal_embed"] = rs.randn(1, 2, D).astype(np.float32)
    ln("video_model.norm", D)
    for i in range(4):
        bp = f"video_model.blocks.{i}"
        for nm in ("norm1", "norm2", "norm3"):
            ln(f"{bp}.{nm}", D)
        for att in ("attn", "timeattn"):
            lin(f"{bp}.{att}.qkv", D, 3 * D)
            lin(f"{bp}.{att}.proj", D, D)
        if i >= 2:
            lin(f"{bp}.attn.qkv_text_i2t", D, 2 * D)
            lin(f"{bp}.attn.qkv_i2t", D, D)
            lin(f"{bp}.attn.proj_i2t", D, D)
            ln(f"{bp}.attn.norm_i2t_i", D)
            sd[f"{bp}.attn.alpha_i2t"] = np.array([0.3], np.float32)
        lin(f"{bp}.mlp.fc1", D, 4 * D)  # mlp_ratio 4
        lin(f"{bp}.mlp.fc2", 4 * D, D)
    # text model
    sd["text_model.embeddings.word_embeddings.weight"] = rs.randn(100, D).astype(np.float32)
    sd["text_model.embeddings.position_embeddings.weight"] = rs.randn(40, D).astype(np.float32)
    sd["text_model.embeddings.token_type_embeddings.weight"] = rs.randn(1, D).astype(np.float32)
    ln("text_model.embeddings.LayerNorm", D)
    for i in range(4):
        lp = f"text_model.encoder.layer.{i}"
        for nm in ("query", "key", "value"):
            lin(f"{lp}.attention.self.{nm}", D, D)
        lin(f"{lp}.attention.output.dense", D, D)
        ln(f"{lp}.attention.output.LayerNorm", D)
        lin(f"{lp}.intermediate.dense", D, 64)
        lin(f"{lp}.output.dense", 64, D)
        ln(f"{lp}.output.LayerNorm", D)
        if i >= 2:
            for nm in ("query", "key", "value"):
                lin(f"{lp}.crossattention_t2i.self.{nm}", D, D)
            lin(f"{lp}.crossattention_t2i.output.dense", D, D)
            sd[f"{lp}.alpha_t2i"] = np.array([0.2], np.float32)
    # projections ('minimal' Sequential indices 0/2/4)
    lin("txt_proj.0", D, 16, bias=False)
    lin("txt_proj.2", 16, 16)
    lin("txt_proj.4", 16, 16)
    lin("vid_proj.0", D, 16, bias=False)
    lin("vid_proj.2", 16, 16)
    lin("vid_proj.4", 16, 16)
    # model-level fused components
    sd["cls_token"] = rs.randn(1, 1, D).astype(np.float32)
    ln("norm", D)
    lin("cross_modal_text_transform", D, D)
    lin("cross_modal_video_transform", D, D)
    lin("cross_modal_text_pooler.dense", D, D)
    lin("cross_modal_video_pooler.dense", D, D)
    lin("itm_score.fc", 2 * D, 2)
    lin("mlm_score.transform.dense", D, D)
    ln("mlm_score.transform.LayerNorm", D)
    sd["mlm_score.decoder.weight"] = rs.randn(100, D).astype(np.float32)
    sd["mlm_score.bias"] = rs.randn(100).astype(np.float32)
    return sd


@pytest.fixture(scope="module")
def imported():
    model = EgoVLPv2(CFG)
    video = jnp.zeros((1, 2, 32, 32, 3))
    ids = jnp.array([[0, 5, 2, 1]], jnp.int32)
    mask = (ids != 1).astype(jnp.int32)
    params = model.init(jax.random.PRNGKey(0), video, ids, mask,
                        method=model.init_all)["params"]
    rs = np.random.RandomState(7)
    sd = {("module." + k): v for k, v in fake_reference_state_dict(rs).items()}
    new_params, report = import_reference_checkpoint(sd, params, num_frames=2)
    return sd, new_params, report


def test_everything_imported(imported):
    sd, params, report = imported
    assert not report["skipped"], report["skipped"][:10]
    assert not report["missing_in_checkpoint"], report["missing_in_checkpoint"][:10]


def test_transposes_and_values(imported):
    sd, params, _ = imported
    sd = strip_module_prefix(sd)
    np.testing.assert_array_equal(
        params["video_model"]["blocks_0"]["attn"]["qkv"]["kernel"],
        sd["video_model.blocks.0.attn.qkv.weight"].T,
    )
    np.testing.assert_array_equal(
        params["video_model"]["patch_embed"]["kernel"],
        sd["video_model.patch_embed.proj.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_array_equal(
        params["text_model"]["layer_2"]["crossattention_t2i"]["query"]["kernel"],
        sd["text_model.encoder.layer.2.crossattention_t2i.self.query.weight"].T,
    )
    np.testing.assert_array_equal(
        params["text_model"]["embeddings"]["word_embeddings"]["embedding"],
        sd["text_model.embeddings.word_embeddings.weight"],
    )
    np.testing.assert_array_equal(
        params["mlm_score"]["decoder"]["kernel"], sd["mlm_score.decoder.weight"].T
    )
    assert float(params["video_model"]["blocks_2"]["attn"]["alpha_i2t"][0]) == np.float32(0.3)
    assert float(params["text_model"]["layer_2"]["alpha_t2i"][0]) == np.float32(0.2)


def test_imported_model_runs(imported):
    _, params, _ = imported
    model = EgoVLPv2(CFG)
    video = jnp.asarray(np.random.RandomState(0).randn(2, 2, 32, 32, 3), jnp.float32)
    ids = jnp.array([[0, 5, 6, 2], [0, 7, 2, 1]], jnp.int32)
    mask = (ids != 1).astype(jnp.int32)
    t, v = model.apply({"params": params}, video, ids, mask)
    logits = model.apply({"params": params}, video, ids, mask,
                         method=model.itm_forward)
    assert np.all(np.isfinite(np.asarray(t)))
    assert np.all(np.isfinite(np.asarray(logits)))


def test_temporal_inflation():
    emb = np.arange(8, dtype=np.float32).reshape(1, 4, 2)
    # truncate
    np.testing.assert_array_equal(inflate_temporal_embed(emb, 2), emb[:, :2])
    # zero-pad
    z = inflate_temporal_embed(emb, 6, mode="zeros")
    np.testing.assert_array_equal(z[:, :4], emb)
    assert (z[:, 4:] == 0).all()
    # bilinear: endpoints preserved, interior linear (align_corners=True)
    b = inflate_temporal_embed(emb, 7)
    np.testing.assert_allclose(b[0, 0], emb[0, 0])
    np.testing.assert_allclose(b[0, -1], emb[0, -1])
    np.testing.assert_allclose(b[0, 2], 0.5 * (emb[0, 1] + emb[0, 1]) , atol=1.0)
