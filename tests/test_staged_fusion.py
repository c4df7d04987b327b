"""Staged fused execution == one-shot fused_encode; QFVS extractor shapes."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from egovlpv2_tpu.core.config import (
    FusionConfig, ModelConfig, TextEncoderConfig, VideoEncoderConfig,
)
from egovlpv2_tpu.models.egovlp import EgoVLPv2

CFG = ModelConfig(
    video=VideoEncoderConfig(img_size=32, patch_size=16, embed_dim=32, depth=4,
                             num_heads=2, num_frames=5),
    text=TextEncoderConfig(vocab_size=120, hidden_size=32, num_layers=4,
                           num_heads=2, intermediate_size=64,
                           max_position_embeddings=40),
    fusion=FusionConfig(num_fuse_block=2, dim_video=32, dim_text=32,
                        hidden_size=32),
    projection_dim=16,
    remat=False,
)


@pytest.fixture(scope="module")
def setup():
    model = EgoVLPv2(CFG)
    rs = np.random.RandomState(0)
    video = jnp.asarray(rs.randn(2, 5, 32, 32, 3), jnp.float32)
    ids = jnp.asarray([[0, 5, 6, 2, 1, 1], [0, 7, 8, 9, 2, 1]], jnp.int32)
    mask = (ids != 1).astype(jnp.int32)
    params = model.init(jax.random.PRNGKey(0), video, ids, mask,
                        method=model.init_all)["params"]
    return model, params, video, ids, mask


def test_staged_equals_fused(setup):
    model, params, video, ids, mask = setup
    v_cls, t = model.apply({"params": params}, video, ids, mask,
                           method=model.fused_encode)
    v_un = model.apply({"params": params}, video, method=model.video_unfused)
    t_un = model.apply({"params": params}, ids, mask, method=model.text_unfused)
    v_cls2, t2 = model.apply({"params": params}, v_un, t_un, mask, 5,
                             method=model.fuse_from_unfused)
    np.testing.assert_allclose(np.asarray(v_cls), np.asarray(v_cls2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t2), atol=1e-6)


def test_qfvs_extractor_pipeline(setup):
    from egovlpv2_tpu.tasks.qfvs_extract import QFVSExtractor

    model, params, video, ids, mask = setup

    class FakeTok:
        def __call__(self, texts):
            n = len(texts)
            ids = np.full((n, 6), 1, np.int32)
            ids[:, 0] = 0
            for i, t in enumerate(texts):
                ids[i, 1 : 1 + min(len(t) % 3 + 1, 4)] = 5 + i
            ids[:, -1] = 2
            return {"text_ids": ids, "text_mask": (ids != 1).astype(np.int32)}

    ex = QFVSExtractor(model, params, inner_batch=4)
    rs = np.random.RandomState(1)
    frames = rs.rand(23, 32, 32, 3).astype(np.float32)  # 23 frames -> 5 clips
    out = ex.extract_video(frames, FakeTok(), ["dog", "car"],
                           oracle_prompt="dog car", max_segments=3)
    assert out["num_shots"] == 5
    assert set(out["features"]) == {"dog", "car", "dog car"}
    for f in out["features"].values():
        assert f.shape == (5, CFG.fusion.hidden_size)
        assert np.isfinite(f).all()
    assert (np.diff(out["change_points"]) > 0).all() if len(
        out["change_points"]) > 1 else True


def test_shared_unfused_video_equals_full_paths(setup):
    """mlm/itm_forward_from_video == the full fused forwards (shared pass)."""
    model, params, video, ids, mask = setup
    v_un = model.apply({"params": params}, video, method=model.video_unfused)

    mlm_full = model.apply({"params": params}, video, ids, mask,
                           method=model.mlm_forward)
    mlm_shared = model.apply({"params": params}, v_un, ids, mask,
                             method=model.mlm_forward_from_video)
    np.testing.assert_allclose(np.asarray(mlm_shared), np.asarray(mlm_full),
                               atol=1e-5)

    itm_full = model.apply({"params": params}, video, ids, mask,
                           method=model.itm_forward)
    itm_shared = model.apply({"params": params}, v_un, ids, mask,
                             method=model.itm_forward_from_video)
    np.testing.assert_allclose(np.asarray(itm_shared), np.asarray(itm_full),
                               atol=1e-5)
    # gathered variant: permuting examples = permuting outputs
    perm = jnp.asarray([1, 0])
    itm_perm = model.apply({"params": params}, v_un[perm], ids[perm],
                           mask[perm], method=model.itm_forward_from_video)
    np.testing.assert_allclose(np.asarray(itm_perm), np.asarray(itm_full)[[1, 0]],
                               atol=1e-5)


def test_merged_mlm_itm_equals_separate(setup):
    model, params, video, ids, mask = setup
    v_un = model.apply({"params": params}, video, method=model.video_unfused)
    perm = jnp.asarray([1, 0])
    mlm_sep = model.apply({"params": params}, v_un, ids, mask,
                          method=model.mlm_forward_from_video)
    itm_sep = model.apply({"params": params}, v_un[perm], ids[perm], mask[perm],
                          method=model.itm_forward_from_video)
    mlm_m, itm_m = model.apply(
        {"params": params}, v_un, ids, mask, v_un[perm], ids[perm], mask[perm],
        method=model.mlm_itm_forward_from_video,
    )
    np.testing.assert_allclose(np.asarray(mlm_m), np.asarray(mlm_sep), atol=1e-5)
    np.testing.assert_allclose(np.asarray(itm_m), np.asarray(itm_sep), atol=1e-5)
