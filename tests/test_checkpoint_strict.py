"""Strict checkpoint-import coverage over the COMPLETE reference key set.

Builds the published EgoVLPv2.pth's exact state_dict format by instantiating
the ACTUAL reference modules (FrozenInTime's module tree, model/model.py:46-184:
SpaceTimeTransformer + vendored RobertaModel + minimal projections + fused
cross-modal heads), with DataParallel 'module.' prefixes, and asserts
`import_reference_checkpoint(strict=True)` imports EVERY key with nothing
skipped and nothing missing — so the 2GB artifact loads first-try when egress
is available. A second test drives the EgoMCQ zero-shot CLI end-to-end from a
fabricated torch .pth in the same format.
"""

import functools
import json
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

# reuse the reference-import shims from the parity suite
from test_reference_parity import REF_DIR, _shim_timm  # noqa: E402


@pytest.fixture(scope="module")
def ref_modules():
    _shim_timm()
    from transformers import modeling_utils
    from transformers.pytorch_utils import (
        apply_chunking_to_forward,
        find_pruneable_heads_and_indices,
        prune_linear_layer,
    )

    for name, fn in [
        ("find_pruneable_heads_and_indices", find_pruneable_heads_and_indices),
        ("prune_linear_layer", prune_linear_layer),
        ("apply_chunking_to_forward", apply_chunking_to_forward),
    ]:
        if not hasattr(modeling_utils, name):
            setattr(modeling_utils, name, fn)
    cwd = os.getcwd()
    os.chdir(REF_DIR)
    sys.path.insert(0, REF_DIR)
    try:
        from model import heads, roberta
        from model import video_transformer as vt

        vt.config_yaml["use_checkpoint"] = False
        return vt, roberta, heads
    finally:
        os.chdir(cwd)


def _reference_state_dict(ref_modules, *, num_frames, img_size, patch_size,
                          embed_dim, depth, num_heads, text_cfg,
                          projection="minimal", projection_dim=4096,
                          module_prefix=True):
    """Compose FrozenInTime's state_dict exactly (model/model.py:46-184)."""
    vt, roberta_mod, heads = ref_modules
    from transformers import RobertaConfig

    tnn = torch.nn
    sd = {}

    # --- video_model: SpaceTimeTransformer with head/pre_logits/fc -> Identity
    video = vt.SpaceTimeTransformer(
        img_size=img_size, patch_size=patch_size, embed_dim=embed_dim,
        depth=depth, num_heads=num_heads, num_frames=num_frames,
        qkv_bias=True, time_init="zeros",
    )
    video.head = tnn.Identity()
    video.pre_logits = tnn.Identity()
    video.fc = tnn.Identity()  # model.py:100
    with torch.no_grad():  # non-trivial values everywhere
        for p in video.parameters():
            if p.numel():
                p.normal_(0, 0.02)
    for k, v in video.state_dict().items():
        sd[f"video_model.{k}"] = v

    # --- text_model: vendored RobertaModel (pooler is parameter-free)
    roberta_mod.NUM_FUSE_BLOCK = 6
    roberta_mod.DIM_IMG = embed_dim
    rcfg = RobertaConfig(**text_cfg)
    text = roberta_mod.RobertaModel(rcfg)
    for k, v in text.state_dict().items():
        sd[f"text_model.{k}"] = v

    hidden = text_cfg["hidden_size"]
    # --- projections (model.py:105-115 / model_epic_charades.py:118-119)
    if projection == "minimal":
        txt_proj = tnn.Sequential(
            tnn.Linear(hidden, projection_dim, bias=False), tnn.ReLU(),
            tnn.Linear(projection_dim, projection_dim), tnn.ReLU(),
            tnn.Linear(projection_dim, projection_dim),
        )
        vid_proj = tnn.Sequential(
            tnn.Linear(embed_dim, projection_dim, bias=False), tnn.ReLU(),
            tnn.Linear(projection_dim, projection_dim), tnn.ReLU(),
            tnn.Linear(projection_dim, projection_dim),
        )
    else:  # 'small' fine-tune variant
        txt_proj = tnn.Sequential(tnn.ReLU(), tnn.Linear(hidden, projection_dim))
        vid_proj = tnn.Sequential(tnn.Linear(embed_dim, projection_dim))
    for k, v in txt_proj.state_dict().items():
        sd[f"txt_proj.{k}"] = v
    for k, v in vid_proj.state_dict().items():
        sd[f"vid_proj.{k}"] = v

    if projection == "minimal":  # pretrain model: fused heads present
        # --- model-level fused components (model.py:145-177)
        sd["cls_token"] = torch.zeros(1, 1, embed_dim).normal_(0, 0.02)
        norm = tnn.LayerNorm(embed_dim, eps=1e-6)
        for k, v in norm.state_dict().items():
            sd[f"norm.{k}"] = v
        for name, mod in [
            ("cross_modal_text_transform", tnn.Linear(hidden, hidden)),
            ("cross_modal_video_transform", tnn.Linear(embed_dim, hidden)),
            ("cross_modal_text_pooler", heads.Pooler(hidden)),
            ("cross_modal_video_pooler", heads.Pooler(hidden)),
            ("itm_score", heads.ITMHead(hidden * 2)),
            ("mlm_score", heads.MLMHead(RobertaConfig(**text_cfg))),
        ]:
            for k, v in mod.state_dict().items():
                sd[f"{name}.{k}"] = v

    sd = {k: v.detach().numpy() for k, v in sd.items()}
    if module_prefix:  # the published ckpt carries DataParallel prefixes
        sd = {f"module.{k}": v for k, v in sd.items()}
    return sd


ROBERTA_BASE = dict(
    vocab_size=50265, hidden_size=768, num_hidden_layers=12,
    num_attention_heads=12, intermediate_size=3072,
    max_position_embeddings=514, type_vocab_size=1, pad_token_id=1,
    layer_norm_eps=1e-5, hidden_dropout_prob=0.1,
    attention_probs_dropout_prob=0.1,
)


def test_strict_import_full_pretrain_tree(ref_modules):
    """Every key of the published pretrain checkpoint maps; every param of
    ours is covered. Runs at FULL FrozenInTime scale (ViT-B/16 + roberta-base
    + 4096 projections) via eval_shape, so the real artifact's shapes are the
    ones exercised."""
    import jax
    import jax.numpy as jnp

    from egovlpv2_tpu.core.config import ModelConfig
    from egovlpv2_tpu.models.egovlp import EgoVLPv2
    from egovlpv2_tpu.train.checkpoint_import import import_reference_checkpoint

    sd = _reference_state_dict(
        ref_modules, num_frames=4, img_size=224, patch_size=16, embed_dim=768,
        depth=12, num_heads=12, text_cfg=ROBERTA_BASE,
    )

    cfg = ModelConfig(remat=False)
    model = EgoVLPv2(cfg)
    video = jnp.zeros((1, 4, 224, 224, 3), jnp.float32)
    ids = jnp.zeros((1, 15), jnp.int32)
    mask = jnp.ones((1, 15), jnp.int32)
    shapes = jax.eval_shape(
        functools.partial(model.init, method=model.init_all),
        jax.random.PRNGKey(0), video, ids, mask,
    )["params"]

    params, report = import_reference_checkpoint(sd, shapes, strict=True)
    assert not report["skipped"]
    assert not report["missing_in_checkpoint"]
    # spot-check value round-trips (torch [out,in] -> flax [in,out])
    got = params["video_model"]["blocks_11"]["attn"]["qkv"]["kernel"]
    want = sd["module.video_model.blocks.11.attn.qkv.weight"].T
    np.testing.assert_array_equal(np.asarray(got), want)
    got = params["text_model"]["layer_6"]["crossattention_t2i"]["key"]["kernel"]
    want = sd["module.text_model.encoder.layer.6.crossattention_t2i.self.key.weight"].T
    np.testing.assert_array_equal(np.asarray(got), want)
    got = params["mlm_score"]["bias"]
    np.testing.assert_array_equal(np.asarray(got), sd["module.mlm_score.bias"])


def test_strict_import_smallproj_tree(ref_modules):
    """The fine-tune (model_epic_charades.py) smallproj variant round-trips
    strictly too."""
    import jax
    import jax.numpy as jnp

    from egovlpv2_tpu.core.config import ModelConfig
    from egovlpv2_tpu.models.egovlp import EgoVLPv2
    from egovlpv2_tpu.train.checkpoint_import import import_reference_checkpoint

    sd = _reference_state_dict(
        ref_modules, num_frames=4, img_size=224, patch_size=16, embed_dim=768,
        depth=12, num_heads=12, text_cfg=ROBERTA_BASE,
        projection="small", projection_dim=256,
    )
    cfg = ModelConfig(projection="small", projection_dim=256,
                      with_itm_head=False, with_mlm_head=False, remat=False)
    model = EgoVLPv2(cfg)
    video = jnp.zeros((1, 4, 224, 224, 3), jnp.float32)
    ids = jnp.zeros((1, 30), jnp.int32)
    mask = jnp.ones((1, 30), jnp.int32)
    shapes = jax.eval_shape(
        functools.partial(model.init, method=model.init_all),
        jax.random.PRNGKey(0), video, ids, mask,
    )["params"]
    params, report = import_reference_checkpoint(sd, shapes, strict=True)
    assert not report["skipped"] and not report["missing_in_checkpoint"]
    got = params["vid_proj"]["fc0"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(got), sd["module.vid_proj.0.weight"].T)


def test_temporal_inflation_on_import(ref_modules):
    """Pretrain at 4 frames, import for a 16-frame eval: the temporal embed
    inflates (model.py:532-574) and strict import still covers everything."""
    import jax
    import jax.numpy as jnp

    from egovlpv2_tpu.core.config import ModelConfig, VideoEncoderConfig
    from egovlpv2_tpu.models.egovlp import EgoVLPv2
    from egovlpv2_tpu.train.checkpoint_import import import_reference_checkpoint

    sd = _reference_state_dict(
        ref_modules, num_frames=4, img_size=224, patch_size=16, embed_dim=768,
        depth=12, num_heads=12, text_cfg=ROBERTA_BASE,
    )
    cfg = ModelConfig(video=VideoEncoderConfig(num_frames=16), remat=False)
    model = EgoVLPv2(cfg)
    video = jnp.zeros((1, 16, 224, 224, 3), jnp.float32)
    ids = jnp.zeros((1, 15), jnp.int32)
    mask = jnp.ones((1, 15), jnp.int32)
    shapes = jax.eval_shape(
        functools.partial(model.init, method=model.init_all),
        jax.random.PRNGKey(0), video, ids, mask,
    )["params"]
    params, report = import_reference_checkpoint(
        sd, shapes, num_frames=16, temporal_fix="bilinear", strict=True)
    assert not report["skipped"] and not report["missing_in_checkpoint"]
    emb = np.asarray(params["video_model"]["temporal_embed"])
    assert emb.shape == (1, 16, 768)
    src = sd["module.video_model.temporal_embed"]
    np.testing.assert_allclose(emb[0, 0], src[0, 0], rtol=1e-6)
    np.testing.assert_allclose(emb[0, -1], src[0, -1], rtol=1e-6)


def test_egomcq_zero_shot_from_reference_pth(ref_modules, tmp_path):
    """End-to-end: fabricate a torch .pth in the reference's exact on-disk
    format ({'state_dict': {module.*}}), then run the EgoMCQ zero-shot CLI on
    it (the path the 2GB artifact will take)."""
    from egovlpv2_tpu import cli

    tiny_text = dict(
        vocab_size=256, hidden_size=32, num_hidden_layers=4,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=1, pad_token_id=1,
        layer_norm_eps=1e-5, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    # the vendored roberta hardcodes fused layers at index >= 12-6 (roberta.py:438)
    # and SpaceTimeTransformer at >= 6 (video_transformer.py:302), so tiny
    # trees use depth 8 with 2 fused blocks like the parity suite.
    sd = _reference_state_dict(
        ref_modules, num_frames=2, img_size=32, patch_size=16, embed_dim=32,
        depth=8, num_heads=2, text_cfg=dict(tiny_text, num_hidden_layers=8),
        projection_dim=64,
    )
    pth = tmp_path / "EgoVLPv2.pth"
    torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v))
                               for k, v in sd.items()}}, str(pth))

    config = {
        "model": {
            "video": {"img_size": 32, "patch_size": 16, "embed_dim": 32,
                      "depth": 8, "num_heads": 2, "num_frames": 2},
            "text": {"vocab_size": 256, "hidden_size": 32, "num_layers": 8,
                     "num_heads": 2, "intermediate_size": 64,
                     "max_position_embeddings": 40},
            "fusion": {"num_fuse_block": 2, "dim_video": 32, "dim_text": 32,
                       "hidden_size": 32},
            "projection_dim": 64,
            "remat": False,
        },
        "global_batch_size": 4,
        "max_text_len": 12,
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(config))
    out = tmp_path / "metrics.json"
    cli.main([
        "egomcq", "--config", str(cfg_path), "--ckpt", str(pth),
        "--batch_size", "2", "--val_batches", "1", "--out", str(out),
    ])
    metrics = json.loads(out.read_text())
    assert any(k.startswith(("vtc/", "ensemble/", "vtm/")) for k in metrics)
    assert all(np.isfinite(v) for v in metrics.values())
