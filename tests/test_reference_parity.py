"""Activation parity against the ACTUAL reference implementation.

Imports the reference `video_transformer.py` (PyTorch, read-only mount at
/root/reference) with a minimal timm shim, loads identical weights into our
flax modules via the checkpoint importer's mapping, and compares activations.
This is the strongest parity evidence available without the published 2GB
checkpoint: the exact reference forward code vs ours on the same numbers.

The reference hardcodes fused blocks at indices >= 6 and text width 768
(video_transformer.py:33,302), so the test model uses depth 8 with 2 fused
blocks and a 768-wide text stream.
"""

import os
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

REF_DIR = "/root/reference/EgoVLPv2"


def _shim_timm():
    if "timm" in sys.modules:
        return
    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    class DropPath(torch.nn.Module):
        def __init__(self, p=0.0):
            super().__init__()
            self.p = p

        def forward(self, x):  # eval-mode identity (p=0 in these tests)
            return x

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, std=1.0, **kw):
        with torch.no_grad():
            tensor.normal_(0, std).clamp_(-2 * std, 2 * std)
        return tensor

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    models.layers = layers
    timm.models = models
    # give the shims real specs — transformers probes importlib.util.find_spec
    import importlib.machinery

    for name, mod in (("timm", timm), ("timm.models", models),
                      ("timm.models.layers", layers)):
        mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
        sys.modules[name] = mod


@pytest.fixture(scope="module")
def ref_vt():
    """Import the reference video_transformer with cwd at the YAML."""
    _shim_timm()
    cwd = os.getcwd()
    os.chdir(REF_DIR)
    sys.path.insert(0, REF_DIR)
    try:
        import importlib

        from model import video_transformer as vt

        importlib.reload(vt)
        # run without torch gradient checkpointing (inference parity)
        vt.config_yaml["use_checkpoint"] = False
        return vt
    finally:
        os.chdir(cwd)
        # NOTE: keep REF_DIR on sys.path — the cached `model` package needs
        # it for sibling submodule imports in later fixtures.


D, HEADS, DEPTH, F, IMG, PATCH = 48, 6, 8, 2, 32, 16
N = (IMG // PATCH) ** 2
TEXT_DIM = 768  # hardcoded DIM_TEXT in the reference


def build_pair(ref_vt):
    import jax
    import jax.numpy as jnp

    from egovlpv2_tpu.core.config import FusionConfig, VideoEncoderConfig
    from egovlpv2_tpu.models.video import SpaceTimeViT
    from egovlpv2_tpu.train.checkpoint_import import map_video_model

    torch.manual_seed(0)
    ref = ref_vt.SpaceTimeTransformer(
        img_size=IMG, patch_size=PATCH, embed_dim=D, depth=DEPTH,
        num_heads=HEADS, num_frames=F, qkv_bias=True, time_init="zeros",
    )
    ref.eval()
    # randomize the zero-init time attention so parity is non-trivial
    with torch.no_grad():
        for blk in ref.blocks:
            for p in blk.timeattn.parameters():
                p.normal_(0, 0.02)
        ref.temporal_embed.normal_(0, 0.02)

    cfg = VideoEncoderConfig(img_size=IMG, patch_size=PATCH, embed_dim=D,
                             depth=DEPTH, num_heads=HEADS, num_frames=F)
    fusion = FusionConfig(num_fuse_block=DEPTH - 6, dim_video=D,
                          dim_text=TEXT_DIM)
    vit = SpaceTimeViT(cfg, fusion)
    rs = np.random.RandomState(0)
    video = rs.randn(2, F, IMG, IMG, 3).astype(np.float32)

    def init_all(m):
        # touch the fused i2t params too (dual init passes text=None)
        x = m.embed(jnp.asarray(video))
        x = m.run_blocks(x, F, text=jnp.zeros((2, 7, TEXT_DIM)),
                         text_bias=jnp.zeros((2, 1, 1, 7)))
        return m.finalize(x)

    params = vit.init(jax.random.PRNGKey(0), method=init_all)["params"]

    sd = {"video_model." + k: v.detach().numpy()
          for k, v in ref.state_dict().items()}
    mapped = map_video_model(sd, depth=DEPTH, num_unfused=6)
    from flax import traverse_util

    flat_p = traverse_util.flatten_dict(params)
    flat_m = traverse_util.flatten_dict(mapped)
    for k in flat_p:
        assert k in flat_m, f"missing mapped weight {'.'.join(k)}"
        flat_p[k] = jnp.asarray(np.asarray(flat_m[k]).reshape(flat_p[k].shape))
    params = traverse_util.unflatten_dict(flat_p)
    return ref, vit, params, video


def test_dual_tower_matches_reference(ref_vt):
    import jax.numpy as jnp

    ref, vit, params, video = build_pair(ref_vt)
    with torch.no_grad():
        ref_out = ref.forward_features(
            torch.from_numpy(video.transpose(0, 1, 4, 2, 3))
        ).numpy()
    got = np.asarray(vit.apply({"params": params}, jnp.asarray(video)))
    np.testing.assert_allclose(got, ref_out, rtol=2e-4, atol=2e-4)


def test_fused_block_matches_reference(ref_vt):
    import jax.numpy as jnp

    ref, vit, params, video = build_pair(ref_vt)
    rs = np.random.RandomState(1)
    x = rs.randn(2, 1 + F * N, D).astype(np.float32)
    text = rs.randn(2, 7, TEXT_DIM).astype(np.float32)
    mask_bias = np.zeros((2, 1, 1, 7), np.float32)
    mask_bias[:, :, :, 5:] = -10000.0

    blk = ref.blocks[6]  # first fused block
    with torch.no_grad():
        # make the zero-init gate non-trivial
        blk.attn.alpha_i2t.fill_(0.7)
        ref_out = blk(
            torch.from_numpy(x), "b (f n) d", "(b f) n d", "b (f n) d",
            "(b n) f d", time_n=N, space_f=F,
            y=torch.from_numpy(text), y_mask=torch.from_numpy(mask_bias),
        ).numpy()

    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    flat[("blocks_6", "attn", "alpha_i2t")] = jnp.asarray([0.7])
    params = traverse_util.unflatten_dict(flat)

    def run(m):
        return m.run_block(jnp.asarray(x), 6, F, text=jnp.asarray(text),
                           text_bias=jnp.asarray(mask_bias))

    got = np.asarray(vit.apply({"params": params}, method=run))
    np.testing.assert_allclose(got, ref_out, rtol=2e-4, atol=2e-4)


def test_pos_embed_total_matches_reference(ref_vt):
    import jax.numpy as jnp

    ref, vit, params, video = build_pair(ref_vt)
    with torch.no_grad():
        cls_embed = ref.pos_embed[:, 0, :].unsqueeze(1)
        tile_pos = ref.pos_embed[:, 1:, :].repeat(1, ref.num_frames, 1)
        tile_temporal = ref.temporal_embed.repeat_interleave(
            ref.patches_per_frame, 1)
        ref_total = torch.cat(
            [cls_embed, tile_pos + tile_temporal], dim=1).numpy()
    got = np.asarray(vit.apply(
        {"params": params}, F, 1 + F * N,
        method=lambda m, f, s: m.total_pos_embed(f, s)))
    np.testing.assert_allclose(got, ref_total, atol=1e-6)


@pytest.fixture(scope="module")
def ref_roberta():
    """Import the reference vendored roberta with moved-internals shims."""
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
        from model import roberta

        return roberta
    finally:
        os.chdir(cwd)


def test_fused_text_layer_matches_reference(ref_roberta):
    """Gated t2i cross-attention + restructured post-LN (roberta.py:430-505)."""
    import jax
    import jax.numpy as jnp
    from transformers import RobertaConfig

    from egovlpv2_tpu.core.config import FusionConfig, TextEncoderConfig
    from egovlpv2_tpu.models.text import TextLayer

    HS, VDIM = 48, 40
    ref_roberta.DIM_IMG = VDIM
    cfg = RobertaConfig(
        vocab_size=100, hidden_size=HS, num_hidden_layers=8,
        num_attention_heads=6, intermediate_size=96,
        max_position_embeddings=40, pad_token_id=1, type_vocab_size=1,
        layer_norm_eps=1e-5, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(1)
    ref_layer = ref_roberta.RobertaLayer(cfg, layer_index=7)
    ref_layer.eval()
    with torch.no_grad():
        ref_layer.alpha_t2i.fill_(0.6)

    rs = np.random.RandomState(2)
    hidden = rs.randn(2, 9, HS).astype(np.float32)
    video = rs.randn(2, 11, VDIM).astype(np.float32)
    mask_bias = np.zeros((2, 1, 1, 9), np.float32)
    mask_bias[:, :, :, 7:] = -10000.0

    with torch.no_grad():
        ref_out = ref_layer(
            torch.from_numpy(hidden), torch.from_numpy(mask_bias),
            encoder_hidden_states=torch.from_numpy(video), last_norm=True,
        )[0].numpy()
        # also exercise the last_norm=False skip
        ref_out_noln = ref_layer(
            torch.from_numpy(hidden), torch.from_numpy(mask_bias),
            encoder_hidden_states=torch.from_numpy(video), last_norm=False,
        )[0].numpy()

    tcfg = TextEncoderConfig(hidden_size=HS, num_heads=6, intermediate_size=96,
                             hidden_dropout=0.0, attn_dropout=0.0)
    fus = FusionConfig(dim_video=VDIM, dim_text=HS)
    mine = TextLayer(tcfg, fus, fused=True)
    params = mine.init(jax.random.PRNGKey(0), jnp.asarray(hidden),
                       jnp.asarray(mask_bias), jnp.asarray(video))

    sd = {k: v.detach().numpy() for k, v in ref_layer.state_dict().items()}

    def dense(prefix):
        return {"kernel": sd[prefix + ".weight"].T, "bias": sd[prefix + ".bias"]}

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    p = {
        "attention": {
            "query": dense("attention.self.query"),
            "key": dense("attention.self.key"),
            "value": dense("attention.self.value"),
            "out_dense": dense("attention.output.dense"),
        },
        "crossattention_t2i": {
            "query": dense("crossattention_t2i.self.query"),
            "key": dense("crossattention_t2i.self.key"),
            "value": dense("crossattention_t2i.self.value"),
            "out_dense": dense("crossattention_t2i.output.dense"),
        },
        "alpha_t2i": sd["alpha_t2i"],
        "attention_LayerNorm": ln("attention.output.LayerNorm"),
        "intermediate": dense("intermediate.dense"),
        "output": dense("output.dense"),
        "output_LayerNorm": ln("output.LayerNorm"),
    }
    import jax.tree_util as jtu

    params = {"params": jtu.tree_map(jnp.asarray, p)}
    got = np.asarray(mine.apply(params, jnp.asarray(hidden),
                                jnp.asarray(mask_bias), jnp.asarray(video),
                                True))
    np.testing.assert_allclose(got, ref_out, rtol=2e-4, atol=2e-4)
    got_noln = np.asarray(mine.apply(params, jnp.asarray(hidden),
                                     jnp.asarray(mask_bias), jnp.asarray(video),
                                     False))
    np.testing.assert_allclose(got_noln, ref_out_noln, rtol=2e-4, atol=2e-4)


def test_lockstep_fused_stack_matches_reference(ref_vt, ref_roberta):
    """The 2-block lockstep exchange (model.py:259-271): text attends to the
    PRE-update video tokens, then video advances — verified against the
    reference video blocks + reference roberta layers composed exactly as
    the reference training code composes them."""
    import jax
    import jax.numpy as jnp
    from flax import traverse_util
    from transformers import RobertaConfig

    from egovlpv2_tpu.core.config import (
        FusionConfig, ModelConfig, TextEncoderConfig, VideoEncoderConfig,
    )
    from egovlpv2_tpu.models.egovlp import EgoVLPv2
    from egovlpv2_tpu.train.checkpoint_import import map_text_model, map_video_model

    HS = TEXT_DIM  # text width must be 768 (reference DIM_TEXT hardcode)
    torch.manual_seed(3)
    ref_video = ref_vt.SpaceTimeTransformer(
        img_size=IMG, patch_size=PATCH, embed_dim=D, depth=DEPTH,
        num_heads=HEADS, num_frames=F, qkv_bias=True, time_init="zeros",
    )
    ref_video.eval()
    with torch.no_grad():
        for blk in ref_video.blocks:
            for p in blk.timeattn.parameters():
                p.normal_(0, 0.02)
        for i in (6, 7):
            ref_video.blocks[i].attn.alpha_i2t.fill_(0.5)

    ref_roberta.DIM_IMG = D
    rcfg = RobertaConfig(
        vocab_size=100, hidden_size=HS, num_hidden_layers=DEPTH,
        num_attention_heads=HEADS, intermediate_size=2 * HS,
        max_position_embeddings=40, pad_token_id=1, type_vocab_size=1,
        layer_norm_eps=1e-5, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    ref_layers = []
    for i in (6, 7):
        layer = ref_roberta.RobertaLayer(rcfg, layer_index=i)
        layer.eval()
        with torch.no_grad():
            layer.alpha_t2i.fill_(0.3)
        ref_layers.append(layer)
    ln_g = torch.randn(D)
    ln_b = torch.randn(D)

    rs = np.random.RandomState(4)
    v0 = rs.randn(2, 1 + F * N, D).astype(np.float32)
    t0 = rs.randn(2, 7, HS).astype(np.float32)
    mask = np.ones((2, 7), np.int32)
    mask[:, 5:] = 0
    bias = (1.0 - mask.astype(np.float32))[:, None, None, :] * -1e9

    # reference composition (model.py:259-271)
    with torch.no_grad():
        v = torch.from_numpy(v0)
        t = torch.from_numpy(t0)
        tb = torch.from_numpy(bias)
        for j, i in enumerate((6, 7)):
            fuse_v = ref_video.blocks[i](
                v, "b (f n) d", "(b f) n d", "b (f n) d", "(b n) f d",
                time_n=N, space_f=F, y=t, y_mask=tb,
            )
            t = ref_layers[j](t, tb, encoder_hidden_states=v, last_norm=True)[0]
            v = fuse_v
        ref_v_cls = torch.nn.functional.layer_norm(
            v, (D,), ln_g, ln_b, eps=1e-6)[:, 0].numpy()
        ref_t = t.numpy()

    # our model
    mcfg = ModelConfig(
        video=VideoEncoderConfig(img_size=IMG, patch_size=PATCH, embed_dim=D,
                                 depth=DEPTH, num_heads=HEADS, num_frames=F),
        text=TextEncoderConfig(vocab_size=100, hidden_size=HS, num_layers=DEPTH,
                               num_heads=HEADS, intermediate_size=2 * HS,
                               max_position_embeddings=40, hidden_dropout=0.0,
                               attn_dropout=0.0),
        fusion=FusionConfig(num_fuse_block=2, dim_video=D, dim_text=HS,
                            hidden_size=D),
        projection="",
        remat=False,
    )
    model = EgoVLPv2(mcfg)
    video = jnp.asarray(rs.randn(2, F, IMG, IMG, 3), jnp.float32)
    ids = jnp.asarray([[0, 5, 6, 2, 1, 1, 1]], jnp.int32).repeat(2, 0)
    params = model.init(jax.random.PRNGKey(0), video, ids,
                        jnp.asarray(mask), method=model.init_all)["params"]

    sd = {"video_model." + k: v_.detach().numpy()
          for k, v_ in ref_video.state_dict().items()}
    for j, i in enumerate((6, 7)):
        for k, v_ in ref_layers[j].state_dict().items():
            sd[f"text_model.encoder.layer.{i}." + k] = v_.detach().numpy()
    mapped = {}
    mapped["video_model"] = map_video_model(sd, depth=DEPTH, num_unfused=6)
    # only the fused text layers are exercised by fuse_from_unfused
    flat_p = traverse_util.flatten_dict(params)
    for path, leaf in traverse_util.flatten_dict(mapped).items():
        if path in flat_p:
            flat_p[path] = jnp.asarray(
                np.asarray(leaf).reshape(flat_p[path].shape))
    from egovlpv2_tpu.train.checkpoint_import import _dense, _ln

    for j, i in enumerate((6, 7)):
        lp = f"text_model.encoder.layer.{i}"
        layer_map = {
            ("text_model", f"layer_{i}", "attention", "query"): _dense(sd, lp + ".attention.self.query"),
            ("text_model", f"layer_{i}", "attention", "key"): _dense(sd, lp + ".attention.self.key"),
            ("text_model", f"layer_{i}", "attention", "value"): _dense(sd, lp + ".attention.self.value"),
            ("text_model", f"layer_{i}", "attention", "out_dense"): _dense(sd, lp + ".attention.output.dense"),
            ("text_model", f"layer_{i}", "crossattention_t2i", "query"): _dense(sd, lp + ".crossattention_t2i.self.query"),
            ("text_model", f"layer_{i}", "crossattention_t2i", "key"): _dense(sd, lp + ".crossattention_t2i.self.key"),
            ("text_model", f"layer_{i}", "crossattention_t2i", "value"): _dense(sd, lp + ".crossattention_t2i.self.value"),
            ("text_model", f"layer_{i}", "crossattention_t2i", "out_dense"): _dense(sd, lp + ".crossattention_t2i.output.dense"),
            ("text_model", f"layer_{i}", "attention_LayerNorm"): _ln(sd, lp + ".attention.output.LayerNorm"),
            ("text_model", f"layer_{i}", "intermediate"): _dense(sd, lp + ".intermediate.dense"),
            ("text_model", f"layer_{i}", "output"): _dense(sd, lp + ".output.dense"),
            ("text_model", f"layer_{i}", "output_LayerNorm"): _ln(sd, lp + ".output.LayerNorm"),
        }
        for prefix, tree in layer_map.items():
            for leaf_path, leaf in traverse_util.flatten_dict({(): tree} if not isinstance(tree, dict) else tree).items():
                flat_p[prefix + leaf_path] = jnp.asarray(np.asarray(leaf))
        flat_p[("text_model", f"layer_{i}", "alpha_t2i")] = jnp.asarray([0.3])
    flat_p[("norm", "scale")] = jnp.asarray(ln_g.numpy())
    flat_p[("norm", "bias")] = jnp.asarray(ln_b.numpy())
    params = traverse_util.unflatten_dict(flat_p)

    v_cls, t_out = model.apply(
        {"params": params}, jnp.asarray(v0), jnp.asarray(t0),
        jnp.asarray(mask), F, method=model.fuse_from_unfused,
    )
    np.testing.assert_allclose(np.asarray(t_out), ref_t, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(v_cls), ref_v_cls, rtol=3e-4,
                               atol=3e-4)
