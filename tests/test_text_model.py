"""Parity of the unfused text tower against `transformers.RobertaModel`.

The reference vendors+modifies HF RoBERTa (`EgoVLPv2/model/roberta.py`); when
no video is passed the modified layer is mathematically identical to stock HF
(dense+dropout, +residual, post-LN). So stock HF (torch, CPU) is an exact
golden reference for our unfused path.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from egovlpv2_tpu.core.config import FusionConfig, TextEncoderConfig
from egovlpv2_tpu.models.text import TextEncoder, create_position_ids

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


SMALL = dict(
    vocab_size=120,
    hidden_size=32,
    num_layers=4,
    num_heads=4,
    intermediate_size=64,
    max_position_embeddings=40,
)


def make_hf_model():
    cfg = transformers.RobertaConfig(
        vocab_size=SMALL["vocab_size"],
        hidden_size=SMALL["hidden_size"],
        num_hidden_layers=SMALL["num_layers"],
        num_attention_heads=SMALL["num_heads"],
        intermediate_size=SMALL["intermediate_size"],
        max_position_embeddings=SMALL["max_position_embeddings"],
        pad_token_id=1,
        type_vocab_size=1,
        layer_norm_eps=1e-5,
    )
    torch.manual_seed(0)
    model = transformers.RobertaModel(cfg, add_pooling_layer=False)
    model.eval()
    return model


def hf_to_flax(model, num_fuse_block=2):
    """Map HF torch weights into our param tree (unfused submodules only)."""
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    p = {
        "embeddings": {
            "word_embeddings": {"embedding": sd["embeddings.word_embeddings.weight"]},
            "position_embeddings": {
                "embedding": sd["embeddings.position_embeddings.weight"]
            },
            "token_type_embeddings": {
                "embedding": sd["embeddings.token_type_embeddings.weight"]
            },
            "LayerNorm": {
                "scale": sd["embeddings.LayerNorm.weight"],
                "bias": sd["embeddings.LayerNorm.bias"],
            },
        }
    }

    def dense(prefix):
        return {"kernel": sd[prefix + ".weight"].T, "bias": sd[prefix + ".bias"]}

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    for i in range(SMALL["num_layers"]):
        hp = f"encoder.layer.{i}"
        layer = {
            "attention": {
                "query": dense(f"{hp}.attention.self.query"),
                "key": dense(f"{hp}.attention.self.key"),
                "value": dense(f"{hp}.attention.self.value"),
                "out_dense": dense(f"{hp}.attention.output.dense"),
            },
            "attention_LayerNorm": ln(f"{hp}.attention.output.LayerNorm"),
            "intermediate": dense(f"{hp}.intermediate.dense"),
            "output": dense(f"{hp}.output.dense"),
            "output_LayerNorm": ln(f"{hp}.output.LayerNorm"),
        }
        p[f"layer_{i}"] = layer
    return p


def overlay(dst, src):
    """Recursively copy src leaves into dst (dst keeps keys absent in src)."""
    for k, v in src.items():
        if isinstance(v, dict):
            overlay(dst[k], v)
        else:
            dst[k] = jnp.asarray(v)


@pytest.fixture(scope="module")
def setup():
    hf = make_hf_model()
    cfg = TextEncoderConfig(
        vocab_size=SMALL["vocab_size"],
        hidden_size=SMALL["hidden_size"],
        num_layers=SMALL["num_layers"],
        num_heads=SMALL["num_heads"],
        intermediate_size=SMALL["intermediate_size"],
        max_position_embeddings=SMALL["max_position_embeddings"],
    )
    enc = TextEncoder(cfg, FusionConfig(num_fuse_block=2, dim_video=32))
    ids = jnp.array(
        [[0, 9, 17, 23, 2, 1, 1, 1], [0, 55, 44, 33, 22, 11, 2, 1]], dtype=jnp.int32
    )
    mask = (ids != 1).astype(jnp.int32)

    def init_all(m):
        """Touch fused params too (dual init skips crossattention_t2i)."""
        from egovlpv2_tpu.ops.attention import make_additive_mask

        bias = make_additive_mask(mask)
        h = m.embed(ids)
        h = m.run_layers(h, bias, start=0, end=2)
        return m.run_layers(h, bias, start=2, video=jnp.zeros((2, 5, 32)))

    params = enc.init(jax.random.PRNGKey(0), method=init_all)
    params = jax.tree_util.tree_map(lambda x: x, params)  # unfreeze-safe copy
    overlay(params["params"], hf_to_flax(hf))
    return hf, enc, params, ids, mask


def test_position_ids():
    ids = jnp.array([[0, 5, 6, 2, 1, 1]])
    got = create_position_ids(ids, padding_idx=1)
    # HF: cumsum(mask)*mask + pad: [2,3,4,5,1,1]
    np.testing.assert_array_equal(np.asarray(got), [[2, 3, 4, 5, 1, 1]])


def test_unfused_parity(setup):
    hf, enc, params, ids, mask = setup
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(np.asarray(ids)),
            attention_mask=torch.tensor(np.asarray(mask)),
        ).last_hidden_state.numpy()
    got = np.asarray(enc.apply(params, ids, mask))
    # padding positions differ in masked layers' influence only through
    # attention (masked out) — compare valid positions exactly.
    valid = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(got[valid], ref[valid], rtol=2e-5, atol=2e-5)


def test_fusion_gate_zero_is_identity(setup):
    """alpha_t2i == 0 => fused layers reduce to the stock text tower."""
    _, enc, params, ids, mask = setup
    video = jnp.asarray(np.random.RandomState(0).randn(2, 5, 32), jnp.float32)

    def fused(ids, mask, video):
        from egovlpv2_tpu.ops.attention import make_additive_mask

        def run(m):
            bias = make_additive_mask(mask)
            h = m.embed(ids)
            h = m.run_layers(h, bias, start=0, end=2)
            return m.run_layers(h, bias, start=2, video=video)

        return enc.apply(params, method=run)

    got = np.asarray(fused(ids, mask, video))
    ref = np.asarray(enc.apply(params, ids, mask))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_fusion_gate_nonzero_changes_output(setup):
    _, enc, params, ids, mask = setup
    import copy

    params2 = jax.tree_util.tree_map(lambda x: x, params)
    for i in range(2, SMALL["num_layers"]):
        params2["params"][f"layer_{i}"]["alpha_t2i"] = jnp.ones((1,))
    video = jnp.asarray(np.random.RandomState(0).randn(2, 5, 32), jnp.float32)
    from egovlpv2_tpu.ops.attention import make_additive_mask

    def run(m):
        bias = make_additive_mask(mask)
        h = m.embed(ids)
        h = m.run_layers(h, bias, start=0, end=2)
        return m.run_layers(h, bias, start=2, video=video)

    got = np.asarray(enc.apply(params2, method=run))
    ref = np.asarray(enc.apply(params, ids, mask))
    assert np.abs(got - ref).max() > 1e-3
