"""Downstream training runners: one step each runs and decreases loss."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from egovlpv2_tpu.downstream import qfvs, runners, vsgn, vslnet
from egovlpv2_tpu.downstream.datasets import nlq_highlight_labels
from egovlpv2_tpu.train.step import TrainState


def test_vsgn_runner_step():
    model = vsgn.VSGN(input_feat_dim=16, hidden_dim=64, num_levels=3,
                      temporal_scale=32, anchor_scales=(1.0, 10.0),
                      num_classes=4, use_vss=False)
    tx, anchors, step, loss_fn = runners.make_vsgn_train_step(
        model, steps_per_epoch=10)
    rs = np.random.RandomState(0)
    batch = {
        "video": jnp.asarray(rs.randn(2, 32, 16), jnp.float32),
        "num_frms": jnp.asarray([32, 20]),
        "gt_bbox": jnp.asarray(rs.rand(2, 5, 3), jnp.float32)
        .at[..., 2].set(1.0),
        "num_gt": jnp.asarray([2, 1]),
        "gt_action": jnp.asarray((rs.rand(2, 32) > 0.7).astype(np.float32)),
        "gt_start": jnp.asarray(rs.rand(2, 32), jnp.float32),
        "gt_end": jnp.asarray(rs.rand(2, 32), jnp.float32),
    }
    state = runners.init_head_state(
        model, tx, (batch["video"], batch["num_frms"]))
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss_total"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_vslnet_runner_step():
    model = vslnet.VSLNet(dim=32, num_heads=4, max_pos_len=16,
                          video_feature_dim=24, query_feature_dim=20)
    make_tx, make_step, predict = runners.make_vslnet_train_step(
        model, num_train_steps=100)
    rs = np.random.RandomState(1)
    s_ind = np.asarray([2, 4])
    e_ind = np.asarray([8, 12])
    batch = {
        "video_features": jnp.asarray(rs.randn(2, 16, 24), jnp.float32),
        "v_mask": jnp.asarray([[1] * 16, [1] * 14 + [0] * 2]),
        "query_features": jnp.asarray(rs.randn(2, 6, 20), jnp.float32),
        "q_mask": jnp.ones((2, 6), jnp.int32),
        "s_ind": jnp.asarray(s_ind),
        "e_ind": jnp.asarray(e_ind),
        "h_labels": jnp.asarray(nlq_highlight_labels(s_ind, e_ind, 16)),
    }
    params = model.init(jax.random.PRNGKey(0), batch["video_features"],
                        batch["v_mask"], batch["query_features"],
                        batch["q_mask"])["params"]
    tx = make_tx(params)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32),
                       jax.random.PRNGKey(1))
    step = make_step(tx)
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss_total"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    starts, ends = predict(state.params, batch["video_features"],
                           batch["v_mask"], batch["query_features"],
                           batch["q_mask"])
    assert starts.shape == (2, 5)


def test_qfvs_runner_step():
    model = qfvs.SummaryScorer(d_model=16, nhead=2, num_layers=1)
    tx, step, score = runners.make_qfvs_train_step(model, total_steps=50)
    rs = np.random.RandomState(2)
    seg_len = jnp.asarray([[5, 3], [4, 4]])
    mask = (jnp.arange(5)[None, None, :] < seg_len[:, :, None]).astype(jnp.float32)
    batch = {
        "seg_len": seg_len,
        "mask": mask,
        "feat_concept1": jnp.asarray(rs.randn(2, 2, 5, 16), jnp.float32),
        "feat_concept2": jnp.asarray(rs.randn(2, 2, 5, 16), jnp.float32),
        "feat_oracle": jnp.asarray(rs.randn(2, 2, 5, 16), jnp.float32),
        "concept1_GT": jnp.asarray((rs.rand(2, 2, 5) > 0.5).astype(np.float32)),
        "concept2_GT": jnp.asarray((rs.rand(2, 2, 5) > 0.5).astype(np.float32)),
        "oracle_GT": jnp.asarray((rs.rand(2, 2, 5) > 0.5).astype(np.float32)),
    }
    state = runners.init_head_state(
        model, tx, (batch["feat_concept1"], batch["seg_len"]))
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss_total"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    s = score(state.params, batch["feat_concept1"], batch["seg_len"])
    assert s.shape == (2, 2, 5)


def test_mq_feature_dataset_labels(tmp_path):
    import json
    from egovlpv2_tpu.downstream.datasets import EgoMQFeatureDataset

    rs = np.random.RandomState(3)
    np.save(tmp_path / "clipA.npy", rs.randn(50, 8).astype(np.float32))
    anno = {
        "clipA": {
            "subset": "train",
            "clip_id": "clipA",
            "parent_start_sec": 0.0,
            "parent_end_sec": 25.0,  # fps = 2
            "annotations": [
                {"start_time": 1.0, "end_time": 5.0, "label": "cook"},
                {"start_time": 10.0, "end_time": 12.0, "label": "clean"},
            ],
        }
    }
    anno_path = tmp_path / "anno.json"
    anno_path.write_text(json.dumps(anno))
    ds = EgoMQFeatureDataset(str(anno_path), str(tmp_path), subset="train",
                             temporal_scale=64, input_feat_dim=8)
    item = ds[0]
    assert item["video"].shape == (64, 8)
    assert int(item["num_frms"]) == 50
    assert int(item["num_gt"]) == 2
    # fps=2: first gt covers feature frames 2..10 -> normalized /64
    np.testing.assert_allclose(item["gt_bbox"][0, :2], [2 / 64, 10 / 64],
                               atol=1e-6)
    assert item["gt_action"].sum() > 0
    assert item["gt_start"].max() > 0.99  # IOA peaks at the boundary


def test_mq_inference_proposals():
    from egovlpv2_tpu.downstream import mq_infer

    # NMS: overlapping lower-score det suppressed, disjoint kept
    dets = np.array([[0.0, 10.0, 0.9], [1.0, 9.0, 0.5], [20.0, 30.0, 0.8]])
    keep = mq_infer.nms_1d(dets, 0.4)
    assert set(keep) == {0, 2}

    model = vsgn.VSGN(input_feat_dim=16, hidden_dim=64, num_levels=3,
                      temporal_scale=32, anchor_scales=(1.0, 10.0),
                      num_classes=4, use_vss=False)
    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randn(1, 32, 16), jnp.float32)
    num_frms = jnp.asarray([30])
    params = model.init(jax.random.PRNGKey(0), x, num_frms)["params"]
    predict = mq_infer.make_vsgn_predict(model)
    probs, adjusted, start, end = predict(params, x, num_frms)
    props = mq_infer.proposals_from_outputs(
        np.asarray(probs[0]), np.asarray(adjusted[0]), np.asarray(start[0]),
        np.asarray(end[0]), 30, fps=2.0, clip_id="clipX", temporal_scale=32,
    )
    assert len(props) > 0
    for p in props:
        assert 0 <= p["t_start"] <= 15.0  # 30 frames / 2 fps
        assert p["label"] in (1, 2, 3)
        assert np.isfinite(p["score"])
