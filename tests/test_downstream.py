"""Downstream heads: VSLNet, VSGN pieces, QFVS KTS/scorer/matching, NLQ eval."""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from egovlpv2_tpu.downstream import nlq_eval, qfvs, vsgn, vslnet


# ---------------- NLQ eval ----------------


def test_compute_iou_hull_union():
    # reference computes union as the hull min..max, not the set union
    iou = nlq_eval.compute_iou(np.array([[0.0, 1.0]]), np.array([[2.0, 3.0]]))
    assert iou[0, 0] == 0.0
    iou = nlq_eval.compute_iou(np.array([[0.0, 2.0]]), np.array([[1.0, 3.0]]))
    assert abs(iou[0, 0] - 1 / 3) < 1e-9


def test_evaluate_nlq():
    gt = {("c", "a", 0): (10.0, 20.0)}
    preds = [{
        "clip_uid": "c", "annotation_uid": "a", "query_idx": 0,
        "predicted_times": [[50.0, 60.0], [11.0, 19.0], [0.0, 5.0]],
    }]
    results, miou = nlq_eval.evaluate_nlq(preds, gt, thresholds=(0.3, 0.5),
                                          top_k=(1, 5))
    # rank-1 prediction misses, rank-2 hits IoU 0.8
    assert results[0][0] == 0.0 and results[1][0] == 0.0  # R@1
    assert results[0][1] == 1.0 and results[1][1] == 1.0  # R@5


def test_time_index_roundtrip():
    s_idx, e_idx, _ = nlq_eval.time_to_index(10.0, 20.0, 100, 100.0)
    s, e = nlq_eval.index_to_time(s_idx, e_idx, 100, 100.0)
    assert abs(s - 10.0) <= 1.0 and abs(e - 20.0) <= 1.0


# ---------------- VSGN pieces ----------------


def test_anchor_generator_matches_reference_formula():
    anchors = vsgn.make_anchors(temporal_scale=16, num_levels=2,
                                anchor_scales=[1.0, 10.0], base_stride=1)
    assert anchors[0].shape == (16 * 2, 2)
    assert anchors[1].shape == (8 * 2, 2)
    # level 0 base anchors: base [0.5, 0.5+?]: stride1 -> [1,1]-0.5=[0.5,0.5]
    # length=1, center=0.5, ws=[1,10] -> first anchor [0.5, 0.5]
    np.testing.assert_allclose(anchors[0][0], [0.5, 0.5])
    np.testing.assert_allclose(anchors[0][1], [-4.0, 5.0])  # ws=10 centered
    np.testing.assert_allclose(anchors[0][2], [1.5, 1.5])  # shifted by stride


def test_box_encode_decode_roundtrip():
    anchors = jnp.asarray([[0.0, 10.0], [5.0, 40.0], [100.0, 130.0]])
    gt = jnp.asarray([[2.0, 12.0], [7.0, 30.0], [90.0, 140.0]])
    enc = vsgn.box_encode(gt, anchors)
    dec = vsgn.box_decode(enc, anchors)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(gt), rtol=1e-5,
                               atol=1e-4)


def test_matcher_low_quality_recovery():
    # anchor 0 overlaps gt 0 well; anchor 2 barely overlaps gt 1 but is its best
    iou = jnp.asarray([[0.8, 0.0], [0.1, 0.05], [0.0, 0.2]])
    valid = jnp.asarray([True, True])
    m = vsgn.match_anchors(iou, valid, iou_thr=0.5, allow_low_quality=True)
    np.testing.assert_array_equal(np.asarray(m), [0, -1, 1])
    m2 = vsgn.match_anchors(iou, valid, iou_thr=0.5, allow_low_quality=False)
    np.testing.assert_array_equal(np.asarray(m2), [0, -1, -1])


def test_vsgn_forward_and_loss():
    model = vsgn.VSGN(
        input_feat_dim=32, hidden_dim=64, num_levels=3, temporal_scale=32,
        anchor_scales=(1.0, 10.0), num_classes=5, use_xgpn=True, use_vss=True,
    )
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 32, 32), jnp.float32)
    num_frms = jnp.asarray([32, 10])
    params = model.init(jax.random.PRNGKey(0), x, num_frms)
    out = model.apply(params, x, num_frms)
    assert out["actionness"].shape == (2, 32)
    anchors = jnp.concatenate(
        [jnp.asarray(a) for a in vsgn.make_anchors(32, 3, [1.0, 10.0])], axis=0
    )
    assert out["loc_dec"].shape == (2, anchors.shape[0], 2)

    gt_bbox = jnp.asarray(
        [[[0.1, 0.4, 2.0], [0.5, 0.8, 1.0]], [[0.2, 0.3, 3.0], [0.0, 0.0, 0.0]]]
    )
    num_gt = jnp.asarray([2, 1])
    gt_action = jnp.asarray((rs.rand(2, 32) > 0.5).astype(np.float32))
    losses = vsgn.vsgn_losses(
        out, anchors, 2, 5, 32.0, gt_bbox, num_gt, gt_action, gt_action,
        gt_action,
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


# ---------------- QFVS ----------------


def test_kts_finds_changepoints():
    rs = np.random.RandomState(0)
    # 3 segments with distinct means
    x = np.concatenate([
        rs.randn(20, 4) * 0.1 + m for m in ([0, 0, 0, 0], [5, 5, 5, 5], [-5, 0, 5, 0])
    ])
    K = x @ x.T
    cps, _ = qfvs.cpd_nonlin(K, 2, lmin=1, lmax=10000)
    assert sorted(np.abs(np.asarray(cps) - [20, 40]).tolist()) <= [2, 2]


def test_kts_auto_selects_reasonable_count():
    rs = np.random.RandomState(1)
    x = np.concatenate([rs.randn(15, 4) * 0.1 + m
                        for m in ([0] * 4, [4] * 4, [-4] * 4, [8] * 4)])
    K = x @ x.T
    cps, costs = qfvs.cpd_auto(K, 8, vmax=1.0)
    assert 2 <= len(cps) <= 5


def test_scatters_match_naive():
    rs = np.random.RandomState(2)
    K = rs.rand(12, 12)
    K = (K + K.T) / 2
    J = qfvs.calc_scatters(K)
    # naive per reference cpd_nonlin.py:10-22
    n = K.shape[0]
    K1 = np.concatenate([[0], np.cumsum(np.diag(K))])
    K2 = np.zeros((n + 1, n + 1))
    K2[1:, 1:] = np.cumsum(np.cumsum(K, 0), 1)
    for i in range(n):
        for j in range(i, n):
            ref = K1[j + 1] - K1[i] - (
                K2[j + 1, j + 1] + K2[i, i] - K2[j + 1, i] - K2[i, j + 1]
            ) / (j - i + 1)
            assert abs(J[i, j] - ref) < 1e-9


def test_summary_scorer_and_loss():
    model = qfvs.SummaryScorer(d_model=16, nhead=2, num_layers=1)
    rs = np.random.RandomState(3)
    feats = jnp.asarray(rs.randn(2, 3, 5, 16), jnp.float32)
    seg_len = jnp.asarray([[5, 3, 0], [2, 2, 2]])
    params = model.init(jax.random.PRNGKey(0), feats, seg_len)
    logits = model.apply(params, feats, seg_len)
    assert logits.shape == (2, 3, 5)
    mask = (jnp.arange(5)[None, None, :] < seg_len[:, :, None]).astype(jnp.float32)
    tgt = jnp.asarray((rs.rand(2, 3, 5) > 0.5).astype(np.float32))
    loss = qfvs.qfvs_bce_loss(logits, tgt, mask)
    assert np.isfinite(float(loss))


def test_semantic_matching_perfect():
    tags = np.eye(8)
    p, r, f1 = qfvs.semantic_matching_f1([0, 1, 2], [0, 1, 2], tags)
    assert (p, r, f1) == (1.0, 1.0, 1.0)
    p, r, f1 = qfvs.semantic_matching_f1([0, 1], [2, 3], tags)
    assert f1 == 0.0


# ---------------- VSLNet ----------------


def test_vslnet_forward_and_losses():
    model = vslnet.VSLNet(dim=32, num_heads=4, max_pos_len=16,
                          video_feature_dim=24, query_feature_dim=20)
    rs = np.random.RandomState(4)
    v = jnp.asarray(rs.randn(2, 16, 24), jnp.float32)
    q = jnp.asarray(rs.randn(2, 7, 20), jnp.float32)
    v_mask = jnp.asarray([[1] * 16, [1] * 10 + [0] * 6])
    q_mask = jnp.asarray([[1] * 7, [1] * 4 + [0] * 3])
    params = model.init(jax.random.PRNGKey(0), v, v_mask, q, q_mask)
    h, s_logits, e_logits = model.apply(params, v, v_mask, q, q_mask)
    assert h.shape == (2, 16) and s_logits.shape == (2, 16)
    # masked positions are killed
    assert float(s_logits[1, 12]) < -1e20

    loss = vslnet.span_loss(s_logits, e_logits, jnp.asarray([2, 3]),
                            jnp.asarray([5, 6]))
    assert np.isfinite(float(loss))
    hl = vslnet.HighLightLayer.loss(h, jnp.asarray((rs.rand(2, 16) > 0.5)
                                                   .astype(np.float32)), v_mask)
    assert np.isfinite(float(hl))

    starts, ends = vslnet.extract_top_spans(s_logits, e_logits, k=5)
    assert starts.shape == (2, 5)
    assert np.all(np.asarray(ends) >= np.asarray(starts))


# ---------------- MQ detection mAP ----------------


def test_mq_detection_map():
    from egovlpv2_tpu.downstream import mq_eval

    gt = [
        {"video_id": "v1", "t_start": 0.0, "t_end": 10.0, "label": 1},
        {"video_id": "v1", "t_start": 20.0, "t_end": 30.0, "label": 1},
        {"video_id": "v2", "t_start": 5.0, "t_end": 15.0, "label": 2},
    ]
    perfect = [
        {"video_id": "v1", "t_start": 0.0, "t_end": 10.0, "label": 1, "score": 0.9},
        {"video_id": "v1", "t_start": 20.0, "t_end": 30.0, "label": 1, "score": 0.8},
        {"video_id": "v2", "t_start": 5.0, "t_end": 15.0, "label": 2, "score": 0.7},
    ]
    m = mq_eval.detection_map(gt, perfect)
    assert abs(m["mAP_avg"] - 1.0) < 1e-9
    # a duplicate detection of an already-matched gt is a false positive
    dup = perfect + [
        {"video_id": "v1", "t_start": 0.0, "t_end": 10.0, "label": 1, "score": 0.5}
    ]
    m2 = mq_eval.detection_map(gt, dup)
    assert m2["mAP_avg"] <= 1.0
    # non-overlapping junk hurts when ranked first
    junk = [{"video_id": "v1", "t_start": 500.0, "t_end": 510.0, "label": 1,
             "score": 0.99}] + perfect
    m3 = mq_eval.detection_map(gt, junk)
    assert m3["mAP_avg"] < m["mAP_avg"]


def test_mq_retrieval_recall():
    """Recall rx @ tIoU semantics (get_retrieval_performance.py:93-127):
    budget = r * num_gt ranked predictions per (clip, label); unpredicted
    labels contribute misses."""
    from egovlpv2_tpu.downstream import mq_eval

    gt = [
        {"video_id": "v1", "t_start": 0.0, "t_end": 10.0, "label": 1},
        {"video_id": "v1", "t_start": 20.0, "t_end": 30.0, "label": 1},
        # label 2 never predicted -> always a miss
        {"video_id": "v2", "t_start": 5.0, "t_end": 15.0, "label": 2},
    ]
    pred = [
        # junk outranks the true proposals: at r=1 the budget (2 preds)
        # covers junk + the first true hit only
        {"video_id": "v1", "t_start": 100.0, "t_end": 110.0, "label": 1,
         "score": 0.9},
        {"video_id": "v1", "t_start": 0.0, "t_end": 10.0, "label": 1,
         "score": 0.8},
        {"video_id": "v1", "t_start": 20.0, "t_end": 30.0, "label": 1,
         "score": 0.7},
    ]
    m = mq_eval.retrieval_recall(gt, pred)
    for t in (0.3, 0.5, 0.7):
        assert abs(m[f"recall@1x_tiou{t:g}"] - 1 / 3) < 1e-9
        assert abs(m[f"recall@2x_tiou{t:g}"] - 2 / 3) < 1e-9
        assert abs(m[f"recall@5x_tiou{t:g}"] - 2 / 3) < 1e-9
    # empty gt -> all zeros, no division error
    assert mq_eval.retrieval_recall([], pred)["recall@1x_tiou0.3"] == 0.0


def test_mq_pack_submission():
    from egovlpv2_tpu.downstream import mq_eval

    det = {"c1": [{"label": "cook", "score": 0.5, "segment": [0.0, 1.0]}]}
    rev = {"c1": []}
    sub = mq_eval.pack_submission(det, rev)
    assert sub["challenge"] == "ego4d_moment_queries"
    assert sub["detect_results"] is det and sub["retrieve_results"] is rev


def test_mq_convert_moment_annotations(tmp_path):
    """Official moments jsons -> clip annotations (Convert_annotations.py):
    primary-label filtering, feature gating + fps, empty-clip pruning."""
    from egovlpv2_tpu.downstream.mq_data import convert_moment_annotations

    def label(name, primary=True):
        return {"label": name, "start_time": 1.0, "end_time": 3.0,
                "primary": primary}

    train = {"videos": [
        {"video_uid": "vid1", "split": "train", "clips": [{
            "clip_uid": "c1", "video_start_sec": 0.0, "video_end_sec": 8.0,
            "annotations": [{"labels": [label("cook"),
                                        label("alt", primary=False)]}],
        }]},
        # no extracted features -> whole video skipped
        {"video_uid": "vid2", "split": "train", "clips": [{
            "clip_uid": "missing", "video_start_sec": 0.0,
            "video_end_sec": 8.0,
            "annotations": [{"labels": [label("cook")]}],
        }]},
        # zero primary annotations -> clip pruned
        {"video_uid": "vid3", "split": "train", "clips": [{
            "clip_uid": "c3", "video_start_sec": 0.0, "video_end_sec": 8.0,
            "annotations": [{"labels": [label("alt", primary=False)]}],
        }]},
    ]}
    test = {"videos": [
        # test clips carry no annotations but are kept
        {"video_uid": "vid4", "split": "test", "clips": [{
            "clip_uid": "c4", "video_start_sec": 2.0, "video_end_sec": 10.0,
        }]},
    ]}
    info = {"videos": [{"video_uid": f"vid{i}", "duration_sec": 16.0}
                       for i in (1, 2, 3, 4)]}
    for cid in ("c1", "c3", "c4"):
        np.save(tmp_path / f"{cid}.npy", np.zeros((32, 4), np.float32))

    clips = convert_moment_annotations([train, test], info, str(tmp_path))
    assert set(clips) == {"c1", "c4"}
    c1 = clips["c1"]
    assert c1["subset"] == "train" and c1["video_id"] == "vid1"
    assert [a["label"] for a in c1["annotations"]] == ["cook"]
    assert abs(c1["fps"] - 32 / 16.0) < 1e-9  # feature frames / duration
    assert clips["c4"]["annotations"] == []
    # without a feature dir nothing is gated and fps is omitted
    all_clips = convert_moment_annotations([train, test], info)
    assert set(all_clips) == {"c1", "missing", "c4"}
    assert "fps" not in all_clips["c1"]


def test_segment_iou_set_union():
    from egovlpv2_tpu.downstream import mq_eval
    import numpy as np

    # disjoint segments: set-union semantics (NOT the NLQ hull union)
    iou = mq_eval.segment_iou(np.array([0.0, 1.0]), np.array([[2.0, 3.0]]))
    assert iou[0] == 0.0
    iou = mq_eval.segment_iou(np.array([0.0, 2.0]), np.array([[1.0, 3.0]]))
    assert abs(iou[0] - 1 / 3) < 1e-9


# ---- EgoMQ long-clip windowing + VSS self-stitching ----


def _write_mq_fixture(tmp_path, total=150, dur=75.0):
    """One long clip (features > temporal_scale) with an early and a LATE
    moment (past the truncation point)."""
    rs = np.random.RandomState(7)
    np.save(tmp_path / "long.npy", rs.randn(total, 8).astype(np.float32))
    anno = {
        "long": {
            "subset": "train", "clip_id": "long",
            "parent_start_sec": 0.0, "parent_end_sec": dur,
            "annotations": [
                {"start_time": 2.0, "end_time": 6.0, "label": "cook"},
                # fps = 150/75 = 2 -> features 130..140, far past tscale=64
                {"start_time": 65.0, "end_time": 70.0, "label": "clean"},
            ],
        }
    }
    p = tmp_path / "anno.json"
    p.write_text(json.dumps(anno))
    return str(p)


def test_egomq_windowing_recovers_late_moment(tmp_path):
    from egovlpv2_tpu.downstream.datasets import EgoMQFeatureDataset

    anno = _write_mq_fixture(tmp_path)
    # reference-parity mode truncates at tscale: the late moment degenerates
    trunc = EgoMQFeatureDataset(anno, str(tmp_path), subset="train",
                                mode="train", temporal_scale=64,
                                input_feat_dim=8)
    item = trunc[0]
    gt = item["gt_bbox"][: item["num_gt"]]
    late = gt[gt[:, 2] == trunc.classes["clean"]]
    assert np.allclose(late[:, 0], late[:, 1])  # clamped to a zero-len box

    # windowed mode: some window contains the late moment intact
    ds = EgoMQFeatureDataset(anno, str(tmp_path), subset="train", mode="train",
                             temporal_scale=64, input_feat_dim=8,
                             window_stride=32)
    assert len(ds) >= 2
    found = False
    for i in range(len(ds)):
        it = ds[i]
        gt = it["gt_bbox"][: it["num_gt"]]
        for s, e, c in gt:
            if c == ds.classes["clean"] and e > s:
                # map back to seconds via the window offset
                fps = float(it["fps"])
                t0 = s * 64 / fps + float(it["offset_sec"])
                t1 = e * 64 / fps + float(it["offset_sec"])
                assert abs(t0 - 65.0) < 1.0 and abs(t1 - 70.0) < 1.0
                found = True
    assert found, "no window recovered the late moment"


def test_egomq_offset_sec_maps_proposals_back():
    from egovlpv2_tpu.downstream.mq_infer import proposals_from_outputs

    probs = np.array([[0.1, 0.9]], np.float32)  # one anchor, one fg class
    locs = np.array([[4.0, 10.0]], np.float32)
    startness = endness = np.ones(64, np.float32)
    props = proposals_from_outputs(
        probs, locs, startness, endness, num_frms=64, fps=2.0,
        clip_id="c", temporal_scale=64, offset_sec=32.0,
    )
    assert props and abs(props[0]["t_start"] - (4.0 / 2.0 + 32.0)) < 1e-6


def test_egomq_vss_self_stitch(tmp_path):
    from egovlpv2_tpu.downstream.datasets import EgoMQFeatureDataset

    rs = np.random.RandomState(1)
    np.save(tmp_path / "short.npy", rs.randn(20, 8).astype(np.float32))
    anno = {"short": {"subset": "train", "clip_id": "short",
                      "parent_start_sec": 0.0, "parent_end_sec": 10.0,
                      "annotations": [
                          {"start_time": 1.0, "end_time": 4.0, "label": "x"}]}}
    p = tmp_path / "a.json"
    p.write_text(json.dumps(anno))
    ds = EgoMQFeatureDataset(str(p), str(tmp_path), subset="train",
                             mode="train", temporal_scale=128,
                             input_feat_dim=8, use_vss=True, stitch_gap=10)
    item = ds[0]
    t = int(item["num_frms"])
    assert t == 20
    # the x2 up-scaled copy sits after the stitch gap
    video = item["video"]
    assert np.allclose(video[t : t + 10], 0)  # gap is zeros
    np.testing.assert_allclose(video[t + 10], video[0])
    np.testing.assert_allclose(video[t + 11], video[0])
    # annotations doubled: original + stitched copy at 2x scale
    gt = item["gt_bbox"][: item["num_gt"]]
    assert item["num_gt"] == 2
    orig, copy = gt[0], gt[1]
    assert abs(copy[0] * 128 - (t + 10 + 2 * orig[0] * 128)) < 1e-4
