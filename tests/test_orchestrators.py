"""End-to-end downstream orchestrators on synthetic features."""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_run_egomq_end_to_end(tmp_path):
    from egovlpv2_tpu.tasks.orchestrators import run_egomq

    rs = np.random.RandomState(0)
    anno = {}
    for split, names in (("train", ["a", "b"]), ("val", ["c"])):
        for name in names:
            np.save(tmp_path / f"{name}.npy", rs.randn(40, 8).astype(np.float32))
            anno[name] = {
                "subset": split,
                "clip_id": name,
                "parent_start_sec": 0.0,
                "parent_end_sec": 20.0,
                "annotations": [
                    {"start_time": 2.0, "end_time": 6.0, "label": "cook"},
                    {"start_time": 10.0, "end_time": 14.0, "label": "clean"},
                ],
            }
    anno_path = tmp_path / "anno.json"
    anno_path.write_text(json.dumps(anno))
    metrics = run_egomq(
        str(anno_path), str(tmp_path), str(tmp_path), epochs=1, batch_size=2,
        temporal_scale=64, input_feat_dim=8, num_levels=3,
        tiou_thresholds=(0.1, 0.5),
    )
    assert "mAP_avg" in metrics
    assert 0.0 <= metrics["mAP_avg"] <= 1.0
    # retrieval track (Eval.py eval_retrieval): Recall rx @ tIoU rows,
    # monotone in the rank budget
    for t in (0.3, 0.5, 0.7):
        vals = [metrics[f"recall@{r}x_tiou{t:g}"] for r in (1, 2, 3, 4, 5)]
        assert all(0.0 <= v <= 1.0 for v in vals)
        assert vals == sorted(vals)
    # challenge artifacts (Infer.py + Merge_detection_retrieval.py)
    for fname in ("detections_postNMS.json", "retreival_postNMS.json",
                  "submission.json"):
        assert (tmp_path / fname).exists(), fname
    sub = json.loads((tmp_path / "submission.json").read_text())
    assert sub["challenge"] == "ego4d_moment_queries"
    assert set(sub["detect_results"]) == {"c"}  # the one val clip
    det = json.loads((tmp_path / "detections_postNMS.json").read_text())
    for prop in det["results"]["c"]:
        assert prop["label"] in ("cook", "clean")  # names, not indices
        assert len(prop["segment"]) == 2


def test_run_egonlq_end_to_end(tmp_path):
    from egovlpv2_tpu.tasks.orchestrators import run_egonlq

    rs = np.random.RandomState(1)
    metas = []
    gt = {}
    for split_metas, n_items in ((metas, 6),):
        pass
    train_meta, val_meta = [], []
    for i in range(8):
        key = f"clip{i}_ann_0"
        np.save(tmp_path / f"clip{i}_ann_0.npy",
                rs.randn(20, 12).astype(np.float32))
        np.save(tmp_path / f"clip{i}_ann_0_query.npy",
                rs.randn(5, 12).astype(np.float32))
        m = {
            "clip_uid": f"clip{i}", "annotation_uid": "ann", "query_idx": 0,
            "s_ind": 3, "e_ind": 9, "duration": 20.0, "num_windows": 20,
            "query": "where is it",
        }
        (train_meta if i < 6 else val_meta).append(m)
        gt[(f"clip{i}", "ann", 0)] = (3.0, 9.0)
    metrics = run_egonlq(
        train_meta, val_meta, str(tmp_path), gt, epochs=1, batch_size=2,
        max_pos_len=24, video_feature_dim=12,
    )
    for k in ("R1@0.3", "R5@0.5", "mIoU"):
        assert k in metrics and 0.0 <= metrics[k] <= 100.0


def test_run_egotaskqa_end_to_end():
    from egovlpv2_tpu.core.config import (
        FusionConfig, ModelConfig, TextEncoderConfig, VideoEncoderConfig,
    )
    from egovlpv2_tpu.tasks.orchestrators import run_egotaskqa

    cfg = ModelConfig(
        video=VideoEncoderConfig(img_size=32, patch_size=16, embed_dim=32,
                                 depth=4, num_heads=2, num_frames=2),
        text=TextEncoderConfig(vocab_size=120, hidden_size=32, num_layers=4,
                               num_heads=2, intermediate_size=64,
                               max_position_embeddings=40),
        fusion=FusionConfig(num_fuse_block=2, dim_video=32, dim_text=32,
                            hidden_size=32),
        with_itm_head=True, with_mlm_head=False,
        projection="", remat=False,
    )
    rs = np.random.RandomState(0)

    def make_item(i):
        ids = np.full(6, 1, np.int32)
        ids[0] = 0
        ids[1] = 5 + (i % 7)
        ids[2] = 2
        return {
            "video": rs.randn(2, 32, 32, 3).astype(np.float32),
            "text_ids": ids,
            "text_mask": (ids != 1).astype(np.int32),
            "answer": np.int32(i % 3),
            "reasoning_types": ["direct" if i % 2 else "indirect"],
        }

    items = [make_item(i) for i in range(8)]
    metrics = run_egotaskqa(cfg, items, items, num_answers=3,
                            reasoning_types=["direct", "indirect"],
                            epochs=1, batch_size=4)
    assert "acc" in metrics and 0.0 <= metrics["acc"] <= 1.0
    assert "acc/direct" in metrics


def test_run_qfvs_end_to_end(tmp_path):
    from egovlpv2_tpu.downstream.qfvs_data import QFVSDataset
    from egovlpv2_tpu.tasks.orchestrators import run_qfvs

    rs = np.random.RandomState(3)
    od = tmp_path / "oracle" / "P01"
    td = tmp_path / "tags" / "P01"
    od.mkdir(parents=True)
    td.mkdir(parents=True)
    (od / "Car_Tree_oracle.txt").write_text("1\n3\n")
    (td / "P01.txt").write_text("Car,Sky\nTree\nCar,Tree\nSky\n")

    def feats():
        return {
            "seg_len": np.array([3, 1] + [0] * 6),
            "feat_concept1": rs.randn(8, 4, 16).astype(np.float32),
            "feat_concept2": rs.randn(8, 4, 16).astype(np.float32),
            "feat_oracle": rs.randn(8, 4, 16).astype(np.float32),
        }

    ds = QFVSDataset(str(tmp_path / "oracle"), str(tmp_path / "tags"), [1],
                     {"1": feats()}, max_segment_num=8, max_frame_num=4)
    test_items = [ds[0]]
    # per-shot concept tags for the bipartite matching (Tags.mat layout)
    shots_tag = (rs.rand(4, 3) > 0.5).astype(np.float32)
    metrics = run_qfvs(ds, test_items, shots_tag, epochs=1)
    assert "F1" in metrics and np.isfinite(metrics["F1"])


def test_run_egotaskqa_test_only_requires_save_dir():
    """Without a checkpoint to restore, test_only would silently evaluate
    randomly-initialized weights and report the metrics as real."""
    import pytest

    from egovlpv2_tpu.tasks.orchestrators import run_egotaskqa

    with pytest.raises(ValueError, match="test_only"):
        run_egotaskqa(None, [], [], num_answers=3, test_only=True)
