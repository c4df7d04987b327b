"""End-to-end downstream orchestrators on synthetic features."""

import json

import numpy as np
import pytest


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
