"""CLI subcommands for the four downstream benchmarks, driven from disk.

Each test exercises the registered `egovlpv2-tpu {mq,nlq,taskqa,qfvs}`
entry through `cli.main([...])` on real files (the reference ships these as
separate runnable mains: EgoMQ/Train.py:24-65, EgoNLQ/main.py:197-330,
EgoTaskQA/main_end2end.py:84-200, QFVS/main.py:37-54).
"""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from egovlpv2_tpu import cli

from tests.test_cli import TINY, _write_mp4  # noqa: F401 (fixture helpers)


@pytest.fixture()
def tiny_config(tmp_path):
    path = tmp_path / "tiny.json"
    path.write_text(json.dumps(TINY))
    return str(path)


def test_cli_mq(tmp_path):
    rs = np.random.RandomState(0)
    anno = {}
    for split, names in (("train", ["a", "b"]), ("val", ["c"])):
        for name in names:
            np.save(tmp_path / f"{name}.npy", rs.randn(40, 8).astype(np.float32))
            anno[name] = {
                "subset": split, "clip_id": name,
                "parent_start_sec": 0.0, "parent_end_sec": 20.0,
                "annotations": [
                    {"start_time": 2.0, "end_time": 6.0, "label": "cook"},
                    {"start_time": 10.0, "end_time": 14.0, "label": "clean"},
                ],
            }
    anno_path = tmp_path / "anno.json"
    anno_path.write_text(json.dumps(anno))
    out = tmp_path / "mq_metrics.json"
    cli.main([
        "mq", "--anno", str(anno_path), "--features", str(tmp_path),
        "--out", str(tmp_path / "mq_out"), "--epochs", "1",
        "--batch_size", "2", "--temporal_scale", "64",
        "--input_feat_dim", "8", "--num_levels", "3",
        "--metrics_out", str(out),
    ])
    metrics = json.loads(out.read_text())
    assert "mAP_avg" in metrics and 0.0 <= metrics["mAP_avg"] <= 1.0
    # the retrieval track + challenge artifacts ship from the same entry
    # (Eval.py eval_retrieval + Merge_detection_retrieval.py)
    assert "recall@1x_tiou0.3" in metrics
    assert (tmp_path / "mq_out" / "submission.json").exists()


def test_cli_mq_anno_to_mq(tmp_path):
    """Official moments jsons -> mq-anno -> mq: the full reference pipeline
    (Convert_annotations.py feeding Train/Infer/Eval)."""
    rs = np.random.RandomState(2)
    videos = []
    for split, names in (("train", ["a", "b"]), ("val", ["c"])):
        for name in names:
            np.save(tmp_path / f"{name}.npy",
                    rs.randn(40, 8).astype(np.float32))
            videos.append({
                "video_uid": f"vid_{name}", "split": split,
                "clips": [{
                    "clip_uid": name,
                    "video_start_sec": 0.0, "video_end_sec": 20.0,
                    "annotations": [{"labels": [
                        {"label": "cook", "primary": True,
                         "start_time": 2.0, "end_time": 6.0},
                        {"label": "clean", "primary": True,
                         "start_time": 10.0, "end_time": 14.0},
                    ]}],
                }],
            })
    moments = tmp_path / "moments.json"
    moments.write_text(json.dumps({"videos": videos}))
    info = tmp_path / "ego4d.json"
    info.write_text(json.dumps({"videos": [
        {"video_uid": v["video_uid"], "duration_sec": 20.0}
        for v in videos]}))
    anno = tmp_path / "clip_annotations.json"
    cli.main([
        "mq-anno", "--moments", str(moments), "--info", str(info),
        "--features", str(tmp_path), "--out", str(anno),
    ])
    counts = json.loads(anno.read_text())
    assert set(counts) == {"a", "b", "c"}
    out = tmp_path / "mq_metrics.json"
    cli.main([
        "mq", "--anno", str(anno), "--features", str(tmp_path),
        "--out", str(tmp_path / "mq_out2"), "--epochs", "1",
        "--batch_size", "2", "--temporal_scale", "64",
        "--input_feat_dim", "8", "--num_levels", "3",
        "--metrics_out", str(out),
    ])
    metrics = json.loads(out.read_text())
    assert "mAP_avg" in metrics


def test_cli_nlq(tmp_path):
    # official Ego4D NLQ json layout (load_nlq_annotations input)
    rs = np.random.RandomState(1)
    videos = []
    for i in range(8):
        clip_uid = f"clip{i}"
        np.save(tmp_path / f"{clip_uid}_ann{i}_0.npy",
                rs.randn(20, 12).astype(np.float32))
        np.save(tmp_path / f"{clip_uid}_ann{i}_0_query.npy",
                rs.randn(5, 12).astype(np.float32))
        videos.append({
            "video_uid": f"vid{i}",
            "clips": [{
                "clip_uid": clip_uid,
                "video_start_sec": 0.0, "video_end_sec": 20.0,
                "annotations": [{
                    "annotation_uid": f"ann{i}",
                    "language_queries": [{
                        "query": f"where is object {i}",
                        "clip_start_sec": 3.0, "clip_end_sec": 9.0,
                    }],
                }],
            }],
        })
    train_anno = tmp_path / "nlq_train.json"
    val_anno = tmp_path / "nlq_val.json"
    train_anno.write_text(json.dumps({"videos": videos[:6]}))
    val_anno.write_text(json.dumps({"videos": videos[6:]}))
    out = tmp_path / "nlq_metrics.json"
    cli.main([
        "nlq", "--train_anno", str(train_anno), "--val_anno", str(val_anno),
        "--features", str(tmp_path), "--epochs", "1", "--batch_size", "2",
        "--max_pos_len", "24", "--video_feature_dim", "12",
        "--metrics_out", str(out),
    ])
    metrics = json.loads(out.read_text())
    for k in ("R1@0.3", "R5@0.5", "mIoU"):
        assert k in metrics and 0.0 <= metrics[k] <= 100.0


@pytest.fixture()
def taskqa_setup(tmp_path):
    vid_dir = tmp_path / "qa_videos"
    items = []
    for i in range(8):
        _write_mp4(vid_dir / f"iv{i}.mp4", seconds=1, seed=40 + i)
        items.append({
            "interval": f"iv{i}",
            "question": f"what happens in clip {i}",
            "answer_encode": i % 3,
            "type": "causal$descriptive" if i % 2 else "causal",
        })
    qa_train = tmp_path / "formatted_train_qas_encode.json"
    qa_val = tmp_path / "formatted_val_qas_encode.json"
    qa_train.write_text(json.dumps(items[:6]))
    qa_val.write_text(json.dumps(items[6:] + items[:2]))  # >= batch_size
    answers = tmp_path / "answer_set.txt"
    answers.write_text("yes\nno\nmaybe\n")
    rtypes = tmp_path / "all_reasoning_types.txt"
    rtypes.write_text("causal\ndescriptive\n")
    return {"videos": vid_dir, "qa_train": qa_train, "qa_val": qa_val,
            "answers": answers, "rtypes": rtypes}


def test_cli_taskqa_train_resume_testonly(tiny_config, tmp_path, taskqa_setup):
    s = taskqa_setup
    save = tmp_path / "qa_ckpt"
    common = [
        "taskqa", "--config", tiny_config,
        "--qa_train", str(s["qa_train"]), "--qa_val", str(s["qa_val"]),
        "--videos", str(s["videos"]), "--answer_set", str(s["answers"]),
        "--reasoning_types", str(s["rtypes"]),
        "--batch_size", "2", "--save_dir", str(save),
    ]
    out1 = tmp_path / "m1.json"
    cli.main(common + ["--epochs", "1", "--metrics_out", str(out1)])
    m1 = json.loads(out1.read_text())
    assert "acc" in m1 and "acc/causal" in m1

    # resume: epoch 1 is already checkpointed, extend training to 2 epochs
    # (main_end2end.py:164-172 global_step -> start_epoch)
    out2 = tmp_path / "m2.json"
    cli.main(common + ["--epochs", "2", "--resume",
                       "--metrics_out", str(out2)])
    assert "acc" in json.loads(out2.read_text())

    # test-only: evaluate the saved checkpoint without training
    # (main_end2end.py:174-200)
    out3 = tmp_path / "m3.json"
    cli.main(common + ["--epochs", "2", "--test_only",
                       "--metrics_out", str(out3)])
    m3 = json.loads(out3.read_text())
    # same checkpoint, same eval data -> identical accuracy as the resume run
    assert m3["acc"] == json.loads(out2.read_text())["acc"]


def test_cli_taskqa_testonly_without_ckpt_raises(tiny_config, tmp_path,
                                                 taskqa_setup):
    s = taskqa_setup
    with pytest.raises(FileNotFoundError):
        cli.main([
            "taskqa", "--config", tiny_config,
            "--qa_train", str(s["qa_train"]), "--qa_val", str(s["qa_val"]),
            "--videos", str(s["videos"]), "--answer_set", str(s["answers"]),
            "--batch_size", "2", "--save_dir", str(tmp_path / "empty"),
            "--test_only",
        ])


def test_cli_qfvs(tmp_path):
    import scipy.io

    rs = np.random.RandomState(3)
    for vid in (1, 2):
        od = tmp_path / "oracle" / f"P0{vid}"
        td = tmp_path / "tags" / f"P0{vid}"
        od.mkdir(parents=True)
        td.mkdir(parents=True)
        (od / "Car_Tree_oracle.txt").write_text("1\n3\n")
        (td / f"P0{vid}.txt").write_text("Car,Sky\nTree\nCar,Tree\nSky\n")
        np.savez(
            tmp_path / f"P0{vid}.npz",
            seg_len=np.array([3, 1] + [0] * 6),
            feat_concept1=rs.randn(8, 4, 16).astype(np.float32),
            feat_concept2=rs.randn(8, 4, 16).astype(np.float32),
            feat_oracle=rs.randn(8, 4, 16).astype(np.float32),
        )
    # Tags.mat cell-array layout (semantic_evaluation.py:16-35)
    cell = np.empty((2, 1), object)
    for i in range(2):
        cell[i, 0] = (rs.rand(4, 3) > 0.5).astype(np.uint8)
    scipy.io.savemat(tmp_path / "Tags.mat", {"Tags": cell})

    out = tmp_path / "qfvs_metrics.json"
    cli.main([
        "qfvs", "--oracle", str(tmp_path / "oracle"),
        "--tags", str(tmp_path / "tags"),
        "--tags_mat", str(tmp_path / "Tags.mat"),
        "--features", str(tmp_path),
        "--train_videos", "1", "--test_video", "2",
        "--epochs", "1", "--max_segments", "8", "--max_shots", "4",
        "--metrics_out", str(out),
    ])
    metrics = json.loads(out.read_text())
    assert "F1" in metrics and np.isfinite(metrics["F1"])
