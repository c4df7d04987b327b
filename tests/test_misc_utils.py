"""Visualizer HTML, logging stats writer, preprocess helpers."""

import json
import os

import numpy as np

from egovlpv2_tpu.utils.logging import MetricsPipeline, StatsWriter, Throughput
from egovlpv2_tpu.utils.visualizer import RetrievalVisualizer


def test_visualizer_writes_pages(tmp_path):
    viz = RetrievalVisualizer(str(tmp_path))
    sims = np.array([[0.9, 0.2, 0.1], [0.1, 0.8, 0.3]])
    path = viz.write_epoch(
        1, ["wash hands", "cut onion"], sims,
        video_paths=["a.mp4", "b.mp4", "c.mp4"], gt_indices=[0, 2],
        metrics={"R1": 50.0},
    )
    content = open(path).read()
    assert "wash hands" in content and "a.mp4" in content
    assert os.path.exists(tmp_path / "index.html")
    # gt for query 1 is video c ranked 2nd -> hit at top_k=5
    assert 'class="hit"' in content


def test_stats_writer(tmp_path):
    w = StatsWriter(str(tmp_path), tensorboard=False)
    w.write(1, {"loss": 1.5})
    w.write(2, {"loss": 1.25})
    w.close()
    lines = open(tmp_path / "stats.txt").read().strip().splitlines()
    assert json.loads(lines[0]) == {"step": 1, "loss": 1.5}
    assert json.loads(lines[1])["loss"] == 1.25


def test_throughput_meter():
    tp = Throughput(items_per_step=8)
    assert tp.tick() == {}
    out = tp.tick()
    assert out["items_per_sec"] > 0


def test_compile_cache_host_guard(tmp_path):
    """Cache entries from a different host are wiped; same-host kept."""
    from egovlpv2_tpu.utils import compile_cache as cc

    d = str(tmp_path / "cache")
    assert cc.ensure_cache(d) == d
    (tmp_path / "cache" / "entry.bin").write_bytes(b"x")
    # same host: entry survives
    cc.ensure_cache(d)
    assert (tmp_path / "cache" / "entry.bin").exists()
    # stamp from another host: directory is wiped and re-stamped
    (tmp_path / "cache" / "host_signature.json").write_text(
        json.dumps({"signature": "deadbeefdeadbeef"}))
    cc.ensure_cache(d)
    assert not (tmp_path / "cache" / "entry.bin").exists()
    assert json.loads(
        (tmp_path / "cache" / "host_signature.json").read_text()
    )["signature"] == cc._host_signature()
    # unstamped non-empty directory (unknown provenance): also wiped
    (tmp_path / "cache" / "host_signature.json").unlink()
    (tmp_path / "cache" / "orphan.bin").write_bytes(b"x")
    cc.ensure_cache(d)
    assert not (tmp_path / "cache" / "orphan.bin").exists()


def test_save_resolved_config(tmp_path):
    """Training runs record the fully-resolved config (parse_config.py:62-89)."""
    from egovlpv2_tpu.cli import _save_resolved_config, load_train_config

    cfg = load_train_config()
    _save_resolved_config(cfg, str(tmp_path))
    data = json.loads((tmp_path / "config.json").read_text())
    assert data["global_batch_size"] == cfg.global_batch_size
    assert data["model"]["video"]["num_frames"] == cfg.model.video.num_frames


def test_monitor_state_roundtrip(tmp_path):
    """Monitor best/early-stop progress persists across a resume."""
    from egovlpv2_tpu.cli import Monitor
    from egovlpv2_tpu.train.checkpoint import CheckpointManager

    m = Monitor("max:acc", early_stop=3)
    assert m.update({"acc": 0.5})
    assert not m.update({"acc": 0.4})
    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    ckpt.save_monitor(m.state_dict())
    m2 = Monitor("max:acc", early_stop=3)
    assert m2.load_state_dict(ckpt.monitor_state())
    assert m2.best == 0.5 and m2.not_improved == 1
    # a differently-monitored run ignores the stale state
    m3 = Monitor("min:loss")
    assert not m3.load_state_dict(ckpt.monitor_state())
    ckpt.close()


def test_metrics_pipeline_depth1():
    """push(i) returns step i-1's metrics as floats; flush drains."""
    pipe = MetricsPipeline()
    assert pipe.push(1, {"loss": np.float32(2.0)}) is None
    step, m = pipe.push(2, {"loss": np.float32(1.5)})
    assert step == 1 and m == {"loss": 2.0} and isinstance(m["loss"], float)
    step, m = pipe.flush()
    assert step == 2 and m == {"loss": 1.5}
    # drained: nothing in flight
    assert pipe.flush() is None
    assert pipe.push(3, {"loss": 1.0}) is None
