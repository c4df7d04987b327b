"""Video preprocessing tools (reference utils/video_resize.py,
utils/video_chunk.py). ffmpeg isn't installed on CI boxes, so the ffmpeg
invocations are captured via monkeypatching and checked for the reference's
exact semantics: scale-to-height-256 with even width, <= 600 s chunks named
<uid>/<i>.mp4, short videos copied as a single chunk 0.mp4."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from egovlpv2_tpu.data import preprocess


def _mp4(path, seconds=2, fps=30, res=32):
    rs = np.random.RandomState(0)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (res, res))
    for _ in range(int(fps * seconds)):
        w.write(rs.randint(0, 255, (res, res, 3), np.uint8))
    w.release()


def test_resize_video_command(tmp_path, monkeypatch):
    calls = []
    monkeypatch.setattr(preprocess.subprocess, "call",
                        lambda cmd, **kw: calls.append(cmd) or 0)
    ok = preprocess.resize_video(str(tmp_path / "in.mp4"),
                                 str(tmp_path / "out" / "v.mp4"), height=256)
    assert ok and len(calls) == 1
    cmd = calls[0]
    # video_resize.py:17-31: scale to height, even width, copy audio
    assert cmd[0] == "ffmpeg" and "-filter:v" in cmd
    assert cmd[cmd.index("-filter:v") + 1] == "scale=trunc(oh*a/2)*2:256"
    assert cmd[cmd.index("-c:a") + 1] == "copy"
    assert os.path.isdir(tmp_path / "out")  # parent created


def test_resize_video_skips_existing(tmp_path, monkeypatch):
    out = tmp_path / "done.mp4"
    out.write_bytes(b"x")
    monkeypatch.setattr(preprocess.subprocess, "call",
                        lambda *a, **k: pytest.fail("must not re-encode"))
    assert preprocess.resize_video(str(tmp_path / "in.mp4"), str(out))


def test_chunk_video_short_copies_single_chunk(tmp_path):
    src = tmp_path / "v.mp4"
    _mp4(str(src), seconds=2)
    n = preprocess.chunk_video(str(src), str(tmp_path / "chunks"), "uid1",
                               dur_limit=600)
    assert n == 1
    assert (tmp_path / "chunks" / "uid1" / "0.mp4").exists()


def test_chunk_video_long_splits_at_limit(tmp_path, monkeypatch):
    src = tmp_path / "long.mp4"
    _mp4(str(src), seconds=5)
    calls = []
    monkeypatch.setattr(preprocess.subprocess, "call",
                        lambda cmd, **kw: calls.append(cmd) or 0)
    n = preprocess.chunk_video(str(src), str(tmp_path / "chunks"), "uid2",
                               dur_limit=2.0)
    # video_chunk.py:27-67: floor(5/2)+1 = 3 chunks covering [0,2],[2,4],[4,5]
    assert n == 3 and len(calls) == 3
    spans = [(float(c[c.index("-ss") + 1]), float(c[c.index("-to") + 1]))
             for c in calls]
    assert spans[0] == (0.0, 2.0) and spans[1] == (2.0, 4.0)
    assert spans[2][0] == 4.0 and 4.9 <= spans[2][1] <= 5.1
    assert [os.path.basename(c[-1]) for c in calls] == \
        ["0.mp4", "1.mp4", "2.mp4"]
