"""Dual-encoder retrieval fine-tune step + Charades class-prompt eval."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from egovlpv2_tpu.core.config import (
    FusionConfig, LossConfig, ModelConfig, OptimConfig, TextEncoderConfig,
    TrainConfig, VideoEncoderConfig,
)
from egovlpv2_tpu.models.egovlp import EgoVLPv2
from egovlpv2_tpu.tasks.retrieval import (
    epoch_milestone_schedule,
    evaluate_charades,
    make_dual_train_step,
    milestone_lr_scale,
)
from egovlpv2_tpu.train.optimizer import make_optimizer
from egovlpv2_tpu.train.step import TrainState

TINY = TrainConfig(
    model=ModelConfig(
        video=VideoEncoderConfig(img_size=32, patch_size=16, embed_dim=32,
                                 depth=4, num_heads=2, num_frames=2),
        text=TextEncoderConfig(vocab_size=120, hidden_size=32, num_layers=4,
                               num_heads=2, intermediate_size=64,
                               max_position_embeddings=40),
        fusion=FusionConfig(num_fuse_block=2, dim_video=32, dim_text=32,
                            hidden_size=32),
        projection="small",
        projection_dim=16,
        with_itm_head=False,
        with_mlm_head=False,
        remat=False,
    ),
    optim=OptimConfig(max_steps=20),
    loss=LossConfig(type="AdaptiveMaxMargin", margin=0.2),
    tasks="Dual",
    max_text_len=8,
)


@pytest.fixture(scope="module")
def setup():
    model = EgoVLPv2(TINY.model)
    rs = np.random.RandomState(0)
    video = jnp.asarray(rs.randn(4, 2, 32, 32, 3), jnp.float32)
    ids = jnp.asarray(np.tile([[0, 5, 6, 2, 1, 1, 1, 1]], (4, 1)), jnp.int32)
    ids = ids.at[:, 1].set(jnp.arange(4) + 5)
    mask = (ids != 1).astype(jnp.int32)
    params = model.init(jax.random.PRNGKey(0), video, ids, mask)["params"]
    batch = {
        "video": video, "text_ids": ids, "text_mask": mask,
        "relevancy": jnp.asarray(rs.rand(4), jnp.float32),
    }
    return model, params, batch


def test_dual_train_step_adaptive_margin(setup):
    model, params, batch = setup
    tx = make_optimizer(TINY.optim, params)
    step = make_dual_train_step(model, TINY, tx)
    # the step donates its state — give it a private copy of the shared
    # fixture params so later tests keep valid buffers
    own = jax.tree_util.tree_map(jnp.copy, params)
    state = TrainState(own, tx.init(own), jnp.zeros((), jnp.int32),
                       jax.random.PRNGKey(1))
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss_total"]))
    assert all(np.isfinite(losses))
    # warmup lr ~ 0 for the first steps and dropout varies per step — just
    # require movement, not monotone descent
    assert losses[0] != losses[1]


def test_charades_eval(setup):
    model, params, batch = setup
    rs = np.random.RandomState(1)
    cls_ids = np.tile([[0, 5, 6, 2, 1, 1, 1, 1]], (7, 1)).astype(np.int32)
    cls_ids[:, 1] = np.arange(7) + 10
    cls_mask = (cls_ids != 1).astype(np.int32)
    batches = [{
        "video": np.asarray(batch["video"]),
        "target": (rs.rand(4, 7) > 0.6).astype(np.float32),
    }]
    # ensure no all-zero target rows get counted (handled by -inf fix)
    m = evaluate_charades(model, params, batches, cls_ids, cls_mask)
    assert "mAP" in m and 0.0 <= m["mAP"] <= 1.0


def test_milestone_schedule():
    assert milestone_lr_scale(0, (2, 4)) == 1.0
    assert milestone_lr_scale(2, (2, 4)) == 0.1
    assert abs(milestone_lr_scale(5, (2, 4)) - 0.01) < 1e-12
    sched = epoch_milestone_schedule(1.0, (2,), steps_per_epoch=10)
    assert float(sched(0)) == 1.0
    assert abs(float(sched(25)) - 0.1) < 1e-6


def test_align_mir_similarity():
    from egovlpv2_tpu.tasks.retrieval import align_mir_similarity
    import numpy as np

    # 3 videos A,B,C; gathered order is [2,0,1] (dataset idx per row)
    # canonical sim[text_i, video_j] = 10*i + j in csv order
    canonical = np.arange(9).reshape(3, 3) + np.array([[0], [10], [20]])
    perm = [2, 0, 1]  # gathered row r corresponds to dataset index perm[r]
    gathered = canonical[perm][:, perm]
    idx_arr = np.array(perm)
    video_ids = np.array(["A", "B", "C"])
    sentence_video_ids = np.array(["B", "A", "B"])  # 3 unique sentences
    out = align_mir_similarity(gathered, idx_arr, video_ids, sentence_video_ids)
    # out[v, s] = canonical[sentence_row, video]; sentence columns map to
    # rows [1, 0, 1] of the canonical text x video matrix
    expected = canonical.T[:, [1, 0, 1]]
    np.testing.assert_array_equal(out, expected)


def test_sliding_window_fix_starts_reference_math():
    from egovlpv2_tpu.data.sampling import sliding_window_fix_starts

    # vlen=100, nf=4: intervals linspace(0,100,5); upper=int(100/5)=20
    assert sliding_window_fix_starts(100, 4, 5) == [0, 5, 10, 15]
    # short video: reference arange is empty; we keep one zero-offset window
    assert sliding_window_fix_starts(3, 4, 5) == [0]
    # vlen < num_frames: acc = vlen
    assert sliding_window_fix_starts(10, 16, 2) == [0]


def test_pool_windows():
    from egovlpv2_tpu.tasks.retrieval import pool_windows

    v = np.array([[1.0, 0], [3.0, 0], [5.0, 2.0]], np.float32)
    t = np.array([[10.0], [10.0], [20.0]], np.float32)
    idx = np.array([7, 7, 3])
    vp, uniq, tp = pool_windows(v, idx, t)
    assert uniq.tolist() == [3, 7]
    np.testing.assert_allclose(vp, [[5.0, 2.0], [2.0, 0.0]])
    np.testing.assert_allclose(tp, [[20.0], [10.0]])


def test_charades_eval_pools_sliding_windows(setup):
    model, params, _ = setup
    rs = np.random.RandomState(3)
    ids = np.tile([[0, 5, 6, 2, 1, 1, 1, 1]], (3, 1)).astype(np.int32)
    mask = (ids != 1).astype(np.int32)
    video = rs.randn(4, 2, 32, 32, 3).astype(np.float32)
    # windows 0,1 belong to video 0; windows 2,3 to video 1
    batches_windows = [{
        "video": video,
        "target": np.array([[1, 0, 0], [1, 0, 0], [0, 1, 0], [0, 1, 0]],
                           np.float32),
        "idx": np.array([0, 0, 1, 1]),
    }]
    m = evaluate_charades(model, params, batches_windows, ids, mask)
    assert np.isfinite(m["mAP"])
    # pooling two identical windows must equal the single-window result
    same = video[[0, 0, 2, 2]]
    batches_dup = [{
        "video": same,
        "target": np.array([[1, 0, 0], [1, 0, 0], [0, 1, 0], [0, 1, 0]],
                           np.float32),
        "idx": np.array([0, 0, 1, 1]),
    }]
    batches_single = [{
        "video": video[[0, 2]],
        "target": np.array([[1, 0, 0], [0, 1, 0]], np.float32),
        "idx": np.array([0, 1]),
    }]
    m_dup = evaluate_charades(model, params, batches_dup, ids, mask)
    m_single = evaluate_charades(model, params, batches_single, ids, mask)
    assert abs(m_dup["mAP"] - m_single["mAP"]) < 1e-6


def test_epic_dataset_sliding_window_expansion(tmp_path):
    import cv2
    import pandas as pd

    from egovlpv2_tpu.data.datasets import EpicKitchensMIRDataset

    meta = pd.DataFrame([
        {"participant_id": "P01", "video_id": "P01_01", "start_frame": 1,
         "stop_frame": 61, "narration": "open door"},
    ])
    meta.to_csv(tmp_path / "EPIC_100_retrieval_test.csv", index=False)
    frame_dir = tmp_path / "P01" / "rgb_frames" / "P01_01"
    frame_dir.mkdir(parents=True)
    for i in range(1, 62):
        img = np.full((40, 40, 3), min(i * 4, 255), np.uint8)
        cv2.imwrite(str(frame_dir / ("frame_" + str(i).zfill(10) + ".jpg")), img)

    ds = EpicKitchensMIRDataset(str(tmp_path), str(tmp_path), split="test",
                                num_frames=4, input_res=32,
                                sliding_window_stride=5)
    # vlen=60 -> upper=int(60/5)=12 -> fix_starts 0,5,10
    assert len(ds) == 3
    items = [ds[i] for i in range(3)]
    # every window maps back to the same source row for eval pooling
    assert all(it["idx"] == 0 for it in items)
    assert items[0]["video"].shape == (4, 32, 32, 3)
    # different fix_start -> different frames sampled
    assert not np.allclose(items[0]["video"], items[1]["video"])
