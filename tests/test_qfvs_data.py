"""QFVS dataset adapter with synthetic oracle/tags files."""

import numpy as np

from egovlpv2_tpu.downstream.qfvs_data import QFVSDataset, pack_shot_features


def test_qfvs_dataset(tmp_path):
    vid = "1"
    od = tmp_path / "oracle" / "P01"
    td = tmp_path / "tags" / "P01"
    od.mkdir(parents=True)
    td.mkdir(parents=True)
    (od / "Car_Tree_oracle.txt").write_text("1\n3\n")
    (td / "P01.txt").write_text("Car,Sky\nTree\nCar,Tree\nSky\n")

    feats = {
        "1": {
            "seg_len": np.array([3, 1] + [0] * 18),
            "feat_concept1": np.zeros((20, 5, 8), np.float32),
            "feat_concept2": np.zeros((20, 5, 8), np.float32),
            "feat_oracle": np.zeros((20, 5, 8), np.float32),
        }
    }
    ds = QFVSDataset(str(tmp_path / "oracle"), str(tmp_path / "tags"), [1],
                     feats, max_segment_num=20, max_frame_num=5)
    assert len(ds) == 1
    item = ds[0]
    c1 = item["concept1_GT"].reshape(-1)
    np.testing.assert_array_equal(c1[:4], [1, 0, 1, 0])  # Car in lines 1,3
    c2 = item["concept2_GT"].reshape(-1)
    np.testing.assert_array_equal(c2[:4], [0, 1, 1, 0])  # Tree in lines 2,3
    oracle = item["oracle_GT"].reshape(-1)
    np.testing.assert_array_equal(oracle[:4], [1, 0, 1, 0])  # shots 1,3 (1-idx)
    assert item["mask_GT"][:4].sum() == 4  # shot_num = 3 + 1
    assert item["prompts"][2] == "There is a Car and a Tree"


def test_prompt_transfer():
    p1, p2, pq = QFVSDataset.prompts("Cupglass", "Petsanimal")
    assert p1 == "There is a Glass"
    assert p2 == "There is a Animal"


def test_pack_shot_features():
    feats = np.arange(24, dtype=np.float32).reshape(6, 4)
    packed, seg_len = pack_shot_features(feats, [2, 4], max_segment_num=4,
                                         max_frame_num=3)
    np.testing.assert_array_equal(seg_len, [2, 2, 2, 0])
    np.testing.assert_array_equal(packed[0, :2], feats[0:2])
    np.testing.assert_array_equal(packed[1, :2], feats[2:4])
    np.testing.assert_array_equal(packed[2, :2], feats[4:6])
