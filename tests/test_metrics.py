"""Metric goldens, incl. the reference's hand-computed nDCG fixture."""

import numpy as np

from egovlpv2_tpu.metrics.retrieval import (
    calculate_DCG,
    calculate_IDCG,
    calculate_k_counts,
    calculate_mAP,
    calculate_nDCG,
    charades_map,
    egomcq_accuracy,
    t2v_metrics,
    v2t_metrics,
)


def test_ndcg_golden_fixture():
    """Exact fixture from reference utils/nDCG.py:143-171."""
    sim = np.array([[1.0, 0.7, 0.4, 0.0], [0.3, 0.9, 0.6, 0.1], [0.2, 0.5, 0.8, 0.4]])
    rel = np.array([[1.0, 0.5, 0.25, 0.0], [0.0, 1.0, 0.4, 0.0], [0.5, 0.3, 1.0, 0.0]])
    k = np.array([[1, 1, 1, 0], [1, 1, 0, 0], [1, 1, 1, 0]])
    assert (k == calculate_k_counts(rel)).all()
    ndcg = calculate_nDCG(sim, rel, k)
    assert abs(ndcg - 0.9371789900735429) < 1e-12
    DCG = calculate_DCG(sim, rel, k)
    IDCG = calculate_IDCG(rel, k)
    assert abs(ndcg - np.mean(DCG / IDCG)) < 1e-12


def test_map_perfect_and_worst():
    rel = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    sim_perfect = rel.copy()
    assert calculate_mAP(sim_perfect, rel) == 1.0
    sim_worst = 1.0 - rel
    # relevant item retrieved last of 3 -> AP = 1/3
    assert abs(calculate_mAP(sim_worst, rel) - 1 / 3) < 1e-12


def test_t2v_identity():
    sims = np.eye(4) + 0.01 * np.random.RandomState(0).rand(4, 4)
    m = t2v_metrics(sims)
    assert m["R1"] == 100.0 and m["MedR"] == 1.0


def test_t2v_multiple_queries_per_video():
    # 4 queries over 2 videos; queries 0,1 -> video 0; 2,3 -> video 1
    sims = np.array(
        [[0.9, 0.1], [0.2, 0.8], [0.1, 0.9], [0.85, 0.3]], dtype=float
    )
    m = t2v_metrics(sims)
    # queries 1 and 3 rank their GT second
    assert m["R1"] == 50.0
    assert m["R5"] == 100.0


def test_v2t_best_caption():
    # 2 videos, 2 captions each (caps are rows of sims input: [caps, vids])
    sims = np.array(
        [[0.9, 0.0], [0.1, 0.2], [0.0, 0.95], [0.3, 0.1]], dtype=float
    )
    m = v2t_metrics(sims)
    assert m["R1"] == 100.0  # each video's best caption ranks first


def test_egomcq_accuracy():
    preds = np.array([[0.9, 0.1, 0, 0, 0], [0, 0, 0.8, 0.1, 0], [0.2, 0.3, 0.1, 0.2, 0.2]])
    labels = np.array([0, 2, 0])
    types = np.array([1, 1, 2])
    m = egomcq_accuracy(preds, labels, types)
    assert m["Inter-video"] == 100.0
    assert m["Intra-video"] == 0.0


def test_charades_map():
    gt = np.array([[1, 0], [0, 1], [1, 1], [0, 0]])
    sub = np.array([[0.9, 0.1], [0.1, 0.8], [0.8, 0.7], [0.0, 0.0]], dtype=float)
    m = charades_map(sub, gt)
    assert 0.99 < m["mAP"] <= 1.0  # perfect ranking for both classes
