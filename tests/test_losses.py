"""Loss goldens vs small hand/naive computations (reference loss.py parity)."""

import numpy as np
import jax.numpy as jnp

from egovlpv2_tpu.objectives.losses import (
    cross_entropy_loss,
    egonce_loss,
    itm_loss,
    masked_lm_loss,
    max_margin_loss,
    norm_softmax_loss,
)


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def test_norm_softmax_matches_naive():
    rs = np.random.RandomState(0)
    sim = rs.rand(4, 4) * 2 - 1
    t = 0.05
    i = np.log(_softmax(sim / t, axis=1))
    j = np.log(_softmax(sim.T / t, axis=1))
    ref = -np.mean(np.diag(i)) - np.mean(np.diag(j))
    got = float(norm_softmax_loss(jnp.asarray(sim), temperature=t))
    assert abs(got - ref) < 1e-5


def test_egonce_matches_naive():
    rs = np.random.RandomState(1)
    b = 6
    sim = rs.rand(b, b) * 2 - 1
    # multi-hot noun/verb similarity masks (symmetric)
    nv = rs.rand(b, b)
    nv = (nv + nv.T) / 2
    vv = rs.rand(b, b)
    vv = (vv + vv.T) / 2
    nv[nv < 0.5] = 0
    vv[vv < 0.5] = 0
    mask = vv * nv + np.eye(b)
    mask_bool = mask > 0
    t = 0.05
    i_sm = _softmax(sim / t, axis=1)
    j_sm = _softmax(sim.T / t, axis=1)
    ref = -(np.mean(np.log(np.sum(i_sm * mask_bool, axis=1)))
            + np.mean(np.log(np.sum(j_sm * mask_bool, axis=1))))
    got, got_mask, temp = egonce_loss(jnp.asarray(sim), jnp.asarray(vv), jnp.asarray(nv))
    assert abs(float(got) - ref) < 1e-4
    np.testing.assert_array_equal(np.asarray(got_mask), mask_bool)
    assert temp == t


def test_max_margin_matches_naive():
    """Naive loop reimplementation of MaxMarginRankingLoss (loss.py:65-100)."""
    rs = np.random.RandomState(2)
    n = 5
    x = rs.rand(n, n) * 2 - 1
    margin = 0.2
    vals = []
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            vals.append(max(0.0, margin - (x[i, i] - x[i, j])))  # row direction
            vals.append(max(0.0, margin - (x[i, i] - x[j, i])))  # col direction
    ref = np.mean(vals)
    got = float(max_margin_loss(jnp.asarray(x), margin=margin))
    assert abs(got - ref) < 1e-6


def test_adaptive_max_margin_weighting():
    rs = np.random.RandomState(3)
    n = 4
    x = rs.rand(n, n)
    w = rs.rand(n)
    margin = 0.4
    vals = []
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            vals.append(max(0.0, w[i] * margin - (x[i, i] - x[i, j])))
            vals.append(max(0.0, w[i] * margin - (x[i, i] - x[j, i])))
    ref = np.mean(vals)
    got = float(max_margin_loss(jnp.asarray(x), margin=margin, weight=jnp.asarray(w)))
    assert abs(got - ref) < 1e-6


def test_masked_lm_ignores_minus100():
    logits = jnp.asarray(np.random.RandomState(4).randn(2, 3, 7))
    labels = jnp.asarray([[1, -100, 3], [-100, -100, 0]])
    got = float(masked_lm_loss(logits, labels))
    lp = np.log(_softmax(np.asarray(logits), axis=-1))
    ref = -(lp[0, 0, 1] + lp[0, 2, 3] + lp[1, 2, 0]) / 3
    assert abs(got - ref) < 1e-5


def test_itm_and_ce():
    logits = jnp.asarray([[2.0, 0.0], [0.0, 3.0]])
    labels = jnp.asarray([0, 1])
    lp = np.log(_softmax(np.asarray(logits), axis=-1))
    ref = -(lp[0, 0] + lp[1, 1]) / 2
    assert abs(float(itm_loss(logits, labels)) - ref) < 1e-5
    assert abs(float(cross_entropy_loss(logits, labels)) - ref) < 1e-5
