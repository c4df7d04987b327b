"""Statistical test that ITM hard-negative mining matches the reference's
sampling distribution (EgoVLPv2/model/model.py:438-468), not just mechanics.

The reference, per batch row with itm_label == 0:
  * a fair host coin picks the direction (np.random.rand() > 0.5 -> replace
    the video, else replace the text)  (model.py:459-468);
  * the replacement index is torch.multinomial(weights + 1e-9, 1) where
    weights are the temperature-softmaxed similarity row with EgoNCE
    positives masked to zero  (model.py:443-447,460,465);
  * positives (floor(B/2) of the batch, shuffled) keep their own pair.

mine_itm_indices replicates those semantics with on-device RNG. This test
draws many seeded batches and checks the empirical distributions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egovlpv2_tpu.objectives.itm_mining import mine_itm_indices

B = 8
TEMP = 0.05
N_DRAWS = 4000


@pytest.fixture(scope="module")
def mined():
    rs = np.random.RandomState(0)
    sim = jnp.asarray(rs.randn(B, B).astype(np.float32) * 0.2)
    # EgoNCE positive mask: diagonal plus one scene-positive pair (2, 5)
    mask = np.eye(B, dtype=bool)
    mask[2, 5] = mask[5, 2] = True
    mask_bool = jnp.asarray(mask)

    keys = jax.random.split(jax.random.PRNGKey(7), N_DRAWS)
    idx = jax.vmap(lambda k: mine_itm_indices(k, sim, mask_bool, TEMP))(keys)
    video_idx = np.asarray(idx.video_idx)
    text_idx = np.asarray(idx.text_idx)
    labels = np.asarray(idx.labels)

    sim_np = np.asarray(sim, np.float64)
    w_t2v = _masked_softmax(sim_np.T / TEMP, mask)  # video replacement weights
    w_v2t = _masked_softmax(sim_np / TEMP, mask)  # text replacement weights
    return video_idx, text_idx, labels, mask, w_t2v, w_v2t


def _masked_softmax(logits, mask):
    w = np.exp(logits - logits.max(axis=1, keepdims=True))
    w /= w.sum(axis=1, keepdims=True)
    w[mask] = 0.0
    w += 1e-9  # the reference's multinomial(w + 1e-9)
    return w / w.sum(axis=1, keepdims=True)


def test_positive_fraction_exact(mined):
    """Every draw has exactly floor(B/2) positives (model.py:434-437)."""
    _, _, labels, *_ = mined
    assert labels.shape == (N_DRAWS, B)
    np.testing.assert_array_equal(labels.sum(axis=1), B // 2)


def test_positives_keep_own_pair(mined):
    video_idx, text_idx, labels, *_ = mined
    own = np.arange(B)
    pos = labels == 1
    assert (video_idx[pos] == np.broadcast_to(own, labels.shape)[pos]).all()
    assert (text_idx[pos] == np.broadcast_to(own, labels.shape)[pos]).all()


def test_negatives_replace_exactly_one_side(mined):
    video_idx, text_idx, labels, *_ = mined
    own = np.broadcast_to(np.arange(B), labels.shape)
    neg = labels == 0
    video_swapped = video_idx[neg] != own[neg]
    text_swapped = text_idx[neg] != own[neg]
    # never both (one coin, two branches)
    assert not (video_swapped & text_swapped).any()
    # direction coin is fair: P(video side) ~ 0.5.  NOTE: a self-draw from the
    # multinomial is impossible (positives are masked), so "swapped" exactly
    # identifies the branch.
    frac_video = video_swapped.mean()
    assert abs(frac_video - 0.5) < 0.02, frac_video


def test_egonce_positives_never_mined(mined):
    """Masked entries (diagonal + scene positives) have zero sampling weight."""
    video_idx, text_idx, labels, mask, *_ = mined
    neg = labels == 0
    rows = np.broadcast_to(np.arange(B), labels.shape)
    # row i's video replacement must avoid mask[i, :] columns
    v_swapped = neg & (video_idx != rows)
    assert not mask[rows[v_swapped], video_idx[v_swapped]].any()
    t_swapped = neg & (text_idx != rows)
    assert not mask[rows[t_swapped], text_idx[t_swapped]].any()


@pytest.mark.parametrize("side", ["video", "text"])
def test_mined_negatives_follow_masked_softmax(mined, side):
    """Chi-squared-style check: the empirical replacement histogram per row
    matches the temperature-softmaxed, positive-masked similarity weights."""
    video_idx, text_idx, labels, mask, w_t2v, w_v2t = mined
    idx = video_idx if side == "video" else text_idx
    w = w_t2v if side == "video" else w_v2t
    rows = np.broadcast_to(np.arange(B), labels.shape)
    swapped = (labels == 0) & (idx != rows)
    for i in range(B):
        draws = idx[swapped & (rows == i)]
        if len(draws) < 300:
            continue
        counts = np.bincount(draws, minlength=B).astype(np.float64)
        expected = w[i] * len(draws)
        # Pearson chi-squared over the unmasked support
        support = expected > 1.0
        chi2 = ((counts[support] - expected[support]) ** 2
                / expected[support]).sum()
        dof = support.sum() - 1
        # 99.9th percentile of chi2 with dof<=7 is < 25; be generous
        assert chi2 < 40.0, (side, i, chi2, counts, expected)
