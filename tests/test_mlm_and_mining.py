"""MLM collator statistics + ITM mining semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from egovlpv2_tpu.data.mlm import mask_tokens
from egovlpv2_tpu.objectives.itm_mining import mine_itm_indices


def test_mlm_collator_stats():
    rng = np.random.default_rng(0)
    ids = rng.integers(4, 50264, (2000, 15))
    ids[:, 0] = 0
    ids[:, -1] = 2
    mlm_ids, labels = mask_tokens(ids, rng)
    # specials never masked
    assert (labels[:, 0] == -100).all() and (labels[:, -1] == -100).all()
    masked = labels != -100
    frac = masked.mean()
    assert 0.12 < frac < 0.16  # ~15% of the 13/15 non-special positions
    changed_to_mask = (mlm_ids == 50264) & masked
    assert 0.75 < changed_to_mask.sum() / masked.sum() < 0.85  # ~80%
    kept = (mlm_ids == ids) & masked
    assert 0.06 < kept.sum() / masked.sum() < 0.16  # ~10% (+ random==orig)
    # labels hold original token ids at masked positions
    np.testing.assert_array_equal(labels[masked], ids[masked])
    # untouched positions unchanged
    np.testing.assert_array_equal(mlm_ids[~masked & (ids != 50264)][:100],
                                  ids[~masked & (ids != 50264)][:100])


def test_itm_mining_semantics():
    b = 64
    rs = np.random.RandomState(0)
    sim = jnp.asarray(rs.rand(b, b) * 2 - 1)
    mask_bool = jnp.asarray(np.eye(b, dtype=bool))
    idx = mine_itm_indices(jax.random.PRNGKey(0), sim, mask_bool, 0.05)
    labels = np.asarray(idx.labels)
    vi, ti = np.asarray(idx.video_idx), np.asarray(idx.text_idx)
    own = np.arange(b)
    # exactly floor(b/2) positives
    assert labels.sum() == b // 2
    # positives keep their own pair
    np.testing.assert_array_equal(vi[labels == 1], own[labels == 1])
    np.testing.assert_array_equal(ti[labels == 1], own[labels == 1])
    # negatives replace exactly one side
    neg = labels == 0
    video_swapped = vi[neg] != own[neg]
    text_swapped = ti[neg] != own[neg]
    assert np.all(video_swapped ^ text_swapped)
    # the mined index is never the own pair (diagonal masked out)
    assert np.all(vi[neg][video_swapped] != own[neg][video_swapped])


def test_itm_mining_prefers_hard_negatives():
    """With one dominating off-diagonal similarity, mining should pick it."""
    b = 8
    sim = np.full((b, b), -1.0)
    np.fill_diagonal(sim, 1.0)
    sim[0, 3] = 0.99  # text 0 is very similar to video 3
    sim[5, 0] = 0.99
    mask_bool = jnp.asarray(np.eye(b, dtype=bool))
    counts = np.zeros(b)
    for s in range(50):
        idx = mine_itm_indices(jax.random.PRNGKey(s), jnp.asarray(sim), mask_bool, 0.05)
        labels = np.asarray(idx.labels)
        ti = np.asarray(idx.text_idx)
        # when video row 0 swaps its text, it should nearly always pick text 3
        if labels[0] == 0 and ti[0] != 0:
            counts[ti[0]] += 1
    assert counts[3] >= 0.9 * counts.sum()
