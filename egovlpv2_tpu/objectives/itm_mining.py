"""ITM hard-negative mining, expressed as global-batch jittable ops.

Capability-parity target: `EgoVLPv2/model/model.py:426-483`. The reference
mines per-rank with host randomness (np.random / torch.multinomial) over
gathered embeddings; here the same *semantics* are computed globally on
device (SURVEY.md §7 hard-part 4): per example, a fair coin picks the
direction, a categorical draw over the softmaxed similarity row (with EgoNCE
positives masked out) picks the hard negative, and positives keep their own
pair. Half the batch is positive (floor(B/2)), shuffled.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ITMIndices(NamedTuple):
    video_idx: jax.Array  # [B] which example's video to use
    text_idx: jax.Array  # [B] which example's text to use
    labels: jax.Array  # [B] 1 = matching pair, 0 = mined negative


def mine_itm_indices(
    rng: jax.Array,
    sim: jax.Array,  # [B, B] rows=text, cols=video (ret['sim_v2t'])
    mask_bool: jax.Array,  # [B, B] EgoNCE positive mask — excluded as negatives
    temperature: float,
) -> ITMIndices:
    b = sim.shape[0]
    r_perm, r_coin, r_t2v, r_v2t = jax.random.split(rng, 4)

    pos_len = b // 2
    labels = jnp.concatenate(
        [jnp.ones(pos_len, jnp.int32), jnp.zeros(b - pos_len, jnp.int32)]
    )
    labels = jax.random.permutation(r_perm, labels)

    sim = jax.lax.stop_gradient(sim.astype(jnp.float32))
    w_v2t = jax.nn.softmax(sim / temperature, axis=1)
    w_t2v = jax.nn.softmax(sim.T / temperature, axis=1)
    w_v2t = jnp.where(mask_bool, 0.0, w_v2t)
    w_t2v = jnp.where(mask_bool, 0.0, w_t2v)

    # categorical over log(w + 1e-9) == multinomial(w + 1e-9) (model.py:460,465)
    neg_video = jax.random.categorical(r_t2v, jnp.log(w_t2v + 1e-9), axis=-1)
    neg_text = jax.random.categorical(r_v2t, jnp.log(w_v2t + 1e-9), axis=-1)

    own = jnp.arange(b)
    coin = jax.random.bernoulli(r_coin, 0.5, (b,))  # np.random.rand() > 0.5
    is_pos = labels == 1
    video_idx = jnp.where(is_pos, own, jnp.where(coin, neg_video, own))
    text_idx = jnp.where(is_pos, own, jnp.where(coin, own, neg_text))
    return ITMIndices(video_idx, text_idx, labels)
