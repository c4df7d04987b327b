"""Contrastive / matching / masked-LM objectives.

Capability-parity target: `EgoVLPv2/model/loss.py` plus the CE reductions in
`model/model.py:404-485`. All losses are pure jittable functions of global
(already mesh-gathered or GSPMD-sharded) arrays.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def egonce_loss(
    sim: jax.Array,
    sim_v: jax.Array,
    sim_n: jax.Array,
    temperature: float = 0.05,
    noun: bool = True,
    verb: bool = True,
) -> Tuple[jax.Array, jax.Array, float]:
    """EgoNCE (loss.py:33-61): scene-aware positives.

    Args:
      sim: [B, B] cosine similarity (rows = text, cols = video).
      sim_v / sim_n: [B, B] verb/noun multi-hot cosine similarities; a pair is
        an extra positive iff it shares a verb AND a noun.

    Returns (loss, mask_bool [B, B], temperature); mask_bool is reused by ITM
    hard-negative mining (model.py:446-447).
    """
    b = sim.shape[0]
    eye = jnp.eye(b, dtype=sim.dtype)
    if noun and verb:
        mask = sim_v * sim_n + eye
    elif noun:
        mask = sim_n + eye
    elif verb:
        mask = sim_v + eye
    else:
        mask = eye
    mask_bool = mask > 0

    i_sm = jax.nn.softmax(sim / temperature, axis=1)
    j_sm = jax.nn.softmax(sim.T / temperature, axis=1)
    loss_i = jnp.mean(jnp.log(jnp.sum(i_sm * mask_bool, axis=1)))
    loss_j = jnp.mean(jnp.log(jnp.sum(j_sm * mask_bool.T, axis=1)))
    return -loss_i - loss_j, mask_bool, temperature


def norm_softmax_loss(sim: jax.Array, temperature: float = 0.05) -> jax.Array:
    """Symmetric InfoNCE over the diagonal (loss.py:13-31)."""
    i_lsm = jax.nn.log_softmax(sim / temperature, axis=1)
    j_lsm = jax.nn.log_softmax(sim.T / temperature, axis=1)
    return -jnp.mean(jnp.diag(i_lsm)) - jnp.mean(jnp.diag(j_lsm))


def max_margin_loss(
    sim: jax.Array, margin: float = 0.2, weight: jax.Array | None = None,
    fix_norm: bool = True,
) -> jax.Array:
    """(Adaptive)MaxMarginRankingLoss (loss.py:65-143).

    With `weight` (per-row relevancy weights) this is the adaptive variant:
    hinge on w*margin - (pos - neg) over both directions, excluding the
    diagonal when fix_norm.
    """
    n = sim.shape[0]
    d = jnp.diag(sim)[:, None]  # positives, broadcast over columns
    w = jnp.ones((n,), sim.dtype) if weight is None else weight
    w = w[:, None]
    # direction 1: rows of sim vs row-diagonal; direction 2: sim.T
    h1 = jax.nn.relu(w * margin - (d - sim))
    h2 = jax.nn.relu(w * margin - (d - sim.T))
    if fix_norm:
        off = 1.0 - jnp.eye(n, dtype=sim.dtype)
        total = jnp.sum(h1 * off) + jnp.sum(h2 * off)
        count = 2.0 * n * (n - 1)
    else:
        total = jnp.sum(h1) + jnp.sum(h2)
        count = 2.0 * n * n
    return total / count


def masked_lm_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean CE over positions with label != -100 (model.py:414-418)."""
    vocab = logits.shape[-1]
    logits = logits.reshape(-1, vocab).astype(jnp.float32)
    labels = labels.reshape(-1)
    valid = labels != -100
    safe = jnp.where(valid, labels, 0)
    lse = jax.nn.logsumexp(logits, axis=-1)
    tgt = jnp.take_along_axis(logits, safe[:, None], axis=-1)[:, 0]
    ce = (lse - tgt) * valid
    return jnp.sum(ce) / jnp.maximum(jnp.sum(valid), 1)


def itm_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """CE over 2-way match logits (model.py:478)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1))


def cross_entropy_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Plain CE for classification heads (loss.py:145-151)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1))
