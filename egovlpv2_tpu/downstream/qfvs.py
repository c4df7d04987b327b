"""QFVS: KTS kernel segmentation, summary scorer, bipartite-matching F1.

Capability-parity targets:
  * `QFVS/segment/cpd_auto.py` + `cpd_nonlin.py` — kernel temporal
    segmentation (KTS): DP over kernelized scatters with automatic
    change-point count selection. The reference's O(n^2) python loops are
    vectorized with numpy here;
  * `QFVS/model/model_summary.py` — 2-layer transformer encoder (d=768,
    nhead=2, post-LN torch TransformerEncoderLayer semantics) + sinusoidal
    positions + projector(768->8) + summ_head(8->1) over per-shot features;
  * `QFVS/runner_train.py:111-175` — per-sample masked BCEWithLogits over
    concept1/concept2/oracle scores;
  * `QFVS/semantic_evaluation.py:37-78` — shot-tag IoU weights + max-weight
    bipartite matching -> P/R/F1 (scipy linear_sum_assignment replaces
    networkx).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# ---------------- KTS ----------------


def calc_scatters(K: np.ndarray) -> np.ndarray:
    """Kernelized scatter of every segment [i, j] (cpd_nonlin.py:10-22),
    vectorized: scatters[i,j] = sum(diag K[i..j]) - blocksum(i..j)/(j-i+1)."""
    n = K.shape[0]
    K1 = np.concatenate([[0], np.cumsum(np.diag(K))])
    K2 = np.zeros((n + 1, n + 1))
    K2[1:, 1:] = np.cumsum(np.cumsum(K, 0), 1)
    i = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    diag_sum = K1[j + 1] - K1[i]
    block = K2[j + 1, j + 1] + K2[i, i] - K2[j + 1, i] - K2[i, j + 1]
    with np.errstate(divide="ignore", invalid="ignore"):
        scat = diag_sum - block / (j - i + 1)
    return np.where(j >= i, scat, 0.0)


def cpd_nonlin(
    K: np.ndarray,
    ncp: int,
    lmin: int = 1,
    lmax: int = 100000,
    backtrack: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """DP change-point detection (cpd_nonlin.py:24-96), inner loop vectorized."""
    m = int(ncp)
    n = K.shape[0]
    assert n >= (m + 1) * lmin and n <= (m + 1) * lmax
    J = calc_scatters(K)
    I = 1e101 * np.ones((m + 1, n + 1))
    I[0, lmin:lmax] = J[0, lmin - 1 : lmax - 1]
    p = np.zeros((m + 1, n + 1), dtype=int)

    for k in range(1, m + 1):
        for l in range((k + 1) * lmin, n + 1):
            lo = max(k * lmin, l - lmax)
            hi = l - lmin + 1
            c = I[k - 1, lo:hi] + J[lo:hi, l - 1]
            t = int(np.argmin(c))
            I[k, l] = c[t]
            p[k, l] = lo + t

    cps = np.zeros(m, dtype=int)
    if backtrack:
        cur = n
        for k in range(m, 0, -1):
            cps[k - 1] = p[k, cur]
            cur = cps[k - 1]
    scores = I[:, n].copy()
    scores[scores > 1e99] = np.inf
    return cps, scores


def cpd_auto(K: np.ndarray, ncp: int, vmax: float, desc_rate: int = 1, **kw):
    """Auto change-point count via penalized cost (cpd_auto.py:11-54)."""
    m = ncp
    _, scores = cpd_nonlin(K, m, backtrack=False, **kw)
    n = K.shape[0]
    n2 = n * desc_rate
    penalties = np.zeros(m + 1)
    ks = np.arange(1, m + 1)
    penalties[1:] = (vmax * ks / (2.0 * n2)) * (np.log(float(n2) / ks) + 1)
    costs = scores / float(n) + penalties
    m_best = int(np.argmin(costs))
    cps, _ = cpd_nonlin(K, m_best, **kw)
    return cps, costs


# ---------------- summary scorer ----------------


def sinusoid_positions(seq_len: int, dim: int) -> np.ndarray:
    pos = np.arange(seq_len)[:, None]
    i = np.arange(dim)[None, :]
    angle = pos / np.power(10000, (2 * (i // 2)) / dim)
    pe = np.zeros((seq_len, dim))
    pe[:, 0::2] = np.sin(angle[:, 0::2])
    pe[:, 1::2] = np.cos(angle[:, 1::2])
    return pe.astype(np.float32)


class TorchStyleEncoderLayer(nn.Module):
    """Post-LN nn.TransformerEncoderLayer equivalent (d_model, nhead,
    dim_feedforward=2048, relu)."""

    d_model: int
    nhead: int
    dim_ff: int = 2048
    drop: float = 0.1

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic=True):
        h = self.nhead
        dh = self.d_model // h
        q = nn.Dense(self.d_model, name="q")(x)
        k = nn.Dense(self.d_model, name="k")(x)
        v = nn.Dense(self.d_model, name="v")(x)

        def heads(t):
            b, s, _ = t.shape
            return t.reshape(b, s, h, dh).transpose(0, 2, 1, 3)

        logits = jnp.einsum("bhqd,bhkd->bhqk", heads(q), heads(k)) / np.sqrt(dh)
        if key_padding_mask is not None:  # True = masked out
            logits = jnp.where(key_padding_mask[:, None, None, :], -1e9, logits)
        probs = jax.nn.softmax(logits, axis=-1)
        att = jnp.einsum("bhqk,bhkd->bhqd", probs, heads(v))
        b, _, s, _ = att.shape
        att = att.transpose(0, 2, 1, 3).reshape(b, s, self.d_model)
        att = nn.Dense(self.d_model, name="out")(att)
        att = nn.Dropout(self.drop)(att, deterministic=deterministic)
        x = nn.LayerNorm(name="norm1")(x + att)
        ff = nn.Dense(self.dim_ff, name="ff1")(x)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.drop)(ff, deterministic=deterministic)
        ff = nn.Dense(self.d_model, name="ff2")(ff)
        ff = nn.Dropout(self.drop)(ff, deterministic=deterministic)
        return nn.LayerNorm(name="norm2")(x + ff)


class SummaryScorer(nn.Module):
    """Per-shot summary scores (model_summary.py:35-80).

    Input: [B, max_segments, max_shots, D] fused shot features + seg_len
    [B, max_segments]; output [B, max_segments, max_shots] logits.
    """

    d_model: int = 768
    nhead: int = 2
    num_layers: int = 2

    @nn.compact
    def __call__(self, feats, seg_len, deterministic=True):
        b, n_seg, n_shot, d = feats.shape
        x = feats.reshape(b * n_seg, n_shot, d)
        pe = jnp.asarray(sinusoid_positions(n_shot, self.d_model))
        x = x + pe[None]
        pad = jnp.arange(n_shot)[None, :] >= seg_len.reshape(-1)[:, None]
        for i in range(self.num_layers):
            x = TorchStyleEncoderLayer(
                self.d_model, self.nhead, name=f"layer_{i}"
            )(x, key_padding_mask=pad, deterministic=deterministic)
        x = nn.Dense(8, name="projector_1")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.2)(x, deterministic=deterministic)
        x = nn.Dense(1, name="summ_head")(x)[..., 0]
        return x.reshape(b, n_seg, n_shot)


def qfvs_bce_loss(logits, targets, mask):
    """Masked BCEWithLogits summed over samples (runner_train.py:147-166)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    per = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    per_sample = jnp.sum(per * mask, axis=(1, 2)) / jnp.maximum(
        jnp.sum(mask, axis=(1, 2)), 1.0
    )
    return jnp.sum(per_sample)


# ---------------- semantic evaluation ----------------


def semantic_iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise IoU of binary concept-tag vectors."""
    inter = a @ b.T
    union = (a[:, None, :] + b[None, :, :] > 0).sum(-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(union > 0, inter / union, 0.0)
    return out


def semantic_matching_f1(
    machine_shots: Sequence[int],
    gt_shots: Sequence[int],
    shots_tag: np.ndarray,
) -> Tuple[float, float, float]:
    """Max-weight bipartite matching F1 (semantic_evaluation.py:60-78);
    scipy's linear_sum_assignment replaces networkx."""
    from scipy.optimize import linear_sum_assignment

    m = shots_tag[np.asarray(machine_shots, int)]
    g = shots_tag[np.asarray(gt_shots, int)]
    w = semantic_iou_matrix(m.astype(np.float64), g.astype(np.float64))
    rows, cols = linear_sum_assignment(-w)
    total = w[rows, cols].sum()
    precision = total / m.shape[0]
    recall = total / g.shape[0]
    f1 = 0.0 if precision + recall == 0 else 2 * precision * recall / (precision + recall)
    return float(precision), float(recall), float(f1)


def top_percent_shots(scores: np.ndarray, mask: np.ndarray, top_percent: float):
    """Select the top-p% shots by score over valid positions (the reference
    selects top 2% for the final summary, runner_train.py:207-226)."""
    flat_scores = scores[mask.astype(bool)]
    n_total = int(mask.sum())
    k = max(int(round(n_total * top_percent)), 1)
    order = np.argsort(-flat_scores)
    # map back to (segment, shot) -> global shot index = cumulative position
    sel = np.zeros(n_total, dtype=bool)
    sel[order[:k]] = True
    return np.nonzero(sel)[0]
