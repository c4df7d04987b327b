"""VSGN temporal action detection head for EgoMQ (JAX/flax).

Capability-parity targets (all under `EgoMQ/Models/`):
  * XGPN.py — conv0 + encoder pyramid (stride-2 xGN blocks) + transposed-conv
    decoder with lateral connections;
  * GCNs.py — xGN = temporal conv branch + NeighConv graph conv over kNN
    (feature-distance) neighbors, incl. the VSS stitched-video neighbor
    rewrite expressed here with masks instead of per-sample loops;
  * Head.py — shared cls/reg towers (conv + GroupNorm(32) + ReLU) with
    per-level anchor logits;
  * AnchorGenerator.py / BoxCoder.py — 1-D anchors per pyramid level,
    (dx, dw)-style encode/decode with (10, 5) weights;
  * matcher.py / Loss.py — IoU argmax matching with low-quality recovery,
    pos/neg-balanced CE + GIoU regression, weighted-BCE supplement scores;
  * BoundaryAdjust.py — second-stage start/end offsets from frame-level
    features at (left, center, right) boundary probes.

XLA notes: everything is static-shape; variable gt counts are handled with
validity masks; boolean-index reductions become where()+sum.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# ---------------- anchors ----------------


def make_anchors(
    temporal_scale: int,
    num_levels: int,
    anchor_scales: Sequence[float],
    base_stride: int = 1,
) -> List[np.ndarray]:
    """Per-level [positions*scales, 2] anchors (AnchorGenerator.py:12-66)."""
    out = []
    for lvl in range(num_levels):
        stride = base_stride * (2 ** lvl)
        base = np.array([1.0, stride]) - 0.5
        length = base[1] - base[0] + 1
        center = base[0] + 0.5 * (length - 1)
        ws = length * np.asarray(anchor_scales, np.float32)
        base_anchors = np.stack(
            [center - 0.5 * (ws - 1), center + 0.5 * (ws - 1)], axis=1
        )  # [S, 2]
        size = math.ceil(temporal_scale / stride)
        shifts = np.arange(0, size * stride, step=stride, dtype=np.float32)
        shifts = np.stack([shifts, shifts], axis=1)  # [P, 2]
        anchors = (shifts[:, None, :] + base_anchors[None]).reshape(-1, 2)
        out.append(anchors.astype(np.float32))
    return out


def box_encode(gt: jax.Array, anchors: jax.Array) -> jax.Array:
    """(dx, dw) encode with weights (10, 5) (BoxCoder.py:encode)."""
    ex_len = anchors[:, 1] - anchors[:, 0] + 1
    ex_ctr = (anchors[:, 1] + anchors[:, 0]) / 2
    gt_len = gt[:, 1] - gt[:, 0] + 1
    gt_ctr = (gt[:, 1] + gt[:, 0]) / 2
    dx = 10.0 * (gt_ctr - ex_ctr) / ex_len
    dw = 5.0 * jnp.log(jnp.maximum(gt_len / ex_len, 1e-8))
    return jnp.stack([dx, dw], axis=1)


def box_decode(preds: jax.Array, anchors: jax.Array) -> jax.Array:
    ex_len = anchors[:, 1] - anchors[:, 0] + 1
    ex_ctr = (anchors[:, 1] + anchors[:, 0]) / 2
    dx = preds[:, 0] / 10.0
    dw = jnp.minimum(preds[:, 1] / 5.0, math.log(1000.0 / 16))
    ctr = dx * ex_len + ex_ctr
    w = jnp.exp(dw) * ex_len
    return jnp.stack([ctr - 0.5 * (w - 1), ctr + 0.5 * (w - 1)], axis=1)


# ---------------- matching ----------------


def iou_anchors_gts(anchors: jax.Array, gts: jax.Array) -> jax.Array:
    """[A, 2] x [G, 2] -> [A, G] (Loss.py:_iou_anchors_gts; note the +1
    length convention)."""
    a_min, a_max = anchors[:, 0], anchors[:, 1]
    len_a = a_max - a_min + 1
    inter_min = jnp.maximum(a_min[:, None], gts[None, :, 0])
    inter_max = jnp.minimum(a_max[:, None], gts[None, :, 1])
    inter = jnp.clip(inter_max - inter_min, 0)
    union = jnp.clip(len_a[:, None] + gts[None, :, 1] - gts[None, :, 0] - inter, 0)
    return inter / jnp.maximum(union, 1e-8)


def match_anchors(
    iou: jax.Array,  # [A, G]
    gt_valid: jax.Array,  # [G] bool
    iou_thr: float,
    allow_low_quality: bool = True,
) -> jax.Array:
    """Per-anchor matched gt index or -1 (matcher.py semantics)."""
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    matched_vals = jnp.max(iou, axis=1)
    matches_all = jnp.argmax(iou, axis=1)
    matches = jnp.where(matched_vals < iou_thr, -1, matches_all)
    if allow_low_quality:
        highest_per_gt = jnp.max(iou, axis=0)  # [G]
        is_top = jnp.any(
            (iou == highest_per_gt[None, :]) & gt_valid[None, :] &
            (highest_per_gt[None, :] > 0), axis=1,
        )
        matches = jnp.where(is_top, matches_all, matches)
    return matches


def prepare_targets(
    gt_bbox: jax.Array,  # [B, Gmax, 3] (start, end in [0,1], label)
    num_gt: jax.Array,  # [B]
    anchors: jax.Array,  # [A, 2]
    temporal_scale: float,
    iou_thr: float,
) -> Tuple[jax.Array, jax.Array]:
    """-> cls labels [B, A] (0 = bg), reg targets [B, A, 2] (Loss.py:142-172)."""

    def one(gt, n):
        gts = gt[:, :2] * temporal_scale
        labels = gt[:, 2]
        valid = jnp.arange(gt.shape[0]) < n
        iou = iou_anchors_gts(anchors, gts)
        matched = match_anchors(iou, valid, iou_thr)
        cls = jnp.where(matched < 0, 0.0, labels[jnp.maximum(matched, 0)])
        reg = box_encode(gts[jnp.maximum(matched, 0)], anchors)
        return cls.astype(jnp.int32), reg

    return jax.vmap(one)(gt_bbox, num_gt)


# ---------------- losses ----------------


def balanced_ce_loss(cls_pred: jax.Array, cls_labels: jax.Array) -> jax.Array:
    """pos-mean + neg-mean CE (Loss.py:86-104)."""
    logp = jax.nn.log_softmax(cls_pred.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, cls_labels[:, None], axis=1)[:, 0]
    pmask = (cls_labels > 0).astype(jnp.float32)
    nmask = (cls_labels == 0).astype(jnp.float32)
    pos = jnp.sum(ce * pmask) / jnp.maximum(jnp.sum(pmask), 1.0)
    neg = jnp.sum(ce * nmask) / jnp.maximum(jnp.sum(nmask), 1.0)
    return pos + neg


def giou_loss(
    pred_boxes: jax.Array, target_boxes: jax.Array, weights: jax.Array
) -> jax.Array:
    """sum of (1 - GIoU) over weighted rows / sum(weights) (Loss.py:106-139)."""
    p1 = jnp.minimum(pred_boxes[:, 0], pred_boxes[:, 1])
    p2 = jnp.maximum(pred_boxes[:, 0], pred_boxes[:, 1])
    t1, t2 = target_boxes[:, 0], target_boxes[:, 1]
    inter = jnp.clip(jnp.minimum(p2, t2) - jnp.maximum(p1, t1), 0)
    enclosing = jnp.maximum(p2, t2) - jnp.minimum(p1, t1) + 1e-7
    union = (p2 - p1) + (t2 - t1) - inter + 1e-7
    giou = inter / union - (enclosing - union) / enclosing
    return jnp.sum((1.0 - giou) * weights) / jnp.maximum(jnp.sum(weights), 1.0)


def weighted_bi_loss(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Class-balanced BCE on sigmoid scores (Loss.py:175-192)."""
    gt = gt.reshape(-1)
    pred = pred.reshape(-1)
    pmask = (gt > 0.5).astype(jnp.float32)
    num_pos = jnp.maximum(jnp.sum(pmask), 1.0)
    ratio = gt.shape[0] / num_pos
    coef_0 = 0.5 * ratio / jnp.maximum(ratio - 1, 1e-5)
    coef_1 = coef_0 * (ratio - 1)
    loss = coef_1 * pmask * jnp.log(pred + 1e-5) + \
        coef_0 * (1.0 - pmask) * jnp.log(1.0 - pred + 1e-5)
    return -jnp.mean(loss)


# ---------------- modules ----------------


class NeighConv(nn.Module):
    """Graph conv over kNN neighbors (GCNs.py:53-90), feat_ctr mode +
    edge weights + max aggregation (the reference defaults)."""

    out_features: int
    num_neigh: int = 10
    nfeat_mode: str = "feat_ctr"
    agg_type: str = "max"
    edge_weight: bool = True

    @nn.compact
    def __call__(self, feats: jax.Array, neigh_idx: jax.Array) -> jax.Array:
        """feats [B, T, C]; neigh_idx [B, T, K] into T."""
        nb = jnp.take_along_axis(
            feats[:, :, None, :], neigh_idx[..., None], axis=1
        )  # [B, T, K, C]
        ctr = jnp.broadcast_to(feats[:, :, None, :], nb.shape)
        if self.nfeat_mode == "feat_ctr":
            x = jnp.concatenate([nb, ctr], axis=-1)
        elif self.nfeat_mode == "dif_ctr":
            x = jnp.concatenate([nb - ctr, ctr], axis=-1)
        else:
            x = nb
        out = nn.Dense(self.out_features, name="mlp")(x)  # [B, T, K, C']
        if self.edge_weight:
            num = jnp.einsum("btkc,btc->btk", nb, feats)
            den = (
                jnp.linalg.norm(nb, axis=-1) *
                jnp.linalg.norm(feats, axis=-1)[:, :, None]
            )
            w = num / jnp.maximum(den, 1e-8)
            out = out * w[..., None]
        if self.agg_type == "max":
            return jnp.max(out, axis=2)
        return jnp.mean(out, axis=2)


def knn_indices(
    feats: jax.Array,  # [B, T, C]
    k: int,
    num_frms: Optional[jax.Array] = None,
    temporal_scale: Optional[int] = None,
    stitch_gap: int = 30,
    short_ratio: float = 0.4,
    use_vss: bool = False,
) -> jax.Array:
    """kNN by squared feature distance (GCNs.py:13-41). With use_vss, short
    stitched videos re-pick the second half of the neighbors outside the
    first-stage picks and outside the beyond-video region — expressed with
    masks rather than per-sample index surgery."""
    dif = jnp.sum(
        (feats[:, :, None, :] - feats[:, None, :, :]) ** 2, axis=-1
    )  # [B, T, T]
    t = feats.shape[1]
    _, idx_org = jax.lax.top_k(-dif, k)  # smallest distances
    if not use_vss or num_frms is None:
        return idx_org

    max_dif = jnp.max(dif)
    ratio = temporal_scale / t
    half1 = k // 2
    half2 = k - half1
    thr = ((num_frms + stitch_gap) / ratio).astype(jnp.int32)  # [B]
    is_short = num_frms <= (short_ratio * temporal_scale)
    pos = jnp.arange(t)
    beyond = (pos[None, :, None] >= thr[:, None, None]) & \
             (pos[None, None, :] >= thr[:, None, None])  # [B, T, T]
    taken = jax.nn.one_hot(idx_org[..., :half1], t, dtype=bool).any(axis=2)  # [B,T,T]
    dif2 = jnp.where(beyond | taken, max_dif + 1, dif)
    _, idx_new_half2 = jax.lax.top_k(-dif2, half2)
    idx_new = jnp.concatenate([idx_org[..., :half1], idx_new_half2], axis=-1)
    return jnp.where(is_short[:, None, None], idx_new, idx_org)


class XGN(nn.Module):
    """Temporal conv + parallel graph conv + optional stride-2 maxpool
    (GCNs.py:92-130, gcn_insert='par')."""

    out_channels: int
    stride: int = 2
    num_neigh: int = 10
    use_vss: bool = False
    temporal_scale: int = 928
    stitch_gap: int = 30
    short_ratio: float = 0.4

    @nn.compact
    def __call__(self, x: jax.Array, num_frms: Optional[jax.Array] = None):
        # x: [B, T, C] channels-last
        c_out = nn.Conv(self.out_channels, (3,), padding="SAME", name="tconv1")(x)
        idx = knn_indices(
            x, self.num_neigh, num_frms, self.temporal_scale,
            self.stitch_gap, self.short_ratio, self.use_vss,
        )
        g_out = NeighConv(self.out_channels, self.num_neigh, name="nconv1")(x, idx)
        out = nn.relu(c_out + g_out)
        if self.stride == 2:
            out = nn.max_pool(out, (2,), strides=(2,))
        return out


class ConvRelu(nn.Module):
    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        return nn.relu(nn.Conv(self.features, (self.kernel,), padding="SAME")(x))


class XGPN(nn.Module):
    """Encoder/decoder cross-scale pyramid (XGPN.py:12-108)."""

    hidden_dim: int = 256
    num_levels: int = 5
    use_xgpn: bool = True
    use_vss: bool = False
    temporal_scale: int = 928
    num_neigh: int = 10

    @nn.compact
    def __call__(self, x: jax.Array, num_frms: Optional[jax.Array] = None):
        x = ConvRelu(self.hidden_dim, name="conv0")(x)
        feats_enc = []
        for i in range(self.num_levels):
            stride = 1 if i == 0 else 2
            if self.use_xgpn:
                x = XGN(
                    self.hidden_dim, stride=stride, num_neigh=self.num_neigh,
                    use_vss=self.use_vss, temporal_scale=self.temporal_scale,
                    name=f"enc_{i}",
                )(x, num_frms)
            else:
                x = nn.relu(
                    nn.Conv(self.hidden_dim, (3,), strides=(stride,),
                            padding="SAME", name=f"enc_{i}")(x)
                )
            feats_enc.append(x)

        feats_dec = []
        y = ConvRelu(self.hidden_dim, name="lvl1_0")(feats_enc[-1])
        feats_dec.append(y)
        for i in range(self.num_levels - 1):
            ii = self.num_levels - i - 2
            lateral = ConvRelu(self.hidden_dim, name=f"lvl2_{i}")(feats_enc[ii])
            up = nn.relu(
                nn.ConvTranspose(
                    self.hidden_dim, (3,), strides=(2,), padding="SAME",
                    name=f"dec_{i}",
                )(y)
            )
            up = up[:, : lateral.shape[1]]
            y = ConvRelu(self.hidden_dim, name=f"lvl1_{i+1}")(lateral + up)
            feats_dec.append(y)
        return feats_enc, feats_dec


class DetectionHead(nn.Module):
    """Shared cls/reg towers over pyramid levels (Head.py)."""

    hidden_dim: int
    num_anchors: int
    num_classes: int
    num_convs: int = 1

    @nn.compact
    def __call__(self, feats: List[jax.Array]):
        cls_tower = [
            (nn.Conv(self.hidden_dim, (3,), padding="SAME", name=f"cls_conv_{i}"),
             nn.GroupNorm(num_groups=32, name=f"cls_gn_{i}"))
            for i in range(self.num_convs)
        ]
        box_tower = [
            (nn.Conv(self.hidden_dim, (3,), padding="SAME", name=f"box_conv_{i}"),
             nn.GroupNorm(num_groups=32, name=f"box_gn_{i}"))
            for i in range(self.num_convs)
        ]
        cls_logits = nn.Conv(self.num_anchors * self.num_classes, (3,),
                             padding="SAME", name="cls_logits")
        bbox_pred = nn.Conv(self.num_anchors * 2, (3,), padding="SAME",
                            name="bbox_pred")
        logits, regs = [], []
        for f in feats:
            c = f
            for conv, gn in cls_tower:
                c = nn.relu(gn(conv(c)))
            b = f
            for conv, gn in box_tower:
                b = nn.relu(gn(conv(b)))
            logits.append(cls_logits(c))  # [B, T_l, A*num_cls]
            regs.append(bbox_pred(b))  # [B, T_l, A*2]
        return logits, regs


def linear_resize(x: jax.Array, out_len: int) -> jax.Array:
    """1-D linear interpolation with align_corners=True (VSGN.py:88-90)."""
    in_len = x.shape[-1]
    pos = jnp.linspace(0.0, in_len - 1, out_len)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_len - 1)
    w = pos - lo
    return x[..., lo] * (1 - w) + x[..., hi] * w


class ScoreHead(nn.Module):
    hidden_dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Conv(self.hidden_dim, (3,), padding="SAME", name="conv1")(x))
        return jax.nn.sigmoid(nn.Conv(1, (1,), name="conv2")(h))[..., 0]


class BoundaryAdjust(nn.Module):
    """Second-stage offsets from 3-point boundary probes (BoundaryAdjust.py)."""

    hidden_dim: int
    temporal_scale: int
    base_stride: int = 1

    @nn.compact
    def __call__(self, loc_box: jax.Array, feat: jax.Array):
        """loc_box [B, N, 2] (feature coords); feat [B, T, C]."""
        beta = 8.0
        tmax = self.temporal_scale // self.base_stride - 1
        loc = jnp.clip(loc_box, 0.0, self.temporal_scale - 1)
        blen = (loc[:, :, 1] - loc[:, :, 0] + 1) / beta

        def gather(pos):
            idx = jnp.clip((pos / self.base_stride).astype(jnp.int32), 0, tmax)
            return jnp.take_along_axis(feat, idx[..., None], axis=1)  # [B, N, C]

        def probes(side):
            center = gather(loc[:, :, side])
            left = gather(loc[:, :, side] - blen)
            right = gather(loc[:, :, side] + blen)
            return jnp.stack([left, center, right], axis=2)  # [B, N, 3, C]

        def offset_net(name, x):
            h = nn.Conv(self.hidden_dim, (3,), padding="VALID",
                        name=f"{name}_conv1")(x.reshape(-1, 3, x.shape[-1]))
            h = nn.relu(h)
            o = nn.Conv(1, (1,), name=f"{name}_conv2")(h)
            return o.reshape(x.shape[0], x.shape[1])

        start_off = offset_net("start", probes(0))
        end_off = offset_net("end", probes(1))
        return start_off, end_off

    @staticmethod
    def update_bd(loc, start_off, end_off):
        return jnp.stack(
            [loc[:, :, 0] + start_off, loc[:, :, 1] + end_off], axis=2
        )


class VSGN(nn.Module):
    """Full VSGN detector (VSGN.py:17-108)."""

    input_feat_dim: int = 4096
    hidden_dim: int = 256
    num_levels: int = 5
    temporal_scale: int = 928
    anchor_scales: Tuple[float, ...] = (1.0, 10.0)
    num_classes: int = 111  # Ego4D MQ taxonomy + background
    use_xgpn: bool = True
    use_vss: bool = True
    base_stride: int = 1

    def setup(self):
        self.xgpn = XGPN(
            self.hidden_dim, self.num_levels, self.use_xgpn, self.use_vss,
            self.temporal_scale, name="xGPN",
        )
        self.head_dec = DetectionHead(
            self.hidden_dim, len(self.anchor_scales), self.num_classes,
            name="head_dec",
        )
        self.actionness = ScoreHead(self.hidden_dim, name="head_actionness")
        self.startness = ScoreHead(self.hidden_dim, name="head_startness")
        self.endness = ScoreHead(self.hidden_dim, name="head_endness")
        self.bd_adjust = BoundaryAdjust(
            self.hidden_dim, self.temporal_scale, self.base_stride,
            name="bd_adjust",
        )
        self.anchor_list = [
            jnp.asarray(a)
            for a in make_anchors(self.temporal_scale, self.num_levels,
                                  self.anchor_scales, self.base_stride)
        ]

    def __call__(self, x: jax.Array, num_frms: Optional[jax.Array] = None):
        """x: [B, T, C_in] -> dict of per-level predictions + scores.

        Level order of cls/reg follows the reference's reversed decoder
        (coarsest first after the flip at Loss.py:47-48), i.e. predictions
        here are already aligned with `self.anchor_list`.
        """
        feats_enc, feats_dec = self.xgpn(x, num_frms)
        cls_pred, reg_pred = self.head_dec(feats_dec)
        # decoder emits coarse->fine; reverse to match anchors (fine->coarse)
        cls_pred = cls_pred[::-1]
        reg_pred = reg_pred[::-1]

        frame_feat = feats_dec[-1]  # finest level, [B, T, C]
        t_in = x.shape[1]
        act = linear_resize(self.actionness(frame_feat)[:, None, :], t_in)[:, 0]
        start = linear_resize(self.startness(frame_feat)[:, None, :], t_in)[:, 0]
        end = linear_resize(self.endness(frame_feat)[:, None, :], t_in)[:, 0]

        # decode locations per level for stage-2 + inference
        b = x.shape[0]
        locs = []
        for pred, anchor in zip(reg_pred, self.anchor_list):
            p = pred.reshape(b, -1, len(self.anchor_scales), 2).reshape(-1, 2)
            a = jnp.broadcast_to(anchor[None], (b,) + anchor.shape).reshape(-1, 2)
            locs.append(box_decode(p, a).reshape(b, -1, 2))
        loc_dec = jnp.concatenate(locs, axis=1)  # [B, A_total, 2]

        start_off, end_off = self.bd_adjust(loc_dec, frame_feat)

        return {
            "cls_pred": cls_pred,
            "reg_pred": reg_pred,
            "loc_dec": loc_dec,
            "actionness": act,
            "startness": start,
            "endness": end,
            "start_offsets": start_off,
            "end_offsets": end_off,
        }

    def flat_anchors(self) -> jax.Array:
        return jnp.concatenate(self.anchor_list, axis=0)


def vsgn_losses(
    outputs: Dict[str, jax.Array],
    anchors: jax.Array,  # [A_total, 2]
    num_anchor_scales: int,
    num_classes: int,
    temporal_scale: float,
    gt_bbox: jax.Array,  # [B, Gmax, 3]
    num_gt: jax.Array,
    gt_action: jax.Array,
    gt_start: jax.Array,
    gt_end: jax.Array,
    iou_thr: Tuple[float, float] = (0.5, 0.5),
    stage2_iou_thr: float = 0.6,
) -> Dict[str, jax.Array]:
    """Total VSGN loss (VSGN.py:78-105 + Loss.py)."""
    b = gt_bbox.shape[0]
    cls_pred = jnp.concatenate(
        [c.reshape(b, -1, num_anchor_scales * num_classes) for c in
         outputs["cls_pred"]], axis=1,
    ).reshape(-1, num_classes)
    reg_pred = jnp.concatenate(
        [r.reshape(b, -1, num_anchor_scales * 2) for r in outputs["reg_pred"]],
        axis=1,
    ).reshape(-1, 2)

    cls_labels, reg_targets = prepare_targets(
        gt_bbox, num_gt, anchors, temporal_scale, iou_thr[0]
    )
    cls_labels = cls_labels.reshape(-1)
    reg_targets = reg_targets.reshape(-1, 2)
    all_anchors = jnp.broadcast_to(anchors[None], (b,) + anchors.shape).reshape(-1, 2)

    pos = (cls_labels > 0).astype(jnp.float32)
    loss_cls = balanced_ce_loss(cls_pred, cls_labels)
    pred_boxes = box_decode(reg_pred, all_anchors)
    target_boxes = box_decode(reg_targets, all_anchors)
    loss_reg = giou_loss(pred_boxes, target_boxes, pos)

    loss_action = weighted_bi_loss(outputs["actionness"], gt_action)
    loss_start = weighted_bi_loss(outputs["startness"], gt_start)
    loss_end = weighted_bi_loss(outputs["endness"], gt_end)

    # stage 2: boundary-adjusted boxes vs targets matched at higher IoU
    loc = outputs["loc_dec"]
    adjusted = BoundaryAdjust.update_bd(
        loc, outputs["start_offsets"], outputs["end_offsets"]
    ).reshape(-1, 2)
    cls2, reg2 = prepare_targets(gt_bbox, num_gt, anchors, temporal_scale,
                                 stage2_iou_thr)
    pos2 = (cls2.reshape(-1) > 0).astype(jnp.float32)
    tgt2 = box_decode(reg2.reshape(-1, 2), all_anchors)
    loss_bd = giou_loss(adjusted, tgt2, pos2)

    total = loss_cls + loss_reg + loss_action + loss_start + loss_end + loss_bd
    return {
        "loss_cls_dec": loss_cls,
        "loss_reg_dec": loss_reg,
        "loss_action": loss_action,
        "loss_start": loss_start,
        "loss_end": loss_end,
        "loss_bd_adjust": loss_bd,
        "loss_total": total,
    }
