"""AdamW with the reference's 6 parameter groups + warmup schedules.

Capability-parity target: `EgoVLPv2/set_optim_schedule.py:16-129`. Groups are
{backbone, heads x lr_mult_head, cross-modal x lr_mult_cross_modal} x
{decay, no-decay}, selected by substring rules over parameter paths. Two
reference quirks are deliberately replicated (they affect training dynamics):

  * `norm3` (the video time-attn LN) is NOT in the no-decay list
    (set_optim_schedule.py:20-30), so its scale gets weight decay;
  * the fusion gates alpha_i2t / alpha_t2i live in the cross-modal DECAY
    group (their names match "i2t"/"t2i" but not "bias").

Implemented as one optax chain per group combined with optax.multi_transform
over a path->label function, which jits into a single fused update.
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

from egovlpv2_tpu.core.config import OptimConfig

HEAD_NAMES = ("mlm_score", "itm_score", "txt_proj", "vid_proj")
CROSS_MODAL_NAMES = ("cross_modal", "i2t", "t2i")
# substrings over '.'-joined param paths, mirroring the reference's torch
# name rules translated to our flax tree (LN scale leaf is 'scale').
NO_DECAY_SUBSTR = ("bias", "LayerNorm", ".norm.", ".norm1.", ".norm2.")


def param_label(path: Tuple[str, ...]) -> str:
    name = "." + ".".join(path) + "."
    nd = any(s in name for s in NO_DECAY_SUBSTR)
    is_head = any(h in name for h in HEAD_NAMES)
    is_cross = any(c in name for c in CROSS_MODAL_NAMES)
    if is_head and not is_cross:
        grp = "head"
    elif is_cross and not is_head:
        grp = "cross"
    else:
        grp = "backbone"
    return f"{grp}_{'nd' if nd else 'wd'}"


def label_tree(params):
    flat = traverse_util.flatten_dict(params)
    labels = {k: param_label(k) for k in flat}
    return traverse_util.unflatten_dict(labels)


def make_schedule(cfg: OptimConfig, lr_scale: float = 1.0) -> optax.Schedule:
    warmup = max(int(cfg.warmup_frac * cfg.max_steps), 1) if cfg.warmup_frac < 1 \
        else int(cfg.warmup_frac)
    peak = cfg.lr * lr_scale
    if cfg.decay_power == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=peak, warmup_steps=warmup,
            decay_steps=cfg.max_steps, end_value=0.0,
        )
    power = 1.0 if cfg.decay_power in ("poly1", "linear") else float(cfg.decay_power)
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, peak, warmup),
            optax.polynomial_schedule(
                init_value=peak, end_value=cfg.end_lr * lr_scale, power=power,
                transition_steps=cfg.max_steps - warmup,
            ),
        ],
        [warmup],
    )


def make_optimizer(cfg: OptimConfig, params) -> optax.GradientTransformation:
    def group_tx(lr_scale: float, wd: float) -> optax.GradientTransformation:
        return optax.adamw(
            learning_rate=make_schedule(cfg, lr_scale),
            b1=cfg.betas[0],
            b2=cfg.betas[1],
            eps=cfg.eps,
            weight_decay=wd,
        )

    txs = {
        "backbone_wd": group_tx(1.0, cfg.weight_decay),
        "backbone_nd": group_tx(1.0, 0.0),
        "head_wd": group_tx(cfg.lr_mult_head, cfg.weight_decay),
        "head_nd": group_tx(cfg.lr_mult_head, 0.0),
        "cross_wd": group_tx(cfg.lr_mult_cross_modal, cfg.weight_decay),
        "cross_nd": group_tx(cfg.lr_mult_cross_modal, 0.0),
    }
    tx = optax.multi_transform(txs, label_tree(params))
    if cfg.grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    return tx
