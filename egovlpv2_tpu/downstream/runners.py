"""Training runners for the downstream heads (jitted steps + host loops).

Capability-parity targets:
  * VSGN — `EgoMQ/Train.py:24-89`: Adam(weight_decay=1e-4) + StepLR,
    6-term loss, keep best by validation loss;
  * VSLNet — `EgoNLQ/model/VSLNet.py:26-56` + `main.py:218-330`: AdamW with
    bias/LN no-decay groups, linear warmup schedule, highlight + span loss;
  * QFVS — `QFVS/runner_train.py:95-175`: BCE over concept1/concept2/oracle
    scores, manual cosine LR.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util

from egovlpv2_tpu.downstream import qfvs as qfvs_mod
from egovlpv2_tpu.downstream import vsgn as vsgn_mod
from egovlpv2_tpu.downstream import vslnet as vslnet_mod
from egovlpv2_tpu.train.step import TrainState


def _no_decay_mask(params):
    flat = traverse_util.flatten_dict(params)
    mask = {
        k: not (k[-1] == "bias" or any("norm" in p.lower() for p in k))
        for k in flat
    }
    return traverse_util.unflatten_dict(mask)


# ---------------- VSGN / EgoMQ ----------------


def make_vsgn_train_step(model: vsgn_mod.VSGN, lr: float = 1e-4,
                         step_size: int = 10, gamma: float = 0.5,
                         steps_per_epoch: int = 1000,
                         weight_decay: float = 1e-4):
    anchors = jnp.concatenate(
        [jnp.asarray(a) for a in vsgn_mod.make_anchors(
            model.temporal_scale, model.num_levels, model.anchor_scales,
            model.base_stride)], axis=0,
    )

    # Adam + StepLR(step_size epochs, gamma) (Train.py:29-33)
    sched = optax.exponential_decay(
        lr, transition_steps=step_size * steps_per_epoch, decay_rate=gamma,
        staircase=True,
    )
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.adam(sched),
    )

    def loss_fn(params, batch, rng):
        out = model.apply({"params": params}, batch["video"], batch["num_frms"],
                          rngs={"dropout": rng})
        losses = vsgn_mod.vsgn_losses(
            out, anchors, len(model.anchor_scales), model.num_classes,
            float(model.temporal_scale), batch["gt_bbox"], batch["num_gt"],
            batch["gt_action"], batch["gt_start"], batch["gt_end"],
        )
        return losses["loss_total"], losses

    def step_fn(state: TrainState, batch):
        rng, next_rng = jax.random.split(state.rng)
        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1, next_rng), losses

    return tx, anchors, jax.jit(step_fn, donate_argnums=(0,)), jax.jit(loss_fn)


# ---------------- VSLNet / EgoNLQ ----------------


def make_vslnet_train_step(model: vslnet_mod.VSLNet, lr: float = 1e-3,
                           num_train_steps: int = 10000,
                           warmup_proportion: float = 0.0,
                           highlight_lambda: float = 5.0):
    def schedule(step):
        warm = max(int(num_train_steps * warmup_proportion), 1)
        return jnp.where(
            step < warm,
            lr * step / warm,
            lr * jnp.maximum(
                (num_train_steps - step) / jnp.maximum(num_train_steps - warm, 1),
                0.0,
            ),
        )

    def make_tx(params):
        return optax.multi_transform(
            {
                True: optax.adamw(schedule, weight_decay=0.01),
                False: optax.adamw(schedule, weight_decay=0.0),
            },
            _no_decay_mask(params),
        )

    def loss_fn(params, batch, rng):
        h, s_logits, e_logits = model.apply(
            {"params": params}, batch["video_features"], batch["v_mask"],
            batch["query_features"], batch["q_mask"],
            deterministic=False, rngs={"dropout": rng},
        )
        hl = vslnet_mod.HighLightLayer.loss(h, batch["h_labels"], batch["v_mask"])
        span = vslnet_mod.span_loss(s_logits, e_logits, batch["s_ind"],
                                    batch["e_ind"])
        loss = span + highlight_lambda * hl
        return loss, {"loss_total": loss, "loss_span": span, "loss_highlight": hl}

    def make_step(tx):
        def step_fn(state: TrainState, batch):
            rng, next_rng = jax.random.split(state.rng)
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, rng)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1, next_rng), metrics

        return jax.jit(step_fn, donate_argnums=(0,))

    @jax.jit
    def predict(params, video_features, v_mask, query_features, q_mask, k=5):
        _, s_logits, e_logits = model.apply(
            {"params": params}, video_features, v_mask, query_features, q_mask
        )
        return vslnet_mod.extract_top_spans(s_logits, e_logits, k=5)

    return make_tx, make_step, predict


# ---------------- QFVS ----------------


def make_qfvs_train_step(model: qfvs_mod.SummaryScorer, lr: float = 1e-4,
                         weight_decay: float = 1e-5, total_steps: int = 1000):
    sched = optax.cosine_decay_schedule(lr, total_steps)
    tx = optax.adamw(sched, weight_decay=weight_decay)

    def loss_fn(params, batch, rng):
        loss = jnp.float32(0.0)
        mask = batch["mask"]
        for key, gt in (("concept1", batch["concept1_GT"]),
                        ("concept2", batch["concept2_GT"]),
                        ("oracle", batch["oracle_GT"])):
            logits = model.apply(
                {"params": params}, batch[f"feat_{key}"], batch["seg_len"],
                deterministic=False, rngs={"dropout": rng},
            )
            loss = loss + qfvs_mod.qfvs_bce_loss(logits, gt, mask)
        return loss, {"loss_total": loss}

    def step_fn(state: TrainState, batch):
        rng, next_rng = jax.random.split(state.rng)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1, next_rng), metrics

    @jax.jit
    def score(params, feats, seg_len):
        return model.apply({"params": params}, feats, seg_len)

    return tx, jax.jit(step_fn, donate_argnums=(0,)), score


def init_head_state(model, tx, example_batch_args: Tuple, seed: int = 0):
    """Generic init for a downstream head: params + opt_state + rng."""
    rng = jax.random.PRNGKey(seed)
    params = model.init(rng, *example_batch_args)["params"]
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32),
                      jax.random.PRNGKey(seed + 1))
