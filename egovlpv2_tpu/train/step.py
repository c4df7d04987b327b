"""The jitted pre-training step: EgoNCE + MLM + 2*ITM over a device mesh.

Capability-parity target: `EgoVLPv2/model/model.py:370-487` +
`trainer/trainer_egoclip.py:91-200`. TPU-native design:

  * global-batch math under one jit — XLA/GSPMD inserts the ICI collectives
    that the reference hand-writes (AllGather_multi, DDP allreduce);
  * patchify runs ONCE per step and its tokens are reused by the EgoNCE
    tower, the MLM fused pass, and the mined ITM fused pass (the reference
    recomputes the conv 3x; reusing is mathematically identical because the
    patch conv is per-sample and the mined batch gathers whole examples);
  * ITM negatives are gathered as patch tokens + token ids instead of raw
    pixels (model.py:430-432 gathers pixels) — same math, ~150x less ICI
    traffic for the video side;
  * bf16 activations, f32 params/optimizer, remat inside each block.

Gradient-scale note: with W-way DDP the reference's effective gradient is
(1/W) * d(global loss)/dθ because every rank computes the identical global
loss and DDP *averages* rank-local grads. `loss_scale` reproduces that
scaling when strict parity with a W-GPU reference run is wanted.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from egovlpv2_tpu.core.config import TrainConfig
from egovlpv2_tpu.models.egovlp import EgoVLPv2, sim_matrix
from egovlpv2_tpu.objectives.itm_mining import mine_itm_indices
from egovlpv2_tpu.objectives.losses import (
    egonce_loss,
    itm_loss,
    masked_lm_loss,
    norm_softmax_loss,
)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array
    rng: jax.Array


def create_train_state(model: EgoVLPv2, tx, batch, rng) -> TrainState:
    init_rng, state_rng = jax.random.split(rng)
    variables = model.init(
        init_rng,
        batch["video"][:1],
        batch["text_ids"][:1],
        batch["text_mask"][:1],
        method=model.init_all,
    )
    params = variables["params"]
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32), state_rng)


def pretrain_loss_fn(
    params,
    batch: Dict[str, jax.Array],
    rng: jax.Array,
    *,
    model: EgoVLPv2,
    cfg: TrainConfig,
    loss_scale: float = 1.0,
    path_remat: Optional[bool] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """EgoNCE + MLM + itm_weight*ITM.

    Rematerialization strategy: one jax.checkpoint region per objective path
    ("path remat") instead of per-block remat. Backward then recomputes one
    tower pass at a time, so peak HBM is max-over-paths rather than
    sum-over-paths, while the compiler sees only 4 remat regions (per-block
    remat on the unrolled 24-block graph is pathologically slow to compile
    on few-core hosts: measured >90 min vs ~5 min).
    """
    lcfg = cfg.loss
    if path_remat is None:
        path_remat = cfg.path_remat
    dropout_rng, itm_rng = jax.random.split(rng)

    def bound_fn(method, **static_kw):
        def fn(params, *arrays):
            return model.apply(
                {"params": params}, *arrays, method=method,
                rngs={"dropout": dropout_rng}, **static_kw,
            )
        if path_remat and not model.cfg.remat:
            fn = jax.checkpoint(fn)
        return fn

    video = batch["video"]
    ids, mask = batch["text_ids"], batch["text_mask"]
    # patchify once, reused by all three paths (kept, not rematted: it is
    # the single biggest recompute and small to store)
    tokens = model.apply({"params": params}, video, method=model.patchify)
    metrics = {}

    # ---- EgoNCE (dual towers over the global batch) ----
    t_emb = bound_fn(model.compute_text, deterministic=False)(params, ids, mask)
    v_emb = bound_fn(
        model.compute_video, deterministic=False,
    )(params, None, tokens)
    sim = sim_matrix(t_emb, v_emb)
    if lcfg.type == "EgoNCE":
        sim_v = sim_matrix(batch["verb_vec"], batch["verb_vec"])
        sim_n = sim_matrix(batch["noun_vec"], batch["noun_vec"])
        loss_nce, mask_bool, temp = egonce_loss(
            sim, sim_v, sim_n, lcfg.temperature, lcfg.noun, lcfg.verb
        )
    else:
        loss_nce = norm_softmax_loss(sim, lcfg.temperature)
        mask_bool = jnp.eye(sim.shape[0], dtype=bool)
        temp = lcfg.temperature
    loss = loss_nce
    metrics["loss_egonce"] = loss_nce

    # ---- fused paths ----
    # The fused-path video stream is text-independent and dropout-free
    # through the unfused blocks, so MLM and ITM share ONE unfused-video
    # pass; ITM gathers the mined examples' token states instead of
    # re-running them (identical math to the reference's separate passes).
    # NOTE: batching both fused stacks into one 2B-wide pass
    # (mlm_itm_forward_from_video) was measured 45% SLOWER at batch 16 on
    # v5e — the doubled remat-region peak pressures HBM — so the stacks run
    # separately.
    if "MLM" in cfg.tasks or "ITM" in cfg.tasks:
        v_un = bound_fn(model.video_unfused, deterministic=False)(
            params, None, tokens
        )

    merged = (os.environ.get("EGOVLP_MERGED_FUSED", "0") == "1"
              and "MLM" in cfg.tasks and "ITM" in cfg.tasks)
    if merged:
        # one 2B-wide fused stack for MLM + mined ITM (identical math;
        # measured slower under path remat in round 1, re-tunable now)
        idx = mine_itm_indices(itm_rng, jax.lax.stop_gradient(sim), mask_bool, temp)
        mlm_logits, itm_logits = bound_fn(
            model.mlm_itm_forward_from_video, deterministic=False,
        )(params, v_un, batch["text_mlm_ids"], mask,
          v_un[idx.video_idx], ids[idx.text_idx], mask[idx.text_idx])
        loss_mlm = masked_lm_loss(mlm_logits, batch["text_mlm_labels"])
        loss_itm = itm_loss(itm_logits, idx.labels)
        loss = loss + lcfg.mlm_weight * loss_mlm + lcfg.itm_weight * loss_itm
        metrics["loss_mlm"] = loss_mlm
        metrics["loss_itm"] = loss_itm

    # ---- MLM (fused stack on masked text) ----
    if "MLM" in cfg.tasks and not merged:
        mlm_logits = bound_fn(model.mlm_forward_from_video, deterministic=False)(
            params, v_un, batch["text_mlm_ids"], mask
        )
        loss_mlm = masked_lm_loss(mlm_logits, batch["text_mlm_labels"])
        loss = loss + lcfg.mlm_weight * loss_mlm
        metrics["loss_mlm"] = loss_mlm

    # ---- ITM (fused stack on hard-negative-mined batch) ----
    if "ITM" in cfg.tasks and not merged:
        idx = mine_itm_indices(itm_rng, jax.lax.stop_gradient(sim), mask_bool, temp)
        itm_logits = bound_fn(model.itm_forward_from_video, deterministic=False)(
            params, v_un[idx.video_idx], ids[idx.text_idx], mask[idx.text_idx],
        )
        loss_itm = itm_loss(itm_logits, idx.labels)
        loss = loss + lcfg.itm_weight * loss_itm
        metrics["loss_itm"] = loss_itm

    metrics["loss_total"] = loss
    return loss * loss_scale, metrics


def make_train_step(
    model: EgoVLPv2,
    cfg: TrainConfig,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    loss_scale: float = 1.0,
):
    def step_fn(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jax.Array]]:
        rng, next_rng = jax.random.split(state.rng)
        rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(
            functools.partial(
                pretrain_loss_fn, model=model, cfg=cfg, loss_scale=loss_scale
            ),
            has_aux=True,
        )
        (_, metrics), grads = grad_fn(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if cfg.log_grad_norm:
            metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1, next_rng), metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))
    batch_sh = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn,
        donate_argnums=(0,),
        in_shardings=(None, batch_sh),
    )
