"""Dual-encoder retrieval fine-tuning + evaluation (EK-100 MIR, Charades-Ego).

Capability-parity targets:
  * `EgoVLPv2/model/model_epic_charades.py:410-441` — 'Dual' task forward:
    dual towers -> gathered sim matrix -> AdaptiveMaxMargin (EPIC, relevancy
    weighted) or NormSoftmax (Charades);
  * `EgoVLPv2/trainer/trainer_epic.py:92-306` — per-iteration scheduler plus
    epoch-milestone LR decay, val gathers all embeddings then runs official
    mAP/nDCG;
  * `EgoVLPv2/trainer/trainer_charades.py:216-274` — val encodes the 157
    class-prompt sentences once, scores videos against them, charades mAP.

TPU-native: one jitted global-batch step (GSPMD shards it), eval loops jit
the encoders and accumulate embeddings on host.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from egovlpv2_tpu.core.config import TrainConfig
from egovlpv2_tpu.models.egovlp import EgoVLPv2, sim_matrix
from egovlpv2_tpu.objectives.losses import max_margin_loss, norm_softmax_loss
from egovlpv2_tpu.train.step import TrainState


def dual_loss_fn(params, batch, rng, *, model: EgoVLPv2, cfg: TrainConfig):
    lcfg = cfg.loss
    bound = lambda method, *a, **kw: model.apply(
        {"params": params}, *a, method=method, rngs={"dropout": rng}, **kw
    )
    t = bound(model.compute_text, batch["text_ids"], batch["text_mask"],
              deterministic=False)
    v = bound(model.compute_video, batch["video"], deterministic=False)
    sim = sim_matrix(t, v)
    if lcfg.type == "AdaptiveMaxMargin":
        loss = max_margin_loss(sim, margin=lcfg.margin,
                               weight=batch["relevancy"].astype(jnp.float32))
    elif lcfg.type == "MaxMargin":
        loss = max_margin_loss(sim, margin=lcfg.margin)
    else:  # NormSoftmax (Charades)
        loss = norm_softmax_loss(sim, lcfg.temperature)
    return loss, {"loss_total": loss}


def make_dual_train_step(model: EgoVLPv2, cfg: TrainConfig, tx, mesh=None):
    def step_fn(state: TrainState, batch):
        rng, next_rng = jax.random.split(state.rng)
        grad_fn = jax.value_and_grad(
            functools.partial(dual_loss_fn, model=model, cfg=cfg), has_aux=True
        )
        (_, metrics), grads = grad_fn(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1, next_rng), metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.jit(step_fn, donate_argnums=(0,),
                   in_shardings=(None, NamedSharding(mesh, P("data"))))


def milestone_lr_scale(epoch: int, milestones: Tuple[int, ...]) -> float:
    """Epoch-milestone LR decay applied on top of the base schedule
    (trainer_epic.py:85-90): x0.1 at each passed milestone. Plug into the
    optimizer via optax.scale(...) recreated per epoch, or fold into a
    schedule with `epoch_milestone_schedule`."""
    scale = 1.0
    for m in milestones:
        if epoch >= m:
            scale *= 0.1
    return scale


def epoch_milestone_schedule(base: float, milestones: Tuple[int, ...],
                             steps_per_epoch: int):
    """optax schedule version of the reference's per-epoch milestone decay."""
    import optax

    boundaries = {m * steps_per_epoch: 0.1 for m in milestones}
    return optax.piecewise_constant_schedule(base, boundaries)


def train_retrieval_epochs(
    model: EgoVLPv2,
    cfg: TrainConfig,
    tx,
    state,
    step_fn,
    train_batches: Callable[[int], Iterable[Dict]],
    eval_fn: Optional[Callable] = None,
    epochs: int = 1,
    log_fn: Optional[Callable[[int, Dict[str, float]], None]] = None,
):
    """Epoch loop for the dual-encoder fine-tunes (trainer_epic.py:92-196):
    per-iteration schedule steps happen inside `tx`; per-epoch validation via
    `eval_fn(params) -> metrics`."""
    history = []
    for epoch in range(epochs):
        for batch in train_batches(epoch):
            state, metrics = step_fn(state, batch)
            if log_fn is not None:
                log_fn(int(state.step), {k: float(v) for k, v in metrics.items()})
        if eval_fn is not None:
            history.append(eval_fn(state.params))
    return state, history


def make_encoders(model: EgoVLPv2):
    @jax.jit
    def encode_text(params, ids, mask):
        return model.apply({"params": params}, ids, mask, method=model.compute_text)

    @jax.jit
    def encode_video(params, video):
        return model.apply({"params": params}, video, method=model.compute_video)

    return encode_text, encode_video


def pool_windows(v: np.ndarray, idx: np.ndarray, *others: np.ndarray):
    """Reduce sliding-window entries back to per-video rows.

    The test-time expansion (base_dataset.py:82-106 / datasets with
    sliding_window_stride != -1) emits several windows per video sharing the
    same `idx`; video embeddings are mean-pooled per group, while `others`
    (texts, targets — identical within a group) keep their first row.
    Returns (v_pooled, unique_idx, *others_pooled).
    """
    uniq, inverse = np.unique(idx, return_inverse=True)
    pooled = np.zeros((len(uniq), v.shape[1]), np.float64)
    np.add.at(pooled, inverse, v.astype(np.float64))
    pooled /= np.bincount(inverse)[:, None]
    out = [pooled.astype(v.dtype), uniq]
    for o in others:
        first = np.zeros((len(uniq),) + o.shape[1:], o.dtype)
        # reversed so the FIRST row of each group wins
        first[inverse[::-1]] = o[::-1]
        out.append(first)
    return tuple(out)


def align_mir_similarity(
    sim_text_video: np.ndarray,  # [N, N] rows = gathered texts, cols = videos
    idx_arr: np.ndarray,  # [N] dataset indices in gathered order
    video_ids: np.ndarray,  # EPIC_100_retrieval_test.csv column 0 order
    sentence_video_ids: np.ndarray,  # ..._test_sentence.csv column 0 order
) -> np.ndarray:
    """Reorder the gathered square similarity into the official
    video x unique-sentence layout (metric.py:292-305): undo the gather
    permutation, then select the sentence columns by their video ids."""
    idx_list = idx_arr.tolist()
    order = [idx_list.index(i) for i in range(len(video_ids))]
    sim = sim_text_video[order][:, order]
    vid_list = video_ids.tolist()
    indexes = [vid_list.index(v) for v in sentence_video_ids]
    return sim.T[:, indexes]  # video x sentence


def evaluate_mir(
    model: EgoVLPv2,
    params,
    batches: Iterable[Dict],
    relevancy: np.ndarray,
    video_ids: Optional[np.ndarray] = None,
    sentence_video_ids: Optional[np.ndarray] = None,
    on_sim=None,
) -> Dict[str, float]:
    """EK-100 MIR eval: encode everything, undo the gather order, select the
    official unique-sentence columns, run official mAP/nDCG
    (trainer_epic.py:200-306 + metric.py:283-325).

    `relevancy` is the official video x sentence matrix; `video_ids` /
    `sentence_video_ids` come from the EPIC retrieval csv files. When they
    are omitted (e.g. synthetic tests) the square text x video similarity is
    used directly against `relevancy`'s shape."""
    from egovlpv2_tpu.metrics.retrieval import mir_metrics

    encode_text, encode_video = make_encoders(model)
    t_all, v_all, idx_all = [], [], []
    for batch in batches:
        t_all.append(np.asarray(encode_text(params, batch["text_ids"],
                                            batch["text_mask"])))
        v_all.append(np.asarray(encode_video(params, batch["video"])))
        idx_all.append(np.asarray(batch["idx"]))
    t = np.concatenate(t_all)
    v = np.concatenate(v_all)
    idx = np.concatenate(idx_all)
    if len(np.unique(idx)) != len(idx):
        # sliding-window expansion active: pool windows per video
        v, idx, t = pool_windows(v, idx, t)
    sim_tv = np.asarray(sim_matrix(jnp.asarray(t), jnp.asarray(v)))
    if on_sim is not None:
        # raw text x video similarity in encounter order (gt = diagonal);
        # used by the HTML retrieval visualizer (trainer_epic.py:293-298)
        on_sim(sim_tv, idx)
    if video_ids is not None and sentence_video_ids is not None:
        sim = align_mir_similarity(sim_tv, idx, video_ids, sentence_video_ids)
    else:
        order = np.argsort(idx)
        sim = sim_tv[order][:, order].T[:, : relevancy.shape[1]]
    return mir_metrics(sim, relevancy)


def evaluate_charades(
    model: EgoVLPv2,
    params,
    batches: Iterable[Dict],
    class_prompt_ids: np.ndarray,
    class_prompt_mask: np.ndarray,
) -> Dict[str, float]:
    """Charades-Ego zero-shot/FT eval: 157 class prompts scored against every
    video (trainer_charades.py:216-274)."""
    from egovlpv2_tpu.metrics.retrieval import charades_map

    encode_text, encode_video = make_encoders(model)
    cls_emb = np.asarray(
        encode_text(params, jnp.asarray(class_prompt_ids),
                    jnp.asarray(class_prompt_mask))
    )
    v_all, targets, idx_all = [], [], []
    for batch in batches:
        v_all.append(np.asarray(encode_video(params, batch["video"])))
        targets.append(np.asarray(batch["target"]))
        if "idx" in batch:
            idx_all.append(np.asarray(batch["idx"]))
    v = np.concatenate(v_all)
    gt = np.concatenate(targets)
    if idx_all:
        idx = np.concatenate(idx_all)
        if len(np.unique(idx)) != len(idx):
            v, _, gt = pool_windows(v, idx, gt)
    submission = np.asarray(
        sim_matrix(jnp.asarray(cls_emb), jnp.asarray(v))
    ).T  # [N_videos, 157]
    return charades_map(submission, gt)
