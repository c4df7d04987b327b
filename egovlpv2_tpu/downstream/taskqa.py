"""EgoTaskQA video-QA classification head + reasoning-type accuracy.

Capability-parity targets:
  * `EgoTaskQA/model/video_qa_model_linear_end2end.py:171-174,260-279` — the
    full fused stack (our EgoVLPv2.fused_encode) -> video CLS ->
    projector_2(dropout(relu(projector_1(cls)))) logits over the answer
    vocabulary; trained with plain cross-entropy over answer_encode labels;
  * `EgoTaskQA/utils/util.py:23-60` — per-reasoning-type accuracy.
"""

from __future__ import annotations

import functools
from typing import Dict, Iterable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from egovlpv2_tpu.models.egovlp import EgoVLPv2
from egovlpv2_tpu.objectives.losses import cross_entropy_loss
from egovlpv2_tpu.train.step import TrainState


class QAHead(nn.Module):
    num_answers: int
    drop_rate: float = 0.2

    @nn.compact
    def __call__(self, video_cls, deterministic=True):
        x = nn.Dense(self.num_answers, name="projector_1")(video_cls)
        x = nn.relu(x)
        x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        return nn.Dense(self.num_answers, name="projector_2")(x)


def make_qa_model(backbone_cfg, num_answers: int):
    """Fused backbone + QA head; answers are a closed vocabulary."""
    class _QA(nn.Module):
        @nn.compact
        def __call__(self, video, input_ids, attention_mask, deterministic=True):
            backbone = EgoVLPv2(backbone_cfg, name="backbone")
            v_cls, _ = backbone.fused_encode(
                video, input_ids, attention_mask, deterministic=deterministic
            )
            return QAHead(num_answers, name="qa_head")(v_cls, deterministic)

    return _QA()


def qa_loss_fn(params, batch, rng, *, model):
    logits = model.apply(
        {"params": params}, batch["video"], batch["text_ids"], batch["text_mask"],
        deterministic=False, rngs={"dropout": rng},
    )
    loss = cross_entropy_loss(logits, batch["answer"])
    acc = jnp.mean(jnp.argmax(logits, -1) == batch["answer"])
    return loss, {"loss_total": loss, "acc": acc}


def make_qa_train_step(model, tx):
    def step_fn(state: TrainState, batch):
        rng, next_rng = jax.random.split(state.rng)
        (_, metrics), grads = jax.value_and_grad(
            functools.partial(qa_loss_fn, model=model), has_aux=True
        )(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1, next_rng), metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def evaluate_qa(
    model,
    params,
    batches: Iterable[Dict],
    reasoning_types: Sequence[str],
) -> Dict[str, float]:
    """Validation pass: accuracy overall + per reasoning type
    (EgoTaskQA/main_end2end.py:375-388 gather + metric)."""
    import jax.numpy as jnp

    @jax.jit
    def predict(params, video, ids, mask):
        logits = model.apply({"params": params}, video, ids, mask)
        return jnp.argmax(logits, axis=-1)

    calc = ReasoningTypeAccuracy(reasoning_types)
    correct = total = 0
    for batch in batches:
        pred = np.asarray(predict(params, jnp.asarray(batch["video"]),
                                  jnp.asarray(batch["text_ids"]),
                                  jnp.asarray(batch["text_mask"])))
        label = np.asarray(batch["answer"])
        correct += int((pred == label).sum())
        total += len(label)
        calc.update(batch.get("reasoning_types", [[] for _ in label]), pred, label)
    out = {"acc": correct / max(total, 1)}
    out.update({f"acc/{k}": v for k, v in calc.accuracies().items()})
    return out


class ReasoningTypeAccuracy:
    """Per-reasoning-type accuracy accumulator (util.py:23-60)."""

    def __init__(self, reasoning_types: Sequence[str]):
        self.types = list(reasoning_types)
        self.reset()

    def reset(self):
        self.true = {t: 0 for t in self.types}
        self.total = {t: 0 for t in self.types}

    def update(self, reasoning_type_lst: List[List[str]], pred: np.ndarray,
               label: np.ndarray):
        correct = np.asarray(pred) == np.asarray(label)
        for i, q_types in enumerate(reasoning_type_lst):
            for t in q_types:
                if correct[i]:
                    self.true[t] += 1
                self.total[t] += 1

    def accuracies(self) -> Dict[str, float]:
        return {
            t: (self.true[t] / self.total[t] if self.total[t] else 0.0)
            for t in self.types
        }
