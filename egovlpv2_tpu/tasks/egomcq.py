"""EgoMCQ 5-way multiple-choice validation.

Capability-parity target: `EgoVLPv2/trainer/trainer_egoclip.py:202-313`
(SURVEY.md §3.2): per item, 5 candidate videos vs 1 query text; VTC score =
batched cosine sim of dual embeddings; VTM score = softmax(ITM logits)[:, 1]
of the fused stack with the text repeated 5x; ensemble = VTC + VTM. Accuracy
is reported separately for inter-video (type 1) and intra-video (type 2)
questions via `egomcq_accuracy`.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from egovlpv2_tpu.models.egovlp import EgoVLPv2, sim_matrix_batch


def make_egomcq_eval_step(model: EgoVLPv2, with_vtm: bool = True):
    """Returns a jitted fn: (params, video5, ids, mask) -> scores dict.

    video5: [B, 5, F, H, W, C]; ids/mask: [B, L].
    """

    @jax.jit
    def step(params, video5, ids, mask):
        b, n_opts = video5.shape[:2]
        flat_video = video5.reshape((b * n_opts,) + video5.shape[2:])

        t_emb = model.apply({"params": params}, ids, mask,
                            method=model.compute_text)
        v_emb = model.apply({"params": params}, flat_video,
                            method=model.compute_video)
        v_emb = v_emb.reshape(b, n_opts, -1)
        vtc = sim_matrix_batch(t_emb[:, None, :], v_emb)[:, 0, :]  # [B, 5]

        out = {"vtc": vtc}
        if with_vtm:
            rep_ids = jnp.repeat(ids, n_opts, axis=0)
            rep_mask = jnp.repeat(mask, n_opts, axis=0)
            logits = model.apply(
                {"params": params}, flat_video, rep_ids, rep_mask,
                method=model.itm_forward,
            )
            vtm = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, 1]
            out["vtm"] = vtm.reshape(b, n_opts)
        return out

    return step


def evaluate_egomcq(eval_step, params, batches) -> Dict[str, float]:
    """batches yield dicts with video5/ids/mask/answer/type (numpy)."""
    from egovlpv2_tpu.metrics.retrieval import egomcq_accuracy

    vtc_all, vtm_all, labels, types = [], [], [], []
    for batch in batches:
        out = eval_step(params, batch["video5"], batch["ids"], batch["mask"])
        vtc_all.append(np.asarray(out["vtc"]))
        if "vtm" in out:
            vtm_all.append(np.asarray(out["vtm"]))
        labels.append(np.asarray(batch["answer"]))
        types.append(np.asarray(batch["type"]))
    vtc = np.concatenate(vtc_all)
    labels = np.concatenate(labels)
    types = np.concatenate(types)
    metrics = {}
    for k, v in egomcq_accuracy(vtc, labels, types).items():
        metrics[f"vtc/{k}"] = v
    if vtm_all:
        vtm = np.concatenate(vtm_all)
        for k, v in egomcq_accuracy(vtm, labels, types).items():
            metrics[f"vtm/{k}"] = v
        for k, v in egomcq_accuracy(vtc + vtm, labels, types).items():
            metrics[f"ensemble/{k}"] = v
    return metrics
