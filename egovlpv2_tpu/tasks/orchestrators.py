"""End-to-end task orchestrators (the reference sub-projects' main.py's).

Each function wires extraction -> head training -> official evaluation for
one downstream benchmark, mirroring:
  * EgoMQ  — `EgoMQ/scripts/train_infer_eval_ego_nce.sh` (Train -> Infer ->
    Eval over extracted features);
  * EgoNLQ — `EgoNLQ/main.py:37-330` (feature extraction -> VSLNet training
    -> evaluate_nlq);
  * QFVS   — `QFVS/main.py:37-54` (3-stage extraction -> scorer training ->
    leave-one-out bipartite F1).

They are deliberately thin: all heavy lifting lives in the tested modules
(downstream/{datasets,runners,mq_infer,mq_eval,nlq_eval,qfvs,qfvs_data},
tasks/{extract,qfvs_extract}).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def run_egomq(
    clip_anno: str,
    feature_path: str,
    out_dir: str,
    epochs: int = 10,
    batch_size: int = 16,
    lr: float = 1e-4,
    step_size: int = 10,
    gamma: float = 0.5,
    temporal_scale: int = 928,
    input_feat_dim: int = 4096,
    num_levels: int = 5,
    tiou_thresholds: Sequence[float] = (0.1, 0.2, 0.3, 0.4, 0.5),
    window_stride: Optional[int] = None,
    use_vss: bool = False,
) -> Dict[str, float]:
    """Train VSGN on extracted features, infer proposals, detection mAP."""
    from egovlpv2_tpu.data.loader import DataLoader
    from egovlpv2_tpu.downstream import mq_eval, mq_infer, runners, vsgn
    from egovlpv2_tpu.downstream.datasets import EgoMQFeatureDataset

    os.makedirs(out_dir, exist_ok=True)

    train_ds = EgoMQFeatureDataset(
        clip_anno, feature_path, subset="train", mode="train",
        temporal_scale=temporal_scale, input_feat_dim=input_feat_dim,
        moment_classes=os.path.join(out_dir, "moment_classes.json"),
        window_stride=window_stride, use_vss=use_vss,
    )
    val_ds = EgoMQFeatureDataset(
        clip_anno, feature_path, subset="val", mode="train",
        temporal_scale=temporal_scale, input_feat_dim=input_feat_dim,
        moment_classes=os.path.join(out_dir, "moment_classes.json"),
        window_stride=window_stride, use_vss=use_vss,
    )
    num_classes = len(train_ds.classes)
    model = vsgn.VSGN(
        input_feat_dim=input_feat_dim, temporal_scale=temporal_scale,
        num_levels=num_levels, num_classes=num_classes,
    )
    loader = DataLoader(train_ds, batch_size)
    tx, anchors, step, loss_fn = runners.make_vsgn_train_step(
        model, lr=lr, step_size=step_size, gamma=gamma,
        steps_per_epoch=len(loader))
    example = loader.collate([train_ds[0]])
    state = runners.init_head_state(
        model, tx, (jnp.asarray(example["video"]), jnp.asarray(example["num_frms"])))

    # snapshot to host: the jitted step donates its input state's buffers
    best_val, best_params = np.inf, jax.device_get(state.params)
    for epoch in range(epochs):
        for batch in loader.epoch(epoch):
            state, _ = step(state, {k: jnp.asarray(v) for k, v in batch.items()
                                    if k != "clip_name"})
        # keep best by val loss (EgoMQ/Train.py:54-62)
        val_losses = []
        for batch in DataLoader(val_ds, batch_size).epoch(0):
            l, _ = loss_fn(state.params,
                           {k: jnp.asarray(v) for k, v in batch.items()
                            if k != "clip_name"}, jax.random.PRNGKey(0))
            val_losses.append(float(l))
        vl = float(np.mean(val_losses)) if val_losses else np.inf
        if vl < best_val:
            best_val, best_params = vl, jax.device_get(state.params)

    # inference + detection mAP
    infer_ds = EgoMQFeatureDataset(
        clip_anno, feature_path, subset="val", mode="inference",
        temporal_scale=temporal_scale, input_feat_dim=input_feat_dim,
        moment_classes=os.path.join(out_dir, "moment_classes.json"),
        window_stride=window_stride,
    )
    predict = mq_infer.make_vsgn_predict(model)
    predictions: List[Dict] = []
    ground_truth: List[Dict] = []
    seen_clips = set()
    for i in range(len(infer_ds)):
        item = infer_ds[i]
        probs, adjusted, start, end = predict(
            best_params, jnp.asarray(item["video"])[None],
            jnp.asarray([item["num_frms"]]))
        predictions += mq_infer.proposals_from_outputs(
            np.asarray(probs[0]), np.asarray(adjusted[0]), np.asarray(start[0]),
            np.asarray(end[0]), int(item["num_frms"]), float(item["fps"]),
            item["clip_name"], temporal_scale,
            offset_sec=float(item["offset_sec"]),
        )
        if item["clip_name"] in seen_clips:  # windows share one GT set
            continue
        seen_clips.add(item["clip_name"])
        for ann in infer_ds.clips[item["clip_name"]]["annotations"]:
            ground_truth.append({
                "video_id": item["clip_name"],
                "t_start": ann["start_time"], "t_end": ann["end_time"],
                "label": infer_ds.classes[ann["label"]],
            })
    metrics = dict(mq_eval.detection_map(ground_truth, predictions,
                                         tiou_thresholds))

    # retrieval track: per clip keep only GT-present categories, ranked by
    # score, top num_prop across labels (generate_retrieval.py:70-110
    # rm_other_category + sort + cap); then Recall rx @ tIoU
    num_prop = 200
    gt_labels: Dict[str, set] = {}
    for g in ground_truth:
        gt_labels.setdefault(g["video_id"], set()).add(g["label"])
    by_clip: Dict[str, List[Dict]] = {}
    for p in predictions:
        if p["label"] in gt_labels.get(p["video_id"], ()):
            by_clip.setdefault(p["video_id"], []).append(p)
    retrieval_preds: List[Dict] = []
    for clip, props in by_clip.items():
        retrieval_preds += sorted(
            props, key=lambda r: -r["score"])[:num_prop]
    metrics.update(mq_eval.retrieval_recall(ground_truth, retrieval_preds))

    # challenge artifacts (Infer.py writes detections_postNMS.json; the
    # retrieval file keeps the reference's spelling so Merge/Eval tooling
    # pointed at this out_dir finds it; Merge_detection_retrieval.py packs
    # both into submission.json)
    idx_classes = {v: k for k, v in infer_ds.classes.items()}

    def _results_map(props: List[Dict]) -> Dict[str, List[Dict]]:
        res: Dict[str, List[Dict]] = {c: [] for c in seen_clips}
        for p in props:
            res.setdefault(p["video_id"], []).append({
                "label": idx_classes[p["label"]],
                "score": round(p["score"], 6),
                "segment": [round(p["t_start"], 1), round(p["t_end"], 1)],
            })
        return res

    det_map = _results_map(predictions)
    rev_map = _results_map(retrieval_preds)
    for name, results in (("detections_postNMS.json", det_map),
                          ("retreival_postNMS.json", rev_map)):
        with open(os.path.join(out_dir, name), "w") as f:
            json.dump({"version": "1.0", "external_data": "",
                       "results": results}, f)
    with open(os.path.join(out_dir, "submission.json"), "w") as f:
        json.dump(mq_eval.pack_submission(det_map, rev_map), f)
    return metrics


def run_egonlq(
    train_meta: List[Dict],
    val_meta: List[Dict],
    feature_dir: str,
    ground_truth: Dict,
    epochs: int = 10,
    batch_size: int = 32,
    lr: float = 1e-3,
    max_pos_len: int = 256,
    video_feature_dim: int = 768,
) -> Dict[str, float]:
    """Train VSLNet on fused per-query features, official NLQ metrics."""
    from egovlpv2_tpu.data.loader import DataLoader
    from egovlpv2_tpu.downstream import nlq_eval, runners, vslnet
    from egovlpv2_tpu.downstream.datasets import (
        NLQFeatureDataset, nlq_highlight_labels,
    )

    train_ds = NLQFeatureDataset(train_meta, feature_dir, max_pos_len)
    val_ds = NLQFeatureDataset(val_meta, feature_dir, max_pos_len)
    model = vslnet.VSLNet(max_pos_len=max_pos_len,
                          video_feature_dim=video_feature_dim)
    loader = DataLoader(train_ds, batch_size, drop_last=True)
    make_tx, make_step, predict = runners.make_vslnet_train_step(
        model, lr=lr, num_train_steps=epochs * len(loader))

    def collate_train(batch):
        q = batch["query_features"]
        out = {
            "video_features": jnp.asarray(batch["video_features"]),
            "v_mask": jnp.asarray(batch["v_mask"]),
            "query_features": jnp.asarray(q),
            "q_mask": jnp.ones(q.shape[:2], jnp.int32),
            "s_ind": jnp.asarray(batch["s_ind"]),
            "e_ind": jnp.asarray(batch["e_ind"]),
            "h_labels": jnp.asarray(nlq_highlight_labels(
                np.asarray(batch["s_ind"]), np.asarray(batch["e_ind"]),
                batch["video_features"].shape[1])),
        }
        return out

    example = collate_train(loader.collate([train_ds[0]]))
    params = model.init(jax.random.PRNGKey(0), example["video_features"],
                        example["v_mask"], example["query_features"],
                        example["q_mask"])["params"]
    tx = make_tx(params)
    from egovlpv2_tpu.train.step import TrainState

    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32),
                       jax.random.PRNGKey(1))
    step = make_step(tx)
    for epoch in range(epochs):
        for batch in loader.epoch(epoch):
            state, _ = step(state, collate_train(
                {k: v for k, v in batch.items() if k != "meta"}))

    predictions = []
    for i in range(len(val_ds)):
        item = val_ds[i]
        q = jnp.asarray(item["query_features"])[None]
        starts, ends = predict(
            state.params, jnp.asarray(item["video_features"])[None],
            jnp.asarray(item["v_mask"])[None], q,
            jnp.ones(q.shape[:2], jnp.int32))
        m = item["meta"]
        n = m["num_windows"]
        times = []
        for s, e in zip(np.asarray(starts[0]), np.asarray(ends[0])):
            ts, te = nlq_eval.index_to_time(min(int(s), n - 1),
                                            min(int(e), n - 1), n,
                                            m["duration"])
            times.append([float(ts), float(te)])
        predictions.append({
            "clip_uid": m["clip_uid"], "annotation_uid": m["annotation_uid"],
            "query_idx": m["query_idx"], "predicted_times": times,
        })
    results, miou = nlq_eval.evaluate_nlq(predictions, ground_truth)
    return {
        "R1@0.3": 100 * results[0][0], "R5@0.3": 100 * results[0][1],
        "R1@0.5": 100 * results[1][0], "R5@0.5": 100 * results[1][1],
        "mIoU": 100 * miou,
    }


def run_egotaskqa(
    backbone_cfg,
    train_items,  # indexable of dicts with video/text_ids/text_mask/answer
    val_items,
    num_answers: int,
    reasoning_types: Sequence[str] = (),
    epochs: int = 1,
    batch_size: int = 8,
    lr: float = 2e-4,
    warmup_frac: float = 0.1,
    save_dir: Optional[str] = None,
    resume: bool = False,
    test_only: bool = False,
    backbone_params=None,
) -> Dict[str, float]:
    """Fine-tune the fused backbone + QA head, report overall and
    per-reasoning-type accuracy (EgoTaskQA/main_end2end.py:84-200 recipe:
    single-LR AdamW + cosine warmup).

    `save_dir` checkpoints the TrainState each epoch; `resume` restarts from
    the latest checkpoint (main_end2end.py:164-172: global_step -> epoch);
    `test_only` skips training and evaluates the restored checkpoint
    (main_end2end.py:174-200). `backbone_params` overlays pretrained EgoVLPv2
    weights onto the backbone submodule before training.
    """
    import optax

    from egovlpv2_tpu.data.loader import DataLoader, default_collate
    from egovlpv2_tpu.downstream.taskqa import (
        evaluate_qa, make_qa_model, make_qa_train_step,
    )
    from egovlpv2_tpu.train.step import TrainState

    if test_only and not save_dir:
        # without a checkpoint to restore, "evaluation" would silently score
        # randomly-initialized QA-head weights and report it as a result
        raise ValueError("test_only requires save_dir (the checkpoint "
                         "directory to evaluate)")

    model = make_qa_model(backbone_cfg, num_answers)
    steps_per_epoch = max(len(train_items) // batch_size, 1)
    total_steps = max(epochs * steps_per_epoch, 1)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, max(int(total_steps * warmup_frac), 1), total_steps)
    tx = optax.adamw(sched, weight_decay=0.01)

    ex = default_collate([train_items[j]
                          for j in range(min(batch_size, len(train_items)))])
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ex["video"][:1]),
        jnp.asarray(ex["text_ids"][:1]), jnp.asarray(ex["text_mask"][:1]),
    )["params"]
    if backbone_params is not None:
        # intersection overlay: the QA init only creates the fused-encode
        # path, while a pretrain checkpoint carries projection/MLM heads too
        def overlay(dst, src):
            out = {}
            for k, v in dst.items():
                if k not in src:
                    out[k] = v
                elif isinstance(v, dict):
                    out[k] = overlay(v, dict(src[k]))
                else:
                    out[k] = src[k]
            return out

        params = dict(params, backbone=overlay(dict(params["backbone"]),
                                               dict(backbone_params)))
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32),
                       jax.random.PRNGKey(1))

    ckpt = None
    start_epoch = 0
    if save_dir:
        from egovlpv2_tpu.train.checkpoint import CheckpointManager

        ckpt = CheckpointManager(save_dir)
        if resume or test_only:
            restored = ckpt.restore(jax.device_get(state))
            if restored is not None:
                state = restored
                start_epoch = int(state.step) // steps_per_epoch
            elif test_only:
                raise FileNotFoundError(
                    f"test_only: no checkpoint found under {save_dir}")

    if not test_only:
        step = make_qa_train_step(model, tx)
        loader = DataLoader(train_items, batch_size)
        for epoch in range(start_epoch, epochs):
            for batch in loader.epoch(epoch):
                jb = {k: jnp.asarray(v) for k, v in batch.items()
                      if k != "reasoning_types"}
                state, _ = step(state, jb)
            if ckpt:
                ckpt.save(int(state.step), jax.device_get(state))
        if ckpt:
            ckpt.wait()

    val_batches = []
    for i in range(0, len(val_items) - batch_size + 1, batch_size):
        chunk = [val_items[j] for j in range(i, i + batch_size)]
        b = default_collate(chunk)
        b["reasoning_types"] = [it.get("reasoning_types", []) for it in chunk]
        val_batches.append(b)
    return evaluate_qa(model, state.params, val_batches, list(reasoning_types))


def run_qfvs(
    dataset,  # egovlpv2_tpu.downstream.qfvs_data.QFVSDataset (train videos)
    test_items: List[Dict],  # same layout, held-out video's items
    shots_tag: np.ndarray,
    epochs: int = 5,
    lr: float = 1e-4,
    top_percent: float = 0.02,
    d_model: Optional[int] = None,
) -> Dict[str, float]:
    """Train the summary scorer, evaluate leave-one-out bipartite F1."""
    from egovlpv2_tpu.downstream import qfvs, runners
    from egovlpv2_tpu.downstream.qfvs import semantic_matching_f1

    if d_model is None:  # follow the fused feature width (reference: 768)
        d_model = int(dataset[0]["feat_concept1"].shape[-1])
    model = qfvs.SummaryScorer(d_model=d_model)
    tx, step, score = runners.make_qfvs_train_step(
        model, lr=lr, total_steps=epochs * len(dataset))
    ex = dataset[0]
    state = runners.init_head_state(
        model, tx, (jnp.asarray(ex["feat_concept1"])[None],
                    jnp.asarray(ex["seg_len"])[None]))
    for epoch in range(epochs):
        for i in range(len(dataset)):
            item = dataset[i]
            batch = {
                "seg_len": jnp.asarray(item["seg_len"])[None],
                "mask": jnp.asarray(item["mask"])[None],
                "feat_concept1": jnp.asarray(item["feat_concept1"])[None],
                "feat_concept2": jnp.asarray(item["feat_concept2"])[None],
                "feat_oracle": jnp.asarray(item["feat_oracle"])[None],
                "concept1_GT": jnp.asarray(item["concept1_GT"])[None],
                "concept2_GT": jnp.asarray(item["concept2_GT"])[None],
                "oracle_GT": jnp.asarray(item["oracle_GT"])[None],
            }
            state, _ = step(state, batch)

    f1s = []
    for item in test_items:
        logits = np.asarray(score(
            state.params, jnp.asarray(item["feat_oracle"])[None],
            jnp.asarray(item["seg_len"])[None]))[0]
        mask = np.asarray(item["mask"]).astype(bool)
        machine = qfvs.top_percent_shots(logits, mask, top_percent)
        gt = np.nonzero(item["oracle_GT"].reshape(-1))[0]
        _, _, f1 = semantic_matching_f1(machine, gt, shots_tag)
        f1s.append(f1)
    return {"F1": float(np.mean(f1s)) * 100}
