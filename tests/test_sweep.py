"""EgoMQ hyperparameter sweep harness (reference
EgoMQ/scripts/train_infer_eval_ego_nce.sh:38-56 + find_best_parameters.py)."""

import json

import numpy as np

from egovlpv2_tpu.downstream.sweep import (
    REFERENCE_EGOMQ_GRID,
    grid_configs,
    grid_sweep,
    run_egomq_sweep,
)


def test_reference_grid_size_and_order():
    cfgs = list(grid_configs(REFERENCE_EGOMQ_GRID))
    assert len(cfgs) == 3 * 4 * 3 * 4  # 144 configs, the published protocol
    # nested-loop order: batch outermost, gamma innermost (the shell script)
    assert cfgs[0] == {"batch_size": 32, "lr": 1e-4, "step_size": 15,
                       "gamma": 0.05}
    assert cfgs[1]["gamma"] == 0.1 and cfgs[1]["batch_size"] == 32


def test_grid_sweep_finds_argmax(tmp_path):
    grid = {"lr": (0.1, 0.2, 0.3), "gamma": (0.5, 0.9)}

    def run(lr, gamma):
        # deterministic synthetic objective peaked at (0.2, 0.9)
        return {"mAP_avg": 1.0 - (lr - 0.2) ** 2 - (gamma - 0.9) ** 2,
                "mAP@0.5": lr * gamma}

    out = tmp_path / "sweep.json"
    best_cfg, best_metrics, results = grid_sweep(
        run, grid, metric_key="mAP_avg", out_path=str(out))
    assert best_cfg == {"lr": 0.2, "gamma": 0.9}
    assert len(results) == 6
    payload = json.loads(out.read_text())
    assert payload["best"]["config"] == {"lr": 0.2, "gamma": 0.9}
    assert len(payload["results"]) == 6  # flushed after every run


def test_run_egomq_sweep_wires_configs(tmp_path):
    seen = []

    def fake_run(clip_anno, feature_path, out_dir, batch_size, lr, epochs):
        seen.append((batch_size, lr, out_dir))
        return {"mAP_avg": float(batch_size) / (1.0 + lr)}

    best = run_egomq_sweep(
        "anno.json", "feats/", str(tmp_path),
        grid={"batch_size": (4, 8), "lr": (0.1,)},
        run_fn=fake_run, epochs=1,
    )
    assert best["config"] == {"batch_size": 8, "lr": 0.1}
    assert len(seen) == 2
    assert all("batch_size=" in s[2] for s in seen)  # per-config out dirs
    assert (tmp_path / "sweep_results.json").exists()


def test_sweep_over_real_run_egomq(tmp_path):
    """The sweep drives the ACTUAL run_egomq (tiny features on disk), so the
    metric key contract between the two is enforced end to end."""
    import json

    rs = np.random.RandomState(0)
    anno = {}
    for split, names in (("train", ["a", "b"]), ("val", ["c"])):
        for name in names:
            np.save(tmp_path / f"{name}.npy", rs.randn(40, 8).astype(np.float32))
            anno[name] = {
                "subset": split, "clip_id": name,
                "parent_start_sec": 0.0, "parent_end_sec": 20.0,
                "annotations": [
                    {"start_time": 2.0, "end_time": 6.0, "label": "cook"},
                ],
            }
    anno_path = tmp_path / "anno.json"
    anno_path.write_text(json.dumps(anno))
    best = run_egomq_sweep(
        str(anno_path), str(tmp_path), str(tmp_path / "sweep"),
        grid={"batch_size": (2,), "lr": (1e-4,), "step_size": (5,),
              "gamma": (0.5,)},
        epochs=1, temporal_scale=64, input_feat_dim=8, num_levels=3,
        tiou_thresholds=(0.1, 0.5),
    )
    assert "mAP_avg" in best["metrics"]
