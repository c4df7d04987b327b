"""REAL multi-process SPMD: 2 OS processes x 4 virtual CPU devices each.

Closes the round-2 gap "zero multi-process evidence": these tests launch
actual child processes that rendezvous via jax.distributed.initialize,
assemble per-process batch slices into global arrays
(jax.make_array_from_process_local_data inside shard_batch), run the full
GSPMD pretrain step over an 8-device data x model mesh, and save/restore a
collective orbax checkpoint. The multi-process losses must match the
single-process 8-device run on the same global batch (reference capability:
multinode_train_egoclip.py:63-99 + base_data_loader.py:130).
"""

import numpy as np
import pytest

from egovlpv2_tpu.parallel.mp_worker import launch_workers

pytestmark = pytest.mark.slow  # spawns children that compile on 1 CPU core


@pytest.fixture(scope="module")
def single_proc_results():
    # runs FIRST: warms the persistent compile cache on THIS host's
    # signature, so the 2-process children's compiles are mostly cache
    # hits (less timesharing pressure on a 1-core host)
    return launch_workers(nproc=1, devices_per_process=8, steps=2,
                          global_batch=8)


@pytest.fixture(scope="module")
def two_proc_results(tmp_path_factory, single_proc_results):
    ckpt = str(tmp_path_factory.mktemp("mp_ckpt"))
    return launch_workers(nproc=2, devices_per_process=4, steps=2,
                          global_batch=8, ckpt_dir=ckpt)


def test_two_process_step_runs_and_agrees(two_proc_results):
    r0, r1 = sorted(two_proc_results, key=lambda r: r["pid"])
    assert r0["nproc"] == r1["nproc"] == 2
    assert r0["devices"] == 8
    assert r0["mesh"] == {"data": 4, "model": 2}
    # both processes observe the identical global loss sequence
    np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=1e-6)
    assert all(np.isfinite(r0["losses"]))


def test_two_process_matches_single_process(two_proc_results,
                                             single_proc_results):
    single = single_proc_results[0]
    multi = two_proc_results[0]
    assert single["mesh"] == multi["mesh"] == {"data": 4, "model": 2}
    # same global batch, same init seed: losses agree to numerical noise
    # (collective reduction order may differ across process partitionings)
    np.testing.assert_allclose(single["losses"], multi["losses"],
                               rtol=2e-4, atol=2e-4)


def test_two_process_checkpoint_roundtrip(two_proc_results):
    assert all(r.get("ckpt_roundtrip") for r in two_proc_results)


_CLI_CHILD = """
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/egovlpv2_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
from egovlpv2_tpu.cli import main
main(sys.argv[1:])
"""


def _run_cli_multihost(tmp_path, subcmd_argv, nproc=2, loss_key="loss_total"):
    """Launch the production CLI under `nproc` real processes (4 virtual CPU
    devices apiece) rendezvousing on a localhost coordinator; returns the
    per-process logged loss sequences and the raw logs."""
    import ast
    import json
    import os
    import subprocess
    import sys

    from egovlpv2_tpu.parallel.mp_worker import free_port
    from tests.test_cli import TINY

    cfg_path = tmp_path / "tiny.json"
    cfg_path.write_text(json.dumps(TINY))
    port = free_port()

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)

    def spawn(pid):
        argv = subcmd_argv + [
            "--config", str(cfg_path),
            "--coordinator", f"localhost:{port}",
            "--num_processes", str(nproc), "--process_id", str(pid)]
        return subprocess.Popen([sys.executable, "-c", _CLI_CHILD] + argv,
                                env=env, cwd=repo_root,
                                stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, text=True)

    procs = [spawn(i) for i in range(nproc)]
    logs = [None] * nproc
    try:
        for i, p in enumerate(procs):
            out, _ = p.communicate(timeout=900)
            logs[i] = out
    except subprocess.TimeoutExpired:
        for p in procs:
            if p.poll() is None:
                p.kill()
        raise
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(
        l or "" for l in logs)

    def losses(text):
        out = []
        for line in text.splitlines():
            if ": step " in line or line.startswith("step "):
                _, _, tail = line.partition("step ")
                num, _, d = tail.partition(": ")
                if d.startswith("{"):
                    out.append(ast.literal_eval(d)[loss_key])
        return out

    return [losses(l) for l in logs], logs


def test_cli_multihost_pretrain(tmp_path):
    """The production CLI under 2 real processes: `egovlpv2-tpu pretrain
    --coordinator ... --num_processes 2 --process_id i` on each "host"
    (4 virtual CPU devices apiece), shared save_dir. Verifies the
    --multihost plumbing end to end: rendezvous before backend init, the
    per-process batch slicing inside cmd_pretrain's synthetic feed, the
    collective orbax checkpoint, and rank-0-only stats/log files."""
    save = tmp_path / "run"
    (l0, l1), logs = _run_cli_multihost(tmp_path, [
        "pretrain", "--synthetic", "--steps_per_epoch", "2", "--epochs", "1",
        "--save_dir", str(save), "--ckpt_every", "2"])
    assert len(l0) == 2 and l0 == l1, (l0, l1)
    assert "# multihost: process 0/2" in logs[0] + logs[1]
    assert "# multihost: process 1/2" in logs[0] + logs[1]
    # rank-0-only file outputs, collective checkpoint present
    assert (save / "stats.txt").exists() and (save / "info.log").exists()
    assert (save / "ckpt").exists()


def test_cli_multihost_dual_finetune(tmp_path):
    """ft-charades under 2 real processes: the dual fine-tune path slices
    its synthetic feed per process and saves a collective checkpoint
    (reference: multinode_train_charades.py DDP flow)."""
    save = tmp_path / "ft"
    (l0, l1), logs = _run_cli_multihost(tmp_path, [
        "ft-charades", "--synthetic", "--steps_per_epoch", "2",
        "--epochs", "1", "--save_dir", str(save)])
    assert len(l0) == 2 and l0 == l1, (l0, l1)
    assert (save / "stats.txt").exists()
    assert (save / "ckpt").exists() and (save / "config.json").exists()
