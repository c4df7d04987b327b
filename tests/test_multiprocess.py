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
def two_proc_results(tmp_path_factory):
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


def test_two_process_matches_single_process(two_proc_results):
    single = launch_workers(nproc=1, devices_per_process=8, steps=2,
                            global_batch=8)[0]
    multi = two_proc_results[0]
    assert single["mesh"] == multi["mesh"] == {"data": 4, "model": 2}
    # same global batch, same init seed: losses agree to numerical noise
    # (collective reduction order may differ across process partitionings)
    np.testing.assert_allclose(single["losses"], multi["losses"],
                               rtol=2e-4, atol=2e-4)


def test_two_process_checkpoint_roundtrip(two_proc_results):
    assert all(r.get("ckpt_roundtrip") for r in two_proc_results)
