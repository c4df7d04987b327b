"""Multi-process SPMD worker: one REAL process of an emulated TPU pod slice.

TPU-native counterpart of the reference's per-rank NCCL worker
(`multinode_train_egoclip.py:63-99`: rank from SLURM env, TCP rendezvous,
DistributedSampler feed). Here each OS process owns `devices_per_process`
virtual CPU devices, joins the cluster with `jax.distributed.initialize`,
feeds only its `global_batch // process_count` slice through
`shard_batch` (which assembles the global array with
`jax.make_array_from_process_local_data`), and runs the full GSPMD train
step — the exact code path a real multi-host pod runs, with Gloo standing
in for ICI.

Run as a module (each process):

    python -m egovlpv2_tpu.parallel.mp_worker \
        --pid 0 --nproc 2 --port 12345 --devices_per_process 4 \
        --steps 2 --out /tmp/loss0.json

`tests/test_multiprocess.py` and `__graft_entry__.dryrun_multiprocess`
launch these workers and assert the multi-process loss matches the
single-process (nproc=1) run on the same global batch.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def free_port() -> int:
    import socket

    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def launch_workers(nproc: int, devices_per_process: int = 4, steps: int = 2,
                   global_batch: int = 8, ckpt_dir=None, timeout: int = 1500,
                   out_dir=None):
    """Launch `nproc` real OS worker processes and return their result dicts.

    Each child re-enters this module with a fresh JAX (virtual CPU devices +
    jax.distributed over a localhost coordinator). Raises RuntimeError with
    the combined output if any child fails.
    """
    import subprocess
    import tempfile

    out_dir = out_dir or tempfile.mkdtemp(prefix="mp_worker_")
    port = free_port()
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # children set their own device count
    procs, outs = [], []
    for pid in range(nproc):
        out = os.path.join(out_dir, f"result_{pid}.json")
        outs.append(out)
        cmd = [sys.executable, "-m", "egovlpv2_tpu.parallel.mp_worker",
               "--pid", str(pid), "--nproc", str(nproc),
               "--port", str(port),
               "--devices_per_process", str(devices_per_process),
               "--steps", str(steps), "--global_batch", str(global_batch),
               "--out", out]
        if ckpt_dir:
            cmd += ["--ckpt_dir", ckpt_dir]
        procs.append(subprocess.Popen(
            cmd, env=env, cwd=repo_root, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    logs = [None] * nproc
    try:
        for i, p in enumerate(procs):
            out, _ = p.communicate(timeout=timeout)
            logs[i] = out
    except subprocess.TimeoutExpired:
        # one hung child (e.g. a rendezvous stall) must not leak its
        # siblings — they would block on the coordinator forever
        for p in procs:
            if p.poll() is None:
                p.kill()
        for i, p in enumerate(procs):
            if logs[i] is None:
                out, _ = p.communicate()
                logs[i] = out
        raise RuntimeError(
            f"mp_worker child hung past {timeout}s:\n"
            + "\n---\n".join(l or "" for l in logs))
    if any(p.returncode != 0 for p in procs):
        raise RuntimeError(
            "mp_worker child failed:\n" + "\n---\n".join(logs))
    results = []
    for out in outs:
        with open(out) as f:
            results.append(json.load(f))
    return results


def main(argv=None) -> None:
    ap = argparse.ArgumentParser("mp_worker")
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--devices_per_process", type=int, default=4)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--global_batch", type=int, default=8)
    ap.add_argument("--ckpt_dir", default=None,
                    help="exercise a collective orbax save/restore here")
    ap.add_argument("--out", default=None, help="write result JSON here")
    args = ap.parse_args(argv)

    # XLA device count is fixed at backend init: force it before importing jax
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count="
            f"{args.devices_per_process}").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    # deterministic f32 matmuls so nproc=1 and nproc=2 losses are comparable
    jax.config.update("jax_default_matmul_precision", "highest")
    from egovlpv2_tpu.utils.compile_cache import ensure_cache
    jax.config.update("jax_compilation_cache_dir",
                      ensure_cache("/tmp/egovlpv2_tpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    if args.nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.nproc,
            process_id=args.pid,
        )
        # NOTE: jax_share_binary_between_hosts is deliberately OFF. Its KV
        # exchange is keyed by the persistent-cache key, and on this stack
        # that key is PER-PROCESS (measured: the identical global psum
        # program hashes differently under process_id 0 vs 1), so the
        # non-zero process blocks on a key the zero process never sets —
        # a deadlock, not a speedup. Each process compiles independently;
        # the precompile barrier below synchronizes them afterwards.

    import time

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from egovlpv2_tpu.parallel.distributed import barrier
    from egovlpv2_tpu.parallel.mesh import (
        local_batch_size, make_mesh, shard_batch, shard_params,
    )
    from egovlpv2_tpu.tasks.pretrain import (
        build_pretrain, synthetic_batch, tiny_train_config,
    )

    t0 = time.time()

    def trace(msg):  # timestamped child progress for skew diagnosis
        print(f"[pid {args.pid} +{time.time() - t0:7.1f}s] {msg}",
              flush=True)

    n = len(jax.devices())
    assert n == args.nproc * args.devices_per_process, (
        f"expected {args.nproc * args.devices_per_process} global devices, "
        f"got {n}")
    model_axis = 2 if n % 2 == 0 and n >= 4 else 1
    mesh = make_mesh((-1, model_axis), ("data", "model"))

    cfg = tiny_train_config()
    local_bs = local_batch_size(args.global_batch)
    losses = []
    with mesh:
        # init from the (identical-everywhere) global batch so params match
        # bit-for-bit across processes, then place via the TP rules
        full0 = synthetic_batch(cfg, args.global_batch,
                                np.random.default_rng(1000))
        model, init_state = build_pretrain(cfg, mesh=mesh)
        trace("init_state (local model/optimizer init)")
        state, step_fn = init_state(full0)
        state = state._replace(params=shard_params(state.params, mesh))
        rep_fn = jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))

        if args.nproc > 1:
            # XLA:CPU's Gloo rendezvous happens on the FIRST collective
            # execution and tolerates only ~30 s of inter-process skew
            # (hardcoded GetKeyValue timeout). On a 1-core host two
            # children timesharing trace/compile can skew far past that.
            # So: AOT-compile every collective program first (compile does
            # not execute, and with jax_share_binary_between_hosts the
            # non-first process just waits on the KV store — our timeout),
            # then meet at a coordination-service barrier (gRPC, our
            # timeout), and only then dispatch. Post-barrier skew is
            # microseconds of Python, far inside the Gloo window.
            local0 = {k: v[args.pid * local_bs:(args.pid + 1) * local_bs]
                      for k, v in full0.items()}
            dev0 = shard_batch(local0, mesh)
            trace("AOT-compiling collective programs")
            rep_fn.lower(dev0["video"]).compile()
            step_fn.lower(state, dev0).compile()
            trace("compiled; waiting at precompile barrier")
            barrier("mp_precompile")
            trace("barrier passed; dispatching")

        for i in range(args.steps):
            full = synthetic_batch(cfg, args.global_batch,
                                   np.random.default_rng(1000 + i))
            local = {k: v[args.pid * local_bs:(args.pid + 1) * local_bs]
                     for k, v in full.items()}
            dev_batch = shard_batch(local, mesh)

            if i == 0:
                # prove the assembly: replicating the global array back to
                # every device must reproduce the full host batch row-exact
                rep = rep_fn(dev_batch["video"])
                np.testing.assert_array_equal(np.asarray(rep), full["video"])

            state, metrics = step_fn(state, dev_batch)
            losses.append(float(metrics["loss_total"]))
            trace(f"step {i} done")

        result = {
            "pid": args.pid,
            "nproc": jax.process_count(),
            "devices": n,
            "mesh": dict(mesh.shape),
            "losses": losses,
        }

        if args.ckpt_dir:
            from egovlpv2_tpu.parallel.mesh import host_state
            from egovlpv2_tpu.train.checkpoint import CheckpointManager

            mngr = CheckpointManager(args.ckpt_dir)
            mngr.save(args.steps, host_state(state))
            mngr.wait()
            restored = mngr.restore(host_state(state))
            flat_a = jax.tree_util.tree_leaves(state.params)
            flat_b = jax.tree_util.tree_leaves(restored.params)
            # compare each restored leaf on its addressable shards
            for a, b in zip(flat_a, flat_b):
                la = [s.data for s in a.addressable_shards]
                lb = (
                    [s.data for s in b.addressable_shards]
                    if isinstance(b, jax.Array) and not b.is_fully_addressable
                    else [np.asarray(b)] * len(la)
                )
                if len(la) == len(lb):
                    for xa, xb in zip(la, lb):
                        if np.asarray(xa).shape == np.asarray(xb).shape:
                            np.testing.assert_allclose(
                                np.asarray(xa), np.asarray(xb), rtol=0, atol=0)
            result["ckpt_roundtrip"] = True

    for loss in losses:
        assert np.isfinite(loss), f"non-finite loss {loss}"
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f)
    print(f"mp_worker pid={args.pid}/{args.nproc} ok: losses="
          f"{[round(x, 6) for x in losses]}, mesh={dict(mesh.shape)}")


if __name__ == "__main__":
    main()
