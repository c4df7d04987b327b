"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL process-per-GPU runtime
(`multinode_train_egoclip.py:63-99`, `trainer_egoclip.py:25-41`): we write
global-batch math, shard the batch over the 'data' mesh axis, optionally
shard the big projection / vocab matmuls over 'model', and let the GSPMD
partitioner insert the ICI collectives (the differentiable all_gather the
reference hand-implements falls out of autodiff + sharding automatically).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from flax import traverse_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Tuple[int, ...] = (-1, 1),
    axes: Tuple[str, ...] = ("data", "model"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        shape[shape.index(-1)] = n // known
    need = int(np.prod(shape))
    if need > n:
        raise ValueError(f"mesh shape {shape} needs {need} devices, have {n}")
    dev_array = np.asarray(devices[:need]).reshape(shape)
    return Mesh(dev_array, axes)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data sharding for every array in the batch pytree."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch, mesh: Mesh):
    """Place a host batch pytree onto the mesh's data axis.

    Single-process: a plain `jax.device_put` of the global host batch.
    Multi-process (a real pod): each process passes only its OWN slice —
    `global_batch_size // process_count` rows, as produced by
    `HostShardSampler` — and the global array is assembled with
    `jax.make_array_from_process_local_data`. This is the TPU-native
    equivalent of the reference's per-rank DistributedSampler feed
    (multinode_train_egoclip.py:63-99, base/base_data_loader.py:130).
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.ascontiguousarray(x)),
            batch,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def local_batch_size(global_batch_size: int) -> int:
    """Rows THIS process must feed `shard_batch` (global // process_count)."""
    nproc = jax.process_count()
    if global_batch_size % nproc:
        raise ValueError(
            f"global_batch_size {global_batch_size} not divisible by "
            f"process_count {nproc}")
    return global_batch_size // nproc


def host_state(state):
    """Materialize a TrainState for checkpointing.

    Single-process: fetch to host numpy (`jax.device_get`). Multi-process:
    return the global jax.Arrays unchanged — orbax saves them collectively
    (every process writes its addressable shards), and `jax.device_get` on a
    non-fully-addressable array would raise.
    """
    if jax.process_count() > 1:
        return state
    return jax.device_get(state)


# Megatron-style tensor-parallel rules for the big matmuls, applied by regex
# over '.'-joined param paths. Everything unmatched is replicated. GSPMD keeps
# the math exact regardless; these rules only steer collective placement.
MODEL_PARTITION_RULES: Tuple[Tuple[str, P], ...] = (
    # 3-layer contrastive projections (768->4096->4096->4096)
    (r".*(txt|vid)_proj\.fc0\.kernel", P(None, "model")),
    (r".*(txt|vid)_proj\.fc1\.kernel", P("model", None)),
    (r".*(txt|vid)_proj\.fc2\.kernel", P(None, "model")),
    # MLM vocab decoder (768 x 50265) — the single biggest matrix
    (r".*mlm_score\.decoder\.kernel", P(None, "model")),
    # transformer MLPs
    (r".*\.mlp\.fc1\.kernel", P(None, "model")),
    (r".*\.mlp\.fc2\.kernel", P("model", None)),
    (r".*\.intermediate\.kernel", P(None, "model")),
    (r".*layer_\d+\.output\.kernel", P("model", None)),
    # attention projections
    (r".*\.qkv\.kernel", P(None, "model")),
    (r".*\.attn\.proj\.kernel", P("model", None)),
    (r".*attention\.(query|key|value)\.kernel", P(None, "model")),
    (r".*attention\.out_dense\.kernel", P("model", None)),
)


def param_sharding(params, mesh: Mesh):
    """NamedSharding tree for the param pytree via MODEL_PARTITION_RULES."""
    flat = traverse_util.flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        name = ".".join(path)
        spec = P()
        if mesh.shape.get("model", 1) > 1:
            for pat, candidate in MODEL_PARTITION_RULES:
                if re.fullmatch(pat, name):
                    # only shard if the dimension divides evenly
                    ok = all(
                        ax is None
                        or leaf.shape[i] % mesh.shape[ax] == 0
                        for i, ax in enumerate(candidate)
                    )
                    if ok:
                        spec = candidate
                    break
        out[path] = NamedSharding(mesh, spec)
    return traverse_util.unflatten_dict(out)


def _put_global(x, sh: NamedSharding):
    """Collective-free placement of a host value onto a (possibly
    cross-process) sharding.

    Multi-process `jax.device_put(host_array, sharding)` silently runs
    `multihost_utils.assert_equal` — a process_allgather, i.e. a Gloo/ICI
    collective — PER CALL (jax dispatch.py `_device_put_sharding_impl`).
    Sharding a param tree that way fires hundreds of tiny collectives
    before training starts; on XLA:CPU each is a fresh 30 s Gloo
    rendezvous exposure. Placing each addressable shard directly skips
    the check (params are bit-identical across processes by construction:
    same seed, same init program)."""
    x = np.asarray(x)
    arrs = [jax.device_put(x[idx], d)
            for d, idx in sh.addressable_devices_indices_map(x.shape).items()]
    return jax.make_array_from_single_device_arrays(x.shape, sh, arrs)


def shard_params(params, mesh: Mesh):
    sh = param_sharding(params, mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(_put_global, params, sh)
    return jax.tree_util.tree_map(jax.device_put, params, sh)


def replicate(tree, mesh: Mesh):
    """Place every leaf replicated across the mesh (e.g. a restored
    checkpointed TrainState whose arrays landed on a single device)."""
    sh = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(lambda x: _put_global(x, sh), tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
