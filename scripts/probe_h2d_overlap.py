#!/usr/bin/env python
"""Can an H2D transfer overlap device compute on this backend at all?

The feeder-thread prefetch (data/loader.device_prefetch, VERDICT r4 task
4) hides only ~18 ms of the ~108 ms per-step H2D time on the tunneled
TPU (feed_depth0 485.7 ms vs feed_depth2 467.4 ms, r5a). Before sweeping
more depths/workers, measure the primitive: dispatch a long jitted op,
then issue `jax.device_put` of a feed-batch-sized uint8 array from
another thread while the op runs.

  overlapped  wall(put during compute)   ~= max(compute, put)  -> overlap
  serialized  wall(put during compute)   ~= compute + put      -> the RPC
              channel serializes H2D with execution; the feed is
              structurally capped at compute + transfer on this link

Prints one JSON line per case: put_alone_ms, compute_alone_ms,
together_ms, overlap_frac (1 = fully hidden, 0 = fully serialized).
"""
import json
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

# the real feed batch: 16 clips x 4 frames x 224^2 x 3 uint8 (~9.6 MB)
BATCH_BYTES_SHAPE = (16, 4, 224, 224, 3)


def _sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    dev = jax.devices()[0]
    rs = np.random.RandomState(0)
    host_batches = [rs.randint(0, 255, BATCH_BYTES_SHAPE, np.uint8)
                    for _ in range(6)]

    # a compute kernel sized to ~300 ms (the train step's window)
    n = 4096
    a = jnp.asarray(rs.randn(n, n), jnp.bfloat16)

    @jax.jit
    def burn(a):
        def body(_, x):
            return jnp.tanh(x @ x) * jnp.bfloat16(0.999)
        return jax.lax.fori_loop(0, 24, body, a)

    _sync(burn(a))  # compile + warm
    _sync(burn(a))

    def put_one(b):
        return jax.block_until_ready(jax.device_put(b, dev))

    # warm the put path
    put_one(host_batches[0])

    t0 = time.perf_counter()
    for b in host_batches[1:4]:
        put_one(b)
    put_alone = (time.perf_counter() - t0) / 3

    t0 = time.perf_counter()
    _sync(burn(a))
    compute_alone = time.perf_counter() - t0

    # together: dispatch compute, then put from a second thread while the
    # device is busy; wall = time until BOTH complete
    results = {}

    def putter():
        t = time.perf_counter()
        put_one(host_batches[4])
        results["put_done"] = time.perf_counter() - t

    t0 = time.perf_counter()
    fut = burn(a)  # async dispatch
    th = threading.Thread(target=putter)
    th.start()
    _sync(fut)
    th.join()
    together = time.perf_counter() - t0

    ideal = max(compute_alone, put_alone)
    serial = compute_alone + put_alone
    overlap_frac = (serial - together) / max(serial - ideal, 1e-9)
    print(json.dumps({
        "case": "h2d_overlap",
        "put_alone_ms": round(put_alone * 1e3, 1),
        "compute_alone_ms": round(compute_alone * 1e3, 1),
        "together_ms": round(together * 1e3, 1),
        "put_inside_ms": round(results.get("put_done", 0) * 1e3, 1),
        "overlap_frac": round(float(np.clip(overlap_frac, -1, 1)), 3),
    }), flush=True)


if __name__ == "__main__":
    main()
