"""Host-validated persistent JAX compilation cache.

XLA:CPU persists AOT-compiled executables keyed by program, NOT by host
microarchitecture. When a cache directory migrates to a different machine
(this project runs across rotating hosts), XLA loads the stale AOT blobs
anyway and warns "Machine type used for XLA:CPU compilation doesn't match
the machine type for execution ... could lead to execution errors such as
SIGILL". Measured consequence (round 3): one of two SPMD processes stalls
inside such a program and every cross-process Gloo collective times out
(30 s GetKeyValue), failing the multi-process test suite.

`ensure_cache(dir)` stamps the directory with a host signature (cpu model +
flags) and wipes it when the signature changes, so every machine compiles
its own code. Call it before `jax.config.update("jax_compilation_cache_dir",
...)` everywhere a persistent cache is configured.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil


def _host_signature() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            text = f.read()
        model = flags = ""
        for line in text.splitlines():
            if line.startswith("model name") and not model:
                model = line
            elif line.startswith("flags") and not flags:
                flags = line
        return hashlib.sha256((model + flags).encode()).hexdigest()[:16]
    except OSError:  # non-Linux fallback
        import platform

        return hashlib.sha256(platform.processor().encode()).hexdigest()[:16]


def ensure_cache(directory: str) -> str:
    """Create `directory` if needed; wipe it if it was populated on a
    different host. Returns the directory (for chaining into
    jax.config.update). Safe to call from multiple processes: the stamp
    write is atomic via rename."""
    stamp_path = os.path.join(directory, "host_signature.json")
    sig = _host_signature()
    try:
        with open(stamp_path) as f:
            if json.load(f).get("signature") == sig:
                return directory
        # different host: the AOT entries are poison here
        shutil.rmtree(directory, ignore_errors=True)
    except (OSError, ValueError):
        # no/corrupt stamp: entries of unknown provenance are also unsafe
        if os.path.isdir(directory) and os.listdir(directory):
            shutil.rmtree(directory, ignore_errors=True)
    os.makedirs(directory, exist_ok=True)
    tmp = stamp_path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"signature": sig}, f)
    os.replace(tmp, stamp_path)
    return directory
