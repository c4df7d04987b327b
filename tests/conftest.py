"""Test config: force a virtual 8-device CPU mesh before JAX initializes.

This is the TPU-native analog of the reference's single-node multi-GPU test
path (SURVEY.md §4): multi-host logic runs on fake devices.

The CI box may have a single CPU core, so XLA compiles are the dominant test
cost: a persistent compilation cache is enabled so repeated runs are fast.
"""
import os

# zero-egress box: make HF hub lookups fail instantly instead of retrying
os.environ.setdefault("HF_HUB_OFFLINE", "1")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# NOTE: the axon TPU plugin in this image ignores the JAX_PLATFORMS env var;
# only the config API reliably pins the platform.
jax.config.update("jax_platforms", "cpu")
# Reduced-precision matmul defaults (~4e-3 abs error) would drown parity
# tests — force full f32 so they measure math, not hardware.
jax.config.update("jax_default_matmul_precision", "highest")
from egovlpv2_tpu.utils.compile_cache import ensure_cache
jax.config.update("jax_compilation_cache_dir",
                  ensure_cache("/tmp/egovlpv2_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
