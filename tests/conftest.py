"""Test config: run on a virtual 8-device CPU mesh (no TPU needed in CI).

The container's sitecustomize registers the axon TPU plugin at interpreter
startup and pins JAX_PLATFORMS=axon, so env vars alone can't steer tests to
CPU — we override via jax.config after import (backends initialize lazily,
so this is safe as long as no jax computation ran first).

Exception: ORION_SDR_TPU_PERF_TPU=1 leaves the default (TPU) backend in
place so the opt-in tier-3 kernel throughput floors measure the real chip
(the SNR sweeps in that tier are backend-agnostic and run either way).
"""

import os

import jax

if not os.environ.get("ORION_SDR_TPU_PERF_TPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
