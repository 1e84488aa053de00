"""Test config: force local CPU with a simulated 8-device mesh.

The session interpreter pre-imports jax via a sitecustomize that pins
JAX_PLATFORMS to the TPU tunnel ('axon'); on that path every eager op is a
network round trip and matmuls run at TPU default (bf16) precision. Tests must
run on local CPU, so override via jax.config (env vars are captured at jax
import time and would be ignored).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert jax.device_count() == 8, jax.devices()
