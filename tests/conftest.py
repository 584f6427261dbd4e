"""Test configuration: force CPU with 8 virtual devices.

The axon sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (real TPU via a tunnel), so env vars set here are too
late — we must flip the already-imported jax config before any backend
is initialised.  Multi-device sharding tests then run on a virtual CPU
mesh; unit tests stay hardware-independent and deterministic.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", (
    "tests must run on local CPU, got: %s" % jax.devices())
